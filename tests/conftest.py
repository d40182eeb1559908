"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
logic (mesh/pjit/shard_map paths) is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("LANDIFF_SKIP_INIT", "1")

import jax  # noqa: E402

# sitecustomize imports jax with JAX_PLATFORMS=axon before conftest runs, so
# the env var alone is too late — force the platform via the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
