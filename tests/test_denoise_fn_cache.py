"""Denoise-program caching contract (diffusion/engine.py, parallel/tp_infer.py).

Long-video runs call the denoise builder once per segment; the sampler's
jitted chunk program (samplers._dpmpp2m_chunk_program) is cached on the
denoise_fn's identity, so the builders MUST return the same function object
for the same (mesh, config, dtype, attn_impl) — otherwise every segment
re-traces the full DiT (seconds of host time per sample_latents call at
production scale). The per-segment bundle-update helpers must reproduce a
fresh builder's bundle exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import MeshConfig, tiny_test_config
from landiff_tpu.diffusion import engine
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.parallel import tp_infer


def _setup(key=0):
    cfg = tiny_test_config()
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 4)
    params = {
        "main": dit_lib.init(ks[0], cfg.dit),
        "control": dit_lib.init(ks[1], cfg.dit, control=True),
        "semantic": sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond),
    }
    ctx = jax.random.normal(ks[3], (1, cfg.dit.text_length,
                                    cfg.dit.text_dim), jnp.float32)
    n_tok = cfg.tokenizer.titok.latent_tokens
    tok_a = jnp.zeros((1, n_tok), jnp.int32)
    tok_b = jnp.ones((1, n_tok), jnp.int32)
    return cfg, params, ctx, tok_a, tok_b


def test_engine_denoise_fn_identity_stable():
    cfg, params, ctx, tok_a, tok_b = _setup()
    uc = jnp.zeros_like(ctx)
    fn1, b1 = engine.make_denoise_fn(
        params["main"], params["control"], params["semantic"], cfg.dit,
        cfg.sampler, cfg.tokenizer, cfg.semantic_cond, ctx, uc, tok_a,
        compute_dtype=jnp.float32, attn_impl="xla")
    fn2, b2 = engine.make_denoise_fn(
        params["main"], params["control"], params["semantic"], cfg.dit,
        cfg.sampler, cfg.tokenizer, cfg.semantic_cond, ctx, uc, tok_b,
        compute_dtype=jnp.float32, attn_impl="xla")
    assert fn1 is fn2
    # update helper == fresh build for the new segment's tokens
    b1b = engine.update_bundle_tokens(b1, params["semantic"], tok_b, cfg.dit,
                                      cfg.tokenizer, cfg.semantic_cond,
                                      compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(b1b["sem_feature"]),
                                  np.asarray(b2["sem_feature"]))
    # params are shared, not copied
    assert b1b["main"] is b1["main"]


def test_tp_denoise_fn_identity_stable_and_update():
    cfg, params, ctx, tok_a, tok_b = _setup()
    uc = jnp.zeros_like(ctx)
    mesh = mesh_lib.make_mesh(MeshConfig(data=2, model=4),
                              jax.devices()[:8])
    fn1, b1 = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
        ctx, uc, tok_a, compute_dtype=jnp.float32, attn_impl="xla")
    fn2, b2 = tp_infer.make_tp_denoise_fn(
        params, mesh, cfg.dit, cfg.sampler, cfg.tokenizer, cfg.semantic_cond,
        ctx, uc, tok_b, compute_dtype=jnp.float32, attn_impl="xla")
    assert fn1 is fn2
    b1b = tp_infer.update_tp_bundle(b1, mesh, params["semantic"], tok_b,
                                    cfg.dit, cfg.tokenizer, cfg.semantic_cond,
                                    compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(b1b["sem2"]),
                                  np.asarray(b2["sem2"]))
    assert b1b["sem2"].sharding == b2["sem2"].sharding
    assert b1b["main"] is b1["main"]
