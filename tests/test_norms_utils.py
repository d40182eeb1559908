"""Norms + sampling-utils parity vs torch (dev-only dep, CPU)."""

import jax.numpy as jnp
import numpy as np
import torch

from landiff_tpu.ops import norms as N
from landiff_tpu import utils as U


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(N.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
    xt = torch.from_numpy(x)
    want = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5)
            ) * torch.from_numpy(w)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 12)).astype(np.float32)
    w = rng.standard_normal(12).astype(np.float32)
    b = rng.standard_normal(12).astype(np.float32)
    got = np.asarray(N.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5))
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (12,), torch.from_numpy(w), torch.from_numpy(b), 1e-5)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 3, 4, 5)).astype(np.float32)  # B,C,T,H,W
    w = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(N.group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                  num_groups=4, eps=1e-6, channel_axis=1))
    want = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(w), torch.from_numpy(b), 1e-6)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


def test_top_p_matches_reference_semantics():
    """Same filtering rule as landiff/utils.py:345-360: sort desc, drop
    tokens once cumsum (exclusive of self) >= top_p, keep top-1, renorm."""
    probs = np.array([0.4, 0.3, 0.2, 0.1], dtype=np.float32)
    got = np.asarray(U.top_p_filter_probs(jnp.asarray(probs), 0.5))
    # cumsum: .4,.7,.9,1.0 ; shifted: 0,.4,.7,.9 ; remove >= .5 -> last two
    want = np.array([0.4, 0.3, 0.0, 0.0]) / 0.7
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_top_p_keeps_top1():
    probs = np.array([0.9, 0.05, 0.05], dtype=np.float32)
    got = np.asarray(U.top_p_filter_probs(jnp.asarray(probs), 0.1))
    np.testing.assert_allclose(got, [1.0, 0.0, 0.0], atol=1e-6)


def test_top_k_filter():
    logits = jnp.asarray(np.array([1.0, 3.0, 2.0, 0.0], dtype=np.float32))
    got = np.asarray(U.top_k_filter_logits(logits, 2))
    assert np.isneginf(got[[0, 3]]).all()
    np.testing.assert_allclose(got[[1, 2]], [3.0, 2.0])


def test_stable_hash_matches_reference_rule():
    import hashlib
    key = "a cat playing piano"
    want = int(hashlib.sha256(key.encode()).hexdigest()[:20], 16)
    assert U.stable_hash(key) == want
