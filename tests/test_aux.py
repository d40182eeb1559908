"""Aux subsystems: packed sequences, observability, serving helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.observability import MetricsLogger, StepTimer, \
    set_deterministic
from landiff_tpu.ops import attention as A
from landiff_tpu.ops.packing import PackedSeqlens, packed_causal_mask


def test_packed_seqlens():
    p = PackedSeqlens((3, 2, 4))
    np.testing.assert_array_equal(p.cu_seqlens, [0, 3, 5, 9])
    np.testing.assert_array_equal(p.segment_ids(), [0, 0, 0, 1, 1, 2, 2, 2, 2])
    np.testing.assert_array_equal(p.position_ids(),
                                  [0, 1, 2, 0, 1, 0, 1, 2, 3])


def test_packed_causal_mask_blocks_cross_segment():
    fn = packed_causal_mask((3, 2))
    qi = jnp.arange(5)[:, None]
    ki = jnp.arange(5)[None, :]
    m = np.asarray(fn(qi, ki))
    # within segment 0: causal
    assert m[2, 0] and m[2, 2] and not m[0, 2]
    # cross segment: blocked both ways
    assert not m[3, 2] and not m[2, 3]
    # attention agrees with dense oracle
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 1, 4))
    want = A.mha_reference(q, q, q, mask_fn=fn)
    got = A.flash_attention(q, q, q, mask_fn=fn, block_q=4, block_kv=4,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_metrics_and_timer(tmp_path):
    m = MetricsLogger(tmp_path / "m.jsonl")
    m.log(0, loss=jnp.asarray(1.5), lr=1e-4)
    m.log(1, loss=jnp.asarray(1.2))
    assert abs(m.last()["loss"] - 1.2) < 1e-6
    assert (tmp_path / "m.jsonl").read_text().count("\n") == 2

    t = StepTimer()
    t.start()
    x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    dt = t.stop(sync_on=x)
    assert dt >= 0 and t.avg_s is not None

    key = set_deterministic(7)
    assert key.shape == (2,)


def test_serving_gif_roundtrip():
    from landiff_tpu.serving.app import _video_to_gif_bytes

    video = np.random.default_rng(0).random((1, 3, 4, 8, 8)).astype(np.float32)
    gif = _video_to_gif_bytes(video)
    assert gif[:6] in (b"GIF87a", b"GIF89a")
