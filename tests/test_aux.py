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


def test_fsq_roundtrip():
    from landiff_tpu.models.vq import fsq_indices_to_codes, fsq_quantize

    levels = (8, 5, 5, 5)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 7, len(levels))) * 2
    q, idx = fsq_quantize(z, levels)
    assert idx.min() >= 0 and int(idx.max()) < np.prod(levels)
    codes = fsq_indices_to_codes(idx, levels)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(q),
                               rtol=1e-6, atol=1e-6)


def test_control_mlp_adapter():
    from landiff_tpu.config import tiny_test_config
    from landiff_tpu.models import dit as dit_lib

    cfg = tiny_test_config().dit
    params = dit_lib.init_mlp_adapter(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.latent_frames, cfg.in_channels,
                   cfg.latent_height, cfg.latent_width))
    ctx = jnp.zeros((1, cfg.text_length, cfg.text_dim))
    outs = dit_lib.control_mlp_adapter_forward(params, x, ctx, cfg,
                                               compute_dtype=jnp.float32)
    assert len(outs) == cfg.control_layers
    # zero-init taps -> all outputs zero
    np.testing.assert_allclose(np.asarray(outs[0]), 0.0, atol=0)


def test_training_checkpoint_roundtrip(tmp_path):
    import optax

    from landiff_tpu.training.checkpoint import restore_checkpoint, \
        save_checkpoint

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    save_checkpoint(tmp_path / "ck", 3, params, opt_state)
    step, restored = restore_checkpoint(
        tmp_path / "ck", template={"params": params,
                                   "opt_state": opt_state})
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(params["w"]))


def test_vpode_sampler_recovers_target():
    from landiff_tpu.config import SamplerConfig
    from landiff_tpu.diffusion import samplers

    target = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 3, 4, 4))

    def denoise_fn(x, step):
        return jnp.broadcast_to(target, x.shape)

    out = samplers.vpode_dpmpp2m_sample(
        denoise_fn, jax.random.normal(jax.random.PRNGKey(1), target.shape),
        SamplerConfig(num_steps=8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                               rtol=1e-5, atol=1e-5)


def test_mjpeg_avi_writer(tmp_path):
    from landiff_tpu.video_io import write_mjpeg_avi

    frames = [np.random.default_rng(i).integers(0, 255, (32, 48, 3),
                                                dtype=np.uint8)
              for i in range(5)]
    path = write_mjpeg_avi(frames, tmp_path / "v.avi", fps=8)
    data = path.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # parse the movi chunks and decode the first JPEG frame
    import io
    import struct

    from PIL import Image

    pos = data.find(b"movi")
    assert pos > 0
    assert data[pos + 4:pos + 8] == b"00dc"
    size = struct.unpack("<I", data[pos + 8:pos + 12])[0]
    jpeg = data[pos + 12:pos + 12 + size]
    img = np.asarray(Image.open(io.BytesIO(jpeg)))
    assert img.shape == (32, 48, 3)
    assert data.count(b"00dc") >= 10  # 5 movi chunks + 5 index entries


def test_zero_opt_state_sharding():
    import optax

    from landiff_tpu.config import MeshConfig
    from landiff_tpu.parallel import mesh as mesh_lib
    from landiff_tpu.training.zero import opt_state_bytes_per_device, \
        zero_shard_opt_state

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs virtual mesh")
    mesh = mesh_lib.make_mesh(MeshConfig(data=4), jax.devices()[:4])
    params = {"w": jnp.ones((1024, 512)), "b": jnp.ones((8,))}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    sharded, shardings = zero_shard_opt_state(state, mesh, min_size=1024)
    leaves = jax.tree_util.tree_leaves(sharded)
    big = [x for x in leaves if x.size >= 1024]
    assert big and all(not s.is_fully_replicated
                       for s in [x.sharding for x in big])
    per_dev, total = opt_state_bytes_per_device(state, mesh)
    assert per_dev < total


def test_sharded_dataset_and_prefetch(tmp_path):
    from landiff_tpu.data.loader import (ShardedNpzDataset,
                                         prefetch_to_device,
                                         write_npz_shards)

    n = 25
    samples = {"x": np.arange(n * 4, dtype=np.float32).reshape(n, 4),
               "y": np.arange(n, dtype=np.int32)}
    write_npz_shards(samples, tmp_path / "ds", shard_size=10)
    # two DP ranks see disjoint data
    seen = []
    for rank in range(2):
        ds = ShardedNpzDataset(tmp_path / "ds", batch_size=4, dp_rank=rank,
                               dp_size=2, seed=1)
        ys = [b["y"] for b in prefetch_to_device(ds.iter_epoch(0))]
        assert all(b.shape[0] == 4 for b in ys)
        seen.append(np.concatenate([np.asarray(b) for b in ys]))
    assert not set(seen[0].tolist()) & set(seen[1].tolist())
    # deterministic given (seed, epoch)
    ds = ShardedNpzDataset(tmp_path / "ds", batch_size=4, seed=3)
    a = [np.asarray(b["y"]) for b in ds.iter_epoch(1)]
    b = [np.asarray(b["y"]) for b in ds.iter_epoch(1)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))


def test_eval_log_video(tmp_path):
    from landiff_tpu.training.eval_log import log_video

    video = np.random.default_rng(0).random((2, 3, 5, 8, 8)).astype(np.float32)
    png = log_video(video, ["a", "b"], tmp_path, step=7,
                    metrics={"loss": jnp.asarray(0.5)})
    assert png.exists()
    assert (tmp_path / "step_00000007.json").exists()
