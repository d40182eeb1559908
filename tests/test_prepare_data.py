"""Data preparation pipeline (data/prepare.py): clips -> Theia features /
semantic codes -> shards consumable by the training driver."""

import json

import numpy as np

from landiff_tpu.config import tiny_test_config
from landiff_tpu.data import prepare
from landiff_tpu.data.loader import ShardedNpzDataset


def _write_clips(root, cfg):
    root.mkdir(parents=True)
    t = cfg.tokenizer
    rng = np.random.default_rng(0)
    # npy clip: 2 segments worth of frames
    T = 2 * t.segment_length
    size = t.theia.image_size
    np.save(root / "clip_a.npy",
            rng.integers(0, 256, (T, size, size, 3), dtype=np.uint8))
    # frame-directory clip: exactly 1 segment
    from PIL import Image

    d = root / "clip_b"
    d.mkdir()
    for i in range(t.segment_length):
        Image.fromarray(rng.integers(0, 256, (size, size, 3),
                                     dtype=np.uint8)).save(
            d / f"f{i:03d}.png")
    (root / "captions.json").write_text(json.dumps(
        {"clip_a": "a cat", "clip_b": "a dog"}))


def test_prepare_vq_and_lm(tmp_path):
    cfg = tiny_test_config()
    clips = tmp_path / "clips"
    _write_clips(clips, cfg)

    shards = prepare.prepare(str(clips), str(tmp_path / "vq"), model="vq",
                             tiny=True, shard_size=2)
    assert shards
    ds = ShardedNpzDataset(tmp_path / "vq", batch_size=2)
    batch = next(ds.iter_epoch(0))
    t = cfg.tokenizer
    assert batch["features"].shape == (2, t.titok.temporal_size,
                                       t.titok.grid_h, t.titok.grid_w,
                                       t.feature_dim)
    assert np.isfinite(batch["features"]).all()

    prepare.prepare(str(clips), str(tmp_path / "lm"), model="lm",
                    tiny=True, shard_size=4)
    ds2 = ShardedNpzDataset(tmp_path / "lm", batch_size=3,
                            drop_remainder=False)
    batch2 = next(ds2.iter_epoch(0))
    # 3 segments total (2 from clip_a + 1 from clip_b)
    assert batch2["codes"].shape == (3, t.titok.latent_tokens)
    assert batch2["codes"].dtype == np.int32
    assert set(batch2["caption"]) <= {"a cat", "a dog"}


def test_prepare_dit_feeds_trainer(tmp_path):
    """dit prep: 49-frame-window geometry (tiny: 5) -> latents aligned
    with dit.latent_frames + T5 context + tokens — exactly the dit
    trainer's dataset contract (one training step runs on the output)."""
    import json as _json

    cfg = tiny_test_config()
    d = cfg.dit
    stride_t = 2 ** cfg.vae.temporal_compress_level
    window = 1 + (d.latent_frames - 1) * stride_t
    clips = tmp_path / "clips"
    clips.mkdir()
    rng = np.random.default_rng(1)
    h, w = d.latent_height * 2, d.latent_width * 2   # tiny VAE is /2
    np.save(clips / "c.npy",
            rng.integers(0, 256, (window, h, w, 3), dtype=np.uint8))
    (clips / "captions.json").write_text(_json.dumps({"c": "a bird"}))

    prepare.prepare(str(clips), str(tmp_path / "dit"), model="dit",
                    tiny=True, shard_size=4)
    ds = ShardedNpzDataset(tmp_path / "dit", batch_size=1,
                           drop_remainder=False)
    batch = next(ds.iter_epoch(0))
    assert batch["latents"].shape == (1, d.latent_frames, d.in_channels,
                                      d.latent_height, d.latent_width)
    assert batch["context"].shape == (1, d.text_length, d.text_dim)
    assert batch["tokens"].shape == (1, cfg.tokenizer.titok.latent_tokens)

    # the trainer consumes it directly
    from landiff_tpu.training import train as train_lib

    _, last = train_lib.train("dit", str(tmp_path / "dit"), steps=1,
                              batch_size=1, mesh_spec="data=1,model=1",
                              log_every=1, tiny=True)
    assert np.isfinite(float(np.asarray(last["loss"])))


def test_prepare_with_ckpt_dir_uses_loaded_weights(tmp_path, monkeypatch):
    """--ckpt-dir routes through ckpt/load (real/converted weights) instead
    of random init; the loaders themselves are exercised at production
    shapes in test_prod_ckpt_rehearsal.py — here we pin the wiring."""
    import jax

    from landiff_tpu.ckpt import load as ckpt_load
    from landiff_tpu.models import vq as vq_lib

    cfg = tiny_test_config()
    clips = tmp_path / "clips"
    _write_clips(clips, cfg)

    calls = {}

    def fake_load_tokenizer(ckpt_dir, full_cfg, dtype=None):
        calls["tokenizer"] = str(ckpt_dir)
        return vq_lib.init(jax.random.PRNGKey(7), full_cfg.tokenizer,
                           dtype=dtype)

    monkeypatch.setattr(ckpt_load, "load_tokenizer", fake_load_tokenizer)
    shards = prepare.prepare(str(clips), str(tmp_path / "vq_ck"),
                             model="vq", tiny=True, shard_size=2,
                             ckpt_dir=str(tmp_path / "fake_ckpts"))
    assert calls["tokenizer"].endswith("fake_ckpts")
    assert shards
    batch = next(ShardedNpzDataset(tmp_path / "vq_ck",
                                   batch_size=2).iter_epoch(0))
    assert np.isfinite(batch["features"]).all()
