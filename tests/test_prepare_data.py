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
