"""End-to-end pipeline smoke on the tiny config: prompt -> codes -> video."""

import numpy as np

from landiff_tpu.pipeline.infer_video import run


def test_tiny_pipeline_end_to_end(tmp_path):
    res = run("a cat playing piano", output_dir=str(tmp_path), seed=7,
              tiny=True)
    codes = res["codes"]
    video = res["video"]
    assert codes.ndim == 1 and len(codes) > 0
    assert video.ndim == 5 and video.shape[1] == 3
    assert video.min() >= 0.0 and video.max() <= 1.0
    assert not np.isnan(video).any()
    # files written (mp4, or gif fallback when ffmpeg is unavailable)
    assert list(tmp_path.glob("*.mp4")) or list(tmp_path.glob("*.gif"))
    assert list(tmp_path.glob("*_codes.npy"))
