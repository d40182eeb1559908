"""Native JPEG codec (landiff_tpu/native) vs the PIL oracle, and the
MJPEG-AVI read path built on it.

The native library is the TPU-side stand-in for the reference's native IO
surface (imageio-ffmpeg writer utils.py:334-343, torch C++ DataLoader
ingestion). Decode must be BIT-exact vs PIL (both are libjpeg); encode is
validated by round-trip closeness and by PIL being able to decode the
native bytes."""

import io

import numpy as np
import pytest

from landiff_tpu import video_io
from landiff_tpu.native import build, jpeg as njpeg

pytestmark = pytest.mark.skipif(
    not build.available(), reason="native toolchain/libjpeg unavailable")


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    ramp = np.linspace(0, 255, w)[None, :, None]
    base = (np.tile(ramp, (h, 1, 3))
            + rng.normal(0, 6, (h, w, 3))).clip(0, 255).astype(np.uint8)
    return np.stack([np.roll(base, 3 * i, axis=1) for i in range(n)])


def _pil_decode(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def test_decode_bit_exact_vs_pil():
    frames = _frames()
    for enc in njpeg.encode_frames(frames, quality=90):
        np.testing.assert_array_equal(njpeg.decode_jpeg(enc),
                                      _pil_decode(enc))


def test_encode_pil_readable_and_close():
    f = _frames(1)[0]
    enc = njpeg.encode_jpeg(f, quality=95)
    dec = _pil_decode(enc).astype(int)
    assert dec.shape == f.shape
    # lossy but close at q95 on smooth content
    assert np.abs(dec - f.astype(int)).mean() < 6.0


def test_batch_matches_single():
    frames = _frames(5)
    batch = njpeg.encode_frames(frames, quality=92)
    single = [njpeg.encode_jpeg(f, quality=92) for f in frames]
    assert batch == single  # deterministic libjpeg output
    np.testing.assert_array_equal(njpeg.decode_frames(batch), np.stack(
        [njpeg.decode_jpeg(b) for b in batch]))


def test_corrupt_input_raises_not_crashes():
    with pytest.raises(ValueError):
        njpeg.decode_jpeg(b"\xff\xd8not a real jpeg")
    with pytest.raises(ValueError):
        njpeg.decode_jpeg(b"")


def test_avi_write_read_round_trip(tmp_path):
    frames = _frames(8)
    path = video_io.write_mjpeg_avi(list(frames), tmp_path / "clip.avi",
                                    fps=8, quality=92)
    decoded, fps = video_io.read_mjpeg_avi(path)
    assert fps == 8
    assert decoded.shape == frames.shape and decoded.dtype == np.uint8
    # decode of our own encode: lossy-close to the source
    err = np.abs(decoded.astype(int) - frames.astype(int)).mean()
    assert err < 8.0
    # and identical to decoding the same JPEG payloads directly
    np.testing.assert_array_equal(
        decoded, njpeg.decode_frames(njpeg.encode_frames(frames, 92)))


def test_avi_reader_python_fallback_parity(tmp_path, monkeypatch):
    frames = _frames(4)
    path = video_io.write_mjpeg_avi(list(frames), tmp_path / "c.avi", fps=4)
    native, _ = video_io.read_mjpeg_avi(path)
    monkeypatch.setattr(build, "_LIB", None)
    monkeypatch.setattr(build, "_TRIED", True)  # force the PIL path
    fallback, _ = video_io.read_mjpeg_avi(path)
    np.testing.assert_array_equal(native, fallback)


def test_prepare_loads_avi_clip(tmp_path):
    from landiff_tpu.data import prepare

    frames = _frames(5)
    video_io.write_mjpeg_avi(list(frames), tmp_path / "clip_a.avi", fps=8)
    clips = dict(prepare.iter_clips(tmp_path))
    assert "clip_a" in clips
    assert clips["clip_a"].shape == frames.shape
    assert clips["clip_a"].dtype == np.uint8
