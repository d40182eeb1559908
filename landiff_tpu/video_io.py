"""Video file IO without ffmpeg: a pure-python Motion-JPEG AVI muxer.

The reference writes mp4 via imageio-ffmpeg (utils.py:334-343); minimal TPU
images often lack ffmpeg, so this provides a universally-playable fallback
container (RIFF-AVI with JPEG frames via PIL) in ~100 lines, used by
save_video_tensor when the mp4 backend is unavailable."""

from __future__ import annotations

import io
import struct
from pathlib import Path

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int = 92) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    data = buf.getvalue()
    if len(data) % 2:
        data += b"\x00"  # RIFF chunks are word-aligned
    return data


def write_mjpeg_avi(frames, path: str | Path, fps: int = 8,
                    quality: int = 92) -> Path:
    """frames: iterable of (H, W, 3) uint8 arrays -> .avi file."""
    frames = list(frames)
    assert frames, "no frames"
    h, w = frames[0].shape[:2]
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    n = len(jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<14I",
        int(1e6 / fps),          # microseconds per frame
        max(len(j) for j in jpegs) * fps,  # max bytes/sec (approx)
        0,                        # padding granularity
        0x10,                     # flags: AVIF_HASINDEX
        n, 0, 1, 0,               # total frames, initial, streams, sug. buf
        w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1,
                                            fps, 0, n, 0, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    idx = b""
    offset = 4  # relative to start of 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<3I", 0x10, offset, len(j))
        offset += 8 + len(j)
    idx1 = chunk(b"idx1", idx)

    body = b"AVI " + hdrl + movi + idx1
    out = b"RIFF" + struct.pack("<I", len(body)) + body
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(out)
    return path
