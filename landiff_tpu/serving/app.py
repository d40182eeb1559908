"""Web demo: prompt -> video, mirroring the reference gradio app
(gradio/main.py: both wrappers built once, per-request generation with
cfg-scale/motion/seed sliders :108-144).

Uses gradio when available; otherwise a stdlib http.server fallback with the
same controls so the demo works in minimal images. No GPU<->CPU model
swapping is needed (gradio/main.py:31-92) — both stages stay on-chip, built
once into a resident ServingEngine (serving/scheduler.py) that coalesces
concurrent stage-1 decodes into one batched AR loop.

Run: python -m landiff_tpu.serving.app [--tiny] [--port 7860]
"""

from __future__ import annotations

import argparse
import base64
import io
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

logger = logging.getLogger("landiff_tpu.serving")

_PIPELINE = {}
_LOCK = threading.Lock()


def _engine(cfg_scale: float, motion_score: float):
    """Build the resident ServingEngine once (keyed on the sliders that
    change model programs); concurrent requests coalesce their stage-1
    decodes inside it (serving/scheduler.py)."""
    from landiff_tpu.serving.scheduler import ServingEngine

    key = (cfg_scale, motion_score)
    with _LOCK:
        if _PIPELINE.get("engine_key") != key:
            old = _PIPELINE.pop("engine", None)
            if old is not None:
                old.shutdown()
            _PIPELINE["engine"] = ServingEngine.build(
                tiny=_PIPELINE.get("tiny", False),
                ckpt_dir=_PIPELINE.get("ckpt_dir"),
                mesh_spec=_PIPELINE.get("mesh"),
                cfg_scale=cfg_scale, motion_score=motion_score,
                max_batch=_PIPELINE.get("max_batch", 8),
                linger_s=_PIPELINE.get("linger_s", 0.05))
            _PIPELINE["engine_key"] = key
        return _PIPELINE["engine"]


def _generate(prompt: str, cfg_scale: float, motion_score: float, seed: int):
    return _engine(cfg_scale, motion_score).generate(prompt, seed=seed)


def _video_to_gif_bytes(video: np.ndarray, fps: int = 8) -> bytes:
    import imageio

    from landiff_tpu.utils import cthw_to_uint8

    frames = list(cthw_to_uint8(video[0]))
    buf = io.BytesIO()
    imageio.mimsave(buf, frames, format="GIF", duration=1000.0 / fps)
    return buf.getvalue()


_PAGE = """<!doctype html><title>LanDiff-TPU</title>
<h2>LanDiff-TPU text-to-video</h2>
<form method=post action=/generate>
Prompt: <input name=prompt size=60 value="a cat playing piano"><br>
CFG scale: <input name=cfg_scale value=7.5>
Motion: <input name=motion value=0.1>
Seed: <input name=seed value=42><br>
<button>Generate</button></form>
"""


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/stats":
            import json

            eng = _PIPELINE.get("engine")
            body = json.dumps(eng.stats() if eng is not None
                              else {"requests": 0}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(_PAGE.encode())

    def do_POST(self):
        from urllib.parse import parse_qs

        length = int(self.headers.get("Content-Length", 0))
        q = parse_qs(self.rfile.read(length).decode())
        res = _generate(q["prompt"][0], float(q["cfg_scale"][0]),
                        float(q["motion"][0]), int(q["seed"][0]))
        gif = _video_to_gif_bytes(res["video"])
        b64 = base64.b64encode(gif).decode()
        body = (_PAGE + f"<p>stage1 {res['stage1_s']:.1f}s, stage2 "
                f"{res['stage2_s']:.1f}s</p>"
                f'<img src="data:image/gif;base64,{b64}">')
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, fmt, *args):
        logger.info(fmt, *args)


def launch_gradio(port: int):
    import gradio as gr

    def fn(prompt, cfg_scale, motion, seed):
        res = _generate(prompt, cfg_scale, motion, int(seed))
        import tempfile

        from landiff_tpu.utils import save_video_tensor

        path = save_video_tensor(res["video"][0],
                                 tempfile.mktemp(suffix=".mp4"))
        return str(path)

    demo = gr.Interface(
        fn=fn,
        inputs=[gr.Textbox(label="Prompt"),
                gr.Slider(0, 15, value=7.5, label="CFG scale"),
                gr.Slider(0, 1, value=0.1, label="Motion score"),
                gr.Number(value=42, label="Seed")],
        outputs=gr.Video(label="Generated video"),
        title="LanDiff-TPU")
    demo.launch(server_port=port)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--ckpt-dir", default=None)
    parser.add_argument("--mesh", default=None,
                        help="device mesh for multi-chip stage-2, e.g. "
                             "data=2,model=4 or data=2,time=4")
    parser.add_argument("--max-batch", type=int, default=8,
                        help="stage-1 micro-batch cap (batched AR decode)")
    parser.add_argument("--batch-window-ms", type=float, default=50.0,
                        help="linger window for coalescing stage-1 requests")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    _PIPELINE["tiny"] = args.tiny
    _PIPELINE["ckpt_dir"] = args.ckpt_dir
    _PIPELINE["mesh"] = args.mesh
    _PIPELINE["max_batch"] = args.max_batch
    _PIPELINE["linger_s"] = args.batch_window_ms / 1000.0
    try:
        launch_gradio(args.port)
    except ImportError:
        logger.info("gradio unavailable; stdlib server on :%d", args.port)
        ThreadingHTTPServer(("0.0.0.0", args.port), _Handler).serve_forever()


if __name__ == "__main__":
    main()
