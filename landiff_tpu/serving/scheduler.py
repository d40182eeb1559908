"""Continuous micro-batching serving engine.

The reference serves one request at a time, swapping each model on/off the
GPU per request (gradio/main.py:31-92). Here both stages stay resident and
the serving layer exploits the stage-1 cost structure measured in PARITY.md:
constrained AR decode at CFG rows=2 is MXU-occupancy bound on the weight
tiles (~2.7x the HBM roofline), so coalescing N concurrent requests into ONE
batched AR while_loop (`ArModelInferWrapper.infer_batch` -> lm.sample_batch,
2N rows) amortizes the per-step tile loads: near-flat step time, ~N x
stage-1 throughput, and per-prompt results bit-exact vs single runs
(tests/test_lm_batch.py).

Pieces:
  - `Stage1Batcher`: bounded linger-window request coalescer. Requests
    enqueue a (CodeTask, Future); a worker drains up to `max_batch` tasks
    after `linger_s`, runs one batched decode, resolves the futures.
  - `ServingEngine`: builds the pipeline once (the reference rebuilds /
    reloads per request), routes stage 1 through the batcher and runs
    stage 2 (diffusion + VAE — compute-bound, nothing to coalesce on one
    chip) FIFO under a device lock. Per-request timings + batch-size
    counters exposed via `stats()`.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future

import numpy as np

from landiff_tpu.pipeline import dif_infer, llm_infer

logger = logging.getLogger("landiff_tpu.serving")


class Stage1Batcher:
    """Coalesce concurrent stage-1 requests into batched AR decodes.

    submit() is thread-safe and returns a Future resolving to the completed
    CodeTask. The worker drains the queue after a `linger_s` window (bounded
    by `max_batch`); a batch of 1 degrades to the single-prompt path inside
    infer_batch, so latency under light load is the linger window only.
    """

    def __init__(self, llm: llm_infer.ArModelInferWrapper,
                 max_batch: int = 8, linger_s: float = 0.05):
        self.llm = llm
        self.max_batch = max_batch
        self.linger_s = linger_s
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self.batch_sizes: list[int] = []
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, task: llm_infer.CodeTask) -> Future:
        if self._closed:
            raise RuntimeError("batcher is shut down")
        fut: Future = Future()
        self._q.put((task, fut))
        return fut

    def shutdown(self, timeout: float = 30.0):
        self._closed = True
        self._q.put(None)
        self._worker.join(timeout=timeout)

    def _loop(self):
        while True:
            head = self._q.get()
            if head is None:
                return
            if self.linger_s > 0:
                time.sleep(self.linger_s)  # let concurrent requests pile up
            batch = [head]
            while len(batch) < self.max_batch:
                try:
                    item = self._q.get_nowait()
                except queue.Empty:
                    break
                if item is None:
                    self._run(batch)
                    return
                batch.append(item)
            self._run(batch)

    def _run(self, batch):
        tasks = [t for t, _ in batch]
        futs = [f for _, f in batch]
        self.batch_sizes.append(len(tasks))
        try:
            done = self.llm.infer_batch(tasks)
        except BaseException as e:  # propagate to every waiter
            for f in futs:
                f.set_exception(e)
            return
        for f, task in zip(futs, done):
            f.set_result(task)


class ServingEngine:
    """Resident two-stage pipeline with stage-1 micro-batching.

    generate() is safe to call from many threads (one per HTTP request):
    stage 1 coalesces in the batcher, stage 2 serializes on the device
    lock. Videos are returned as (B, 3, T, H, W) float32 in [0, 1] — the
    same contract as pipeline/infer_video.run.
    """

    def __init__(self, llm: llm_infer.ArModelInferWrapper,
                 dif: dif_infer.CogModelInferWrapper,
                 max_batch: int = 8, linger_s: float = 0.05):
        self.llm = llm
        self.dif = dif
        self.batcher = Stage1Batcher(llm, max_batch, linger_s)
        self._device_lock = threading.Lock()
        self._n_requests = 0
        self._stats_lock = threading.Lock()

    @classmethod
    def build(cls, tiny: bool = False, ckpt_dir: str | None = None,
              mesh_spec: str | None = None, cfg_scale: float = 7.5,
              motion_score: float = 0.1, num_frames: int = 13,
              max_batch: int = 8, linger_s: float = 0.05,
              seed: int = 0) -> "ServingEngine":
        import jax.numpy as jnp

        from landiff_tpu.config import ARSampleConfig, LanDiffConfig, \
            tiny_test_config
        from landiff_tpu.pipeline.infer_video import build_pipeline

        cfg = tiny_test_config() if tiny else LanDiffConfig()
        if tiny:
            num_frames = cfg.llm.frames_per_segment
        sample_cfg = ARSampleConfig(cfg_scale=cfg_scale,
                                    motion_score=motion_score,
                                    num_frames=num_frames, seed=seed)
        mesh = None
        if mesh_spec:
            from landiff_tpu.parallel import mesh as mesh_lib

            mesh = mesh_lib.make_mesh(mesh_lib.parse_mesh(mesh_spec))
        dtype = jnp.float32 if tiny else jnp.bfloat16
        llm, dif = build_pipeline(cfg, sample_cfg, seed, ckpt_dir,
                                  compute_dtype=dtype, mesh=mesh)
        return cls(llm, dif, max_batch=max_batch, linger_s=linger_s)

    def generate(self, prompt: str, seed: int = 42, fps: int = 8) -> dict:
        t0 = time.time()
        fut = self.batcher.submit(
            llm_infer.CodeTask(save_file_name="serving.npy", prompt=prompt))
        code_task = fut.result()
        t1 = time.time()
        with self._device_lock:
            video_task = self.dif(dif_infer.VideoTask(
                save_file_name="serving.mp4", prompt=prompt, seed=seed,
                fps=fps, semantic_token=code_task.result))
        t2 = time.time()
        with self._stats_lock:
            self._n_requests += 1
        return {"codes": code_task.result,
                "video": np.asarray(video_task.result),
                "stage1_s": t1 - t0, "stage2_s": t2 - t1}

    def stats(self) -> dict:
        sizes = list(self.batcher.batch_sizes)
        return {"requests": self._n_requests,
                "stage1_batches": len(sizes),
                "stage1_batch_sizes": sizes,
                "mean_batch": float(np.mean(sizes)) if sizes else 0.0}

    def shutdown(self):
        self.batcher.shutdown()
