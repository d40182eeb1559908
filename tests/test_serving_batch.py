"""Serving micro-batching scheduler (serving/scheduler.py): concurrent
requests coalesce into one batched stage-1 AR decode, results bit-exact vs
the single-prompt path, failures propagate to every waiter."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import ARSampleConfig, tiny_test_config
from landiff_tpu.pipeline import llm_infer
from landiff_tpu.serving.scheduler import ServingEngine, Stage1Batcher


@pytest.fixture(scope="module")
def llm_wrapper():
    cfg = tiny_test_config()
    sc = ARSampleConfig(cfg_scale=7.5, num_frames=cfg.llm.frames_per_segment,
                        seed=11)
    params = llm_infer.init_params(jax.random.PRNGKey(0), cfg.llm, cfg.t5)
    return llm_infer.ArModelInferWrapper(params, cfg.llm, cfg.t5, sc,
                                         compute_dtype=jnp.float32)


def test_batcher_coalesces_and_matches_single(llm_wrapper):
    prompts = ["a cat playing piano", "a dog surfing", "northern lights"]
    singles = [llm_wrapper(llm_infer.CodeTask(save_file_name="s.npy",
                                              prompt=p)).result
               for p in prompts]

    # generous linger so near-simultaneous submissions land in one batch
    batcher = Stage1Batcher(llm_wrapper, max_batch=8, linger_s=1.0)
    try:
        futs = [batcher.submit(llm_infer.CodeTask(save_file_name="b.npy",
                                                  prompt=p))
                for p in prompts]
        results = [f.result(timeout=300) for f in futs]
    finally:
        batcher.shutdown()

    assert max(batcher.batch_sizes) >= 2, batcher.batch_sizes
    for single, task in zip(singles, results):
        np.testing.assert_array_equal(single, task.result)


def test_batcher_propagates_errors(llm_wrapper):
    class Boom(Exception):
        pass

    class FailingLLM:
        def infer_batch(self, tasks):
            raise Boom("decode failed")

    batcher = Stage1Batcher(FailingLLM(), max_batch=4, linger_s=0.2)
    try:
        futs = [batcher.submit(llm_infer.CodeTask(save_file_name="x",
                                                  prompt=p))
                for p in ("a", "b")]
        for f in futs:
            with pytest.raises(Boom):
                f.result(timeout=60)
    finally:
        batcher.shutdown()


def test_serving_engine_concurrent_requests():
    engine = ServingEngine.build(tiny=True, linger_s=0.5)
    try:
        prompts = ["a cat playing piano", "a dog surfing"]
        out: dict = {}
        errs: list = []

        def req(p):
            try:
                out[p] = engine.generate(p, seed=5)
            except BaseException as e:  # surface in the main thread
                errs.append(e)

        threads = [threading.Thread(target=req, args=(p,)) for p in prompts]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs, errs
        for p in prompts:
            video = out[p]["video"]
            assert video.ndim == 5 and video.shape[1] == 3
            assert not np.isnan(video).any()
        stats = engine.stats()
        assert stats["requests"] == 2
        # both stage-1 decodes coalesced into one batched AR loop
        assert max(stats["stage1_batch_sizes"]) == 2, stats
    finally:
        engine.shutdown()
