"""Stage-1 inference wrapper: prompt -> semantic token codes.

Reference: landiff/llm/llm_infer.py (ArModelInferWrapper :58-105,
ARSampleCfg :13-46, CodeTask :49-55). The reference's per-token Python loop
becomes the jitted sampler in models/lm.py.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import ARSampleConfig, LLMConfig, T5Config
from landiff_tpu.models import lm as lm_lib
from landiff_tpu.models import t5 as t5_lib
from landiff_tpu.pipeline.text import T5Text

logger = logging.getLogger("landiff_tpu.llm_infer")


@dataclass
class CodeTask:
    """Matches llm_infer.py:49-55."""

    save_file_name: str
    prompt: str
    result: np.ndarray | None = None


class ArModelInferWrapper:
    """Builds the LM from params, runs constrained AR sampling.

    Args:
      params: {"lm": lm params, "t5": t5 params} (random-init for smoke).
    """

    def __init__(self, params, llm_cfg: LLMConfig, t5_cfg: T5Config,
                 sample_cfg: ARSampleConfig | None = None,
                 tokenizer_dir: str | None = None,
                 compute_dtype=jnp.bfloat16,
                 require_real_tokenizer: bool = False,
                 int8_decode: bool | None = None,
                 int4_decode: bool | None = None,
                 mesh=None):
        import os

        from landiff_tpu.utils import env_flag

        if int8_decode is None:
            int8_decode = env_flag("LANDIFF_DECODE_INT8")
        if int4_decode is None:
            int4_decode = env_flag("LANDIFF_DECODE_INT4")
        if int4_decode and mesh is not None and \
                mesh.shape.get("model", 1) > 1:
            # TP rules map int8's (out,) scales, not int4's (G, out)
            logger.warning("LANDIFF_DECODE_INT4 ignored under TP mesh")
            int4_decode = False
        if int8_decode or int4_decode:
            # weight-only quantized GPT: decode is weights-bandwidth
            # bound, so halving (int8) / quartering (int4, group-wise
            # scales) the HBM bytes/step cuts stage-1 latency nearly
            # proportionally. int4 wins if both are set.
            from landiff_tpu.models import gpt as gpt_lib

            params = dict(params)
            lm_p = dict(params["lm"])
            lm_p["gpt"] = (gpt_lib.quantize_int4(lm_p["gpt"]) if int4_decode
                           else gpt_lib.quantize_int8(lm_p["gpt"]))
            params["lm"] = lm_p
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            # TP-shard the GPT over `model` (GSPMD through the jitted
            # while_loop decode; mesh.GPT_RULES, int8 {q, s} leaves
            # inherit the base rule). Decode at batch<=2 is weights-
            # bandwidth bound (PARITY.md), so splitting the weight reads
            # tp-ways cuts per-step latency nearly tp-fold — the one
            # stage-1 lever DP can't touch.
            from landiff_tpu.parallel import mesh as mesh_lib

            params = dict(params)
            params["lm"] = mesh_lib.shard_params(params["lm"], mesh,
                                                 mesh_lib.GPT_RULES)
            # stage-1 prompt T5 likewise (T5-XXL replicated is the
            # largest HBM consumer on a multi-chip serving fleet)
            params["t5"] = mesh_lib.shard_params(params["t5"], mesh,
                                                 mesh_lib.T5_RULES)
        self.params = params
        self.mesh = mesh
        self.llm_cfg = llm_cfg
        self.t5_cfg = t5_cfg
        self.sample_cfg = sample_cfg or ARSampleConfig()
        self.compute_dtype = compute_dtype
        self.text = T5Text(tokenizer_dir or t5_cfg.model_name or None,
                           max_length=t5_cfg.max_length, padding_side="left",
                           require_real=require_real_tokenizer)

    def encode_text(self, prompt: str):
        """T5 encode, unpadded features (conditioner.py:230-264 path)."""
        ids, mask = self.text([prompt])
        emb = t5_lib.encode(self.params["t5"], jnp.asarray(ids),
                            jnp.asarray(mask), self.t5_cfg,
                            compute_dtype=self.compute_dtype)
        n = int(mask[0].sum())
        return emb[0, np.nonzero(mask[0])[0]], n

    def __call__(self, task: CodeTask) -> CodeTask:
        cfg = self.llm_cfg
        sc = self.sample_cfg
        lm_params = self.params["lm"]

        text_feats_raw, n_text = self.encode_text(task.prompt)
        text_feats = lm_lib.text_cond_features(lm_params, text_feats_raw,
                                               self.compute_dtype)
        micro = lm_lib.micro_cond_features(
            lm_params, cfg,
            {"frames": sc.num_frames, "motion_score": sc.motion_score},
            self.compute_dtype)
        prompt_feats = lm_lib.assemble_prompt(lm_params, cfg, text_feats,
                                              micro, self.compute_dtype)
        with_guidance = sc.cfg_scale > 0 and sc.cfg_scale != 1
        if with_guidance:
            null = lm_lib.null_text_features(lm_params, n_text,
                                             self.compute_dtype)
            uncond = lm_lib.assemble_prompt(lm_params, cfg, null, micro,
                                            self.compute_dtype)
            rows = jnp.stack([prompt_feats, uncond])
        else:
            rows = prompt_feats[None]

        sched = lm_lib.build_schedule(cfg, prompt_feats.shape[0],
                                      sc.num_frames)
        import contextlib

        with (self.mesh if self.mesh is not None
              else contextlib.nullcontext()):
            codes = lm_lib.sample(lm_params, cfg, sched, rows, sc,
                                  rng_key=jax.random.PRNGKey(sc.seed),
                                  compute_dtype=self.compute_dtype)
        task = dataclasses.replace(task, result=np.asarray(codes))
        logger.info("sampled %d semantic tokens for %r", len(codes),
                    task.prompt[:60])
        return task


    def infer_batch(self, tasks: list[CodeTask],
                    prefix_multiple: int = 16) -> list[CodeTask]:
        """Decode N prompts in ONE batched AR loop (lm.sample_batch).

        Decode at rows<=2 is weights-bandwidth/MXU-occupancy bound
        (PARITY.md floor analysis), so batching N prompts amortizes the
        per-step weight streaming N-fold — near-flat step time, ~N x
        stage-1 serving throughput. Prompts are right-aligned to the batch
        max prefix; each prompt keeps its own PRNG stream (PRNGKey(seed),
        as the single-prompt path), so results match per-prompt single
        runs exactly (tests/test_lm_batch.py)."""
        if not tasks:
            return tasks
        cfg = self.llm_cfg
        sc = self.sample_cfg
        lm_params = self.params["lm"]
        with_guidance = sc.cfg_scale > 0 and sc.cfg_scale != 1

        rows, lens = [], []
        for task in tasks:
            text_feats_raw, n_text = self.encode_text(task.prompt)
            text_feats = lm_lib.text_cond_features(lm_params, text_feats_raw,
                                                   self.compute_dtype)
            micro = lm_lib.micro_cond_features(
                lm_params, cfg,
                {"frames": sc.num_frames, "motion_score": sc.motion_score},
                self.compute_dtype)
            cond = lm_lib.assemble_prompt(lm_params, cfg, text_feats, micro,
                                          self.compute_dtype)
            lens.append(cond.shape[0])
            rows.append(cond)
            if with_guidance:
                null = lm_lib.null_text_features(lm_params, n_text,
                                                 self.compute_dtype)
                rows.append(lm_lib.assemble_prompt(
                    lm_params, cfg, null, micro, self.compute_dtype))

        # bucket the padded prefix so serving compiles one decode program
        # per (batch size, bucket) instead of per unique prompt length
        # (padded slots are masked out, so bucketing is semantics-free)
        prefix = -(-max(lens) // prefix_multiple) * prefix_multiple
        rows_per = 2 if with_guidance else 1
        pad = np.repeat(prefix - np.asarray(lens, np.int32), rows_per)
        stacked = jnp.stack([
            jnp.pad(r, ((prefix - r.shape[0], 0), (0, 0))) for r in rows])
        sched = lm_lib.build_schedule(cfg, prefix, sc.num_frames)
        keys = jnp.stack([jax.random.PRNGKey(sc.seed) for _ in tasks])

        import contextlib

        with (self.mesh if self.mesh is not None
              else contextlib.nullcontext()):
            codes = lm_lib.sample_batch(
                lm_params, cfg, sched, stacked, pad, sc, rng_keys=keys,
                compute_dtype=self.compute_dtype)
        out = []
        for task, c in zip(tasks, codes):
            out.append(dataclasses.replace(task, result=np.asarray(c)))
        logger.info("sampled %d prompts in one batched decode "
                    "(prefix %d, rows %d)", len(tasks), prefix, len(rows))
        return out


def init_params(key, llm_cfg: LLMConfig, t5_cfg: T5Config,
                dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "lm": lm_lib.init(k1, llm_cfg, t5_dim=t5_cfg.d_model, dtype=dtype),
        "t5": t5_lib.init(k2, t5_cfg, dtype),
    }
