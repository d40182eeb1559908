"""Stage-2 inference wrapper: semantic tokens + prompt -> RGB video.

Reference: landiff/diffusion/dif_infer.py (CogWrapper.forward :152-243,
decode_latent :245-271, CogModelInferWrapper :274-302). The InferValueRegistry
semantic-feature cache becomes a closure captured by the sampler loop; the
GPU/CPU model swapping disappears (everything stays on-chip).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import LanDiffConfig
from landiff_tpu.diffusion import engine
from landiff_tpu.models import dit as dit_lib
from landiff_tpu.models import semantic_cond as sc_lib
from landiff_tpu.models import t5 as t5_lib
from landiff_tpu.models import vae as vae_lib
from landiff_tpu.pipeline.text import T5Text
from landiff_tpu.utils import seed_from_text

logger = logging.getLogger("landiff_tpu.dif_infer")


@dataclass
class VideoTask:
    """Matches dif_infer.py:91-98."""

    save_file_name: str
    prompt: str
    seed: int
    fps: int = 8
    semantic_token: np.ndarray | None = None
    result: np.ndarray | None = None        # (B, 3, T, H, W) in [0,1]
    latent: np.ndarray | None = None        # (B, T, C, H', W')


class CogModelInferWrapper:
    """params: {"main": DiT, "control": control DiT, "semantic": semantic
    conditioner, "vae": VAE, "t5": stage-2 T5}."""

    def __init__(self, params, cfg: LanDiffConfig,
                 tokenizer_dir: str | None = None,
                 compute_dtype=jnp.bfloat16, attn_impl="auto",
                 max_steps_per_call: int | None = None,
                 require_real_tokenizer: bool = False,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with (data, model[, time]) axes —
        runs the denoise loop as the TP/DP shard_map program
        (parallel/tp_infer.py), the reference's model-parallel inference
        mode (diffusion/arguments.py:215-299) rebuilt on ICI collectives."""
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.compute_dtype = compute_dtype
        self.attn_impl = attn_impl
        from landiff_tpu.utils import env_flag
        if env_flag("LANDIFF_DIT_INT8") and mesh is None:
            # W8A8 int8 DiT linears (dit.quantize_int8); opt-in,
            # drift-gated. The mesh path quantizes AFTER its tp prep
            # instead (tp_infer.make_tp_denoise_fn reads the same knob),
            # so raw weights must reach it here.
            self.params = dict(params)
            for k in ("main", "control"):
                self.params[k] = dit_lib.quantize_int8(params[k])
        if mesh is not None and mesh.shape.get("model", 1) > 1 \
                and "t5" in self.params:
            # TP-shard the T5 encoder over `model` (mesh.T5_RULES): the
            # 4.7B-param T5-XXL replicated would otherwise be the largest
            # per-chip HBM consumer in a multi-chip serving deployment
            # (9.4 GB bf16 vs 16 GB/chip on v5e)
            from landiff_tpu.parallel import mesh as mesh_lib

            self.params = dict(self.params)
            self.params["t5"] = mesh_lib.shard_params(
                self.params["t5"], mesh, mesh_lib.T5_RULES)
        if max_steps_per_call is None:
            env = os.environ.get("LANDIFF_MAX_STEPS_PER_CALL")
            max_steps_per_call = int(env) if env else None
        self.max_steps_per_call = max_steps_per_call
        # stage-2 T5: max_length 226, padding to max, no attention mask
        # (encoders/modules.py:271-289)
        self.text = T5Text(tokenizer_dir or cfg.t5.model_name or None,
                           max_length=cfg.dit.text_length,
                           padding_side="right",
                           require_real=require_real_tokenizer)

    def offload_diffusion_params(self):
        """Move the diffusion-side params (main/control/semantic) to host,
        freeing ~6 GB of HBM before the VAE decode — the reference's
        model.cpu()/cuda() swap (infer_video.py:83-85). Host pytrees are
        restaged automatically when the next jitted call receives them."""
        import numpy as _np

        for k in ("main", "control", "semantic"):
            if k in self.params:
                self.params[k] = jax.tree_util.tree_map(
                    lambda x: _np.asarray(x), self.params[k])

    def encode_text(self, prompt: str):
        ids, _ = self.text([prompt], pad_to_max=True)
        # reference passes no attention mask: pads are attended (fp32)
        return t5_lib.encode(self.params["t5"], jnp.asarray(ids), None,
                             self.cfg.t5, compute_dtype=jnp.float32)

    def __call__(self, task: VideoTask,
                 prefix_video: np.ndarray | None = None,
                 init_noise: np.ndarray | None = None) -> VideoTask:
        """prefix_video: optional (B, 3, T0, H, W) in [0,1] — image2video /
        continuation: VAE-encoded into prefix latents spliced into the noise
        each sampler step (diffusion_video.py:287-288, sampling.py:800-817).
        init_noise: optional initial latents replacing the seeded draw (the
        reference `generator` seam, diffusion_video.py:262-283)."""
        cfg = self.cfg
        assert task.semantic_token is not None, "stage-1 codes required"
        tokens = jnp.asarray(task.semantic_token).reshape(1, -1)

        # CogWrapper.forward seed semantics (dif_infer.py:190-195): an
        # explicit task seed is used DIRECTLY (the wrapper always passes one,
        # :296); the text-hash combination only backs a missing seed.
        seed = int(task.seed) if task.seed is not None else \
            seed_from_text(str(task.prompt), 42)
        key = jax.random.PRNGKey(seed)

        context = self.encode_text(task.prompt)
        uc_context = jnp.zeros_like(context)  # force_uc_zero_embeddings

        prefix = None
        if prefix_video is not None:
            pv = engine.pre_process_video(jnp.asarray(prefix_video))
            prefix = engine.encode_first_stage(
                self.params["vae"], pv, cfg.vae,
                compute_dtype=self.compute_dtype)

        if self.mesh is not None:
            from landiff_tpu.parallel import tp_infer

            denoise_fn, bundle = tp_infer.make_tp_denoise_fn(
                self.params, self.mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
                cfg.semantic_cond, context, uc_context, tokens,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl)
        else:
            denoise_fn, bundle = engine.make_denoise_fn(
                self.params["main"], self.params["control"],
                self.params["semantic"], cfg.dit, cfg.sampler, cfg.tokenizer,
                cfg.semantic_cond, context, uc_context, tokens,
                compute_dtype=self.compute_dtype, attn_impl=self.attn_impl)
        latents = engine.sample_latents(
            denoise_fn, cfg.sampler, cfg.dit, key=key, bundle=bundle,
            prefix=prefix, max_steps_per_call=self.max_steps_per_call,
            init_noise=init_noise)
        if os.environ.get("LANDIFF_OFFLOAD") == "1":
            # single-chip 16 GB: DiT+control+semantic (~6 GB) + VAE caches
            # + decode activations don't all fit at 480p — swap the
            # diffusion params to host like the reference's .cpu() move
            jax.block_until_ready(latents)
            self.offload_diffusion_params()
        from landiff_tpu.parallel import vae_cp

        n_time = self.mesh.shape.get("time", 1) if self.mesh is not None \
            else 1
        if n_time > 1 and vae_cp.can_decode_cp(latents.shape[1], n_time):
            video = engine.decode_first_stage_cp(
                self.params["vae"], latents, cfg.vae, self.mesh,
                compute_dtype=self.compute_dtype)
        else:
            # too few frames to halo-split (tiny configs / short clips):
            # replicated streaming decode instead of CP
            video = engine.decode_first_stage(
                self.params["vae"], latents, cfg.vae,
                compute_dtype=self.compute_dtype)
        video = engine.post_process_video(video)
        # fetch as uint8 (4x fewer host-transfer bytes); result keeps the
        # [0,1] float contract, values quantized to the 1/255 steps the
        # saved file has anyway
        vid8 = np.asarray(engine.video_to_uint8(video))
        return dataclasses.replace(task,
                                   result=vid8.astype(np.float32) / 255.0,
                                   latent=np.asarray(latents))


def init_params(key, cfg: LanDiffConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "main": dit_lib.init(ks[0], cfg.dit, dtype=dtype),
        "control": dit_lib.init(ks[1], cfg.dit, control=True, dtype=dtype),
        "semantic": sc_lib.init(ks[2], cfg.tokenizer, cfg.semantic_cond,
                                dtype),
        "vae": vae_lib.init(ks[3], cfg.vae, dtype),
        "t5": t5_lib.init(ks[4], cfg.t5, dtype),
    }
