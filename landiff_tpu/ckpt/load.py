"""Runtime checkpoint loading: LanDiff ckpt tree -> landiff-tpu param pytrees.

Checkpoint tree (ckpts/CHECKSUM.md5):
  llm/model.safetensors                      stage-1 Semantic1DLM
  tokenizer/model.safetensors                VideoVQ (TiTok + quantizer)
  diffusion/1/mp_rank_00_model_states.pt     trained control + semantic cond
  CogVideoX-2b-sat/transformer/1000/mp_rank_00_model_states.pt   base DiT
  CogVideoX-2b-sat/vae/3d-vae.pt             causal 3D VAE
  CogVideoX-2b-sat/t5-v1_1-xxl/              stage-2 T5 (HF sharded st)
Stage-1 T5 (flan-t5-xxl) and Theia come from the HF cache (frozen weights
are omitted from the released ckpts via freeze_model — utils.py:236-268).

ControlDiffWarp load order (dit_video_concat.py:1164-1194): CogVideoX base
weights into BOTH main and control nets (strict=False), then the LanDiff
diffusion ckpt overrides the trained pieces.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import LanDiffConfig
from landiff_tpu.ckpt import convert

logger = logging.getLogger("landiff_tpu.ckpt")


def _to_jnp(tree, dtype=None):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if dtype and np.issubdtype(
            np.asarray(x).dtype, np.floating) else jnp.asarray(x), tree)


def load_hf_sharded_safetensors(model_dir: str | Path) -> dict:
    """Load HF safetensors (single file or sharded with index.json) as
    zero-copy mmap-backed views (convert.load_safetensors_views)."""
    model_dir = Path(model_dir)
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        out = {}
        for shard in sorted(set(weight_map.values())):
            out.update(convert.load_safetensors_views(model_dir / shard))
        return out
    return convert.load_safetensors_views(model_dir / "model.safetensors")


def load_stage1(ckpt_dir: str | Path, cfg: LanDiffConfig,
                dtype=jnp.float32) -> dict:
    """{"lm": ..., "t5": ...} — T5 from HF cache (flan-t5-xxl) or a local
    't5-v1_1-xxl'/'flan-t5-xxl' dir inside the ckpt tree."""
    from landiff_tpu.models import t5 as t5_lib

    ckpt_dir = Path(ckpt_dir)
    sd = convert.load_torch_file(ckpt_dir / "llm" / "model.safetensors")
    lm = convert.convert_llm(sd, cfg.llm.num_layers)

    t5_dir = None
    for cand in ("flan-t5-xxl", "CogVideoX-2b-sat/t5-v1_1-xxl",
                 "t5-v1_1-xxl"):
        if (ckpt_dir / cand).exists():
            t5_dir = ckpt_dir / cand
            break
    if t5_dir is None:
        # reference stage-1 pulls google/flan-t5-xxl from the HF hub
        # (text_encoder.py:137-146); mirror that as the fallback
        try:
            from huggingface_hub import snapshot_download

            t5_dir = Path(snapshot_download("google/flan-t5-xxl"))
        except Exception as e:
            raise FileNotFoundError(
                f"no T5 weights under {ckpt_dir} and HF hub fetch of "
                f"google/flan-t5-xxl failed ({e})") from None
    t5_sd = load_hf_sharded_safetensors(t5_dir)
    t5 = t5_lib.params_from_hf_state_dict(t5_sd, cfg.t5, dtype)
    return {"lm": _to_jnp(lm, dtype), "t5": t5}


def load_tokenizer(ckpt_dir: str | Path, cfg: LanDiffConfig,
                   dtype=jnp.float32, with_theia: bool = True) -> dict:
    ckpt_dir = Path(ckpt_dir)
    sd = convert.load_torch_file(ckpt_dir / "tokenizer" / "model.safetensors")
    params = convert.convert_tokenizer(sd)
    if with_theia:
        params["theia"] = load_theia(cfg, dtype)
    return _to_jnp(params, dtype)


def load_theia(cfg: LanDiffConfig, dtype=jnp.float32):
    """Theia from the HF cache (frozen, not in the LanDiff release)."""
    from huggingface_hub import snapshot_download

    d = Path(snapshot_download("theaiinstitute/theia-base-patch16-224-cddsv"))
    sd = load_hf_sharded_safetensors(d)
    return _to_jnp(convert.convert_theia(sd, cfg.tokenizer.theia.num_layers),
                   dtype)


def load_stage2(ckpt_dir: str | Path, cfg: LanDiffConfig,
                dtype=jnp.float32) -> dict:
    from landiff_tpu.models import t5 as t5_lib

    ckpt_dir = Path(ckpt_dir)
    base_sd = convert.load_torch_file(
        ckpt_dir / "CogVideoX-2b-sat" / "transformer" / "1000"
        / "mp_rank_00_model_states.pt")
    base_sd = {k[6:]: v for k, v in base_sd.items() if k.startswith("model.")}

    landiff_sd = convert.load_torch_file(
        ckpt_dir / "diffusion" / "1" / "mp_rank_00_model_states.pt")
    parts = convert.split_engine_state(landiff_sd)

    # base into both nets, then LanDiff overrides (ControlDiffWarp order)
    main_sd = dict(base_sd)
    main_sd.update(parts["main"])
    control_sd = dict(base_sd)
    control_sd.update({k: v for k, v in parts["control"].items()
                       if not k.startswith("semantic_conditioner.")})

    main = convert.convert_dit(main_sd, cfg.dit.num_layers, control=False)
    control = convert.convert_dit(control_sd, cfg.dit.control_layers,
                                  control=True)
    semantic = convert.convert_semantic_cond(
        parts["semantic"], cfg.semantic_cond.num_res_blocks)

    return {
        "main": _to_jnp(main, dtype),
        "control": _to_jnp(control, dtype),
        "semantic": _to_jnp(semantic, dtype),
        "vae": load_vae(ckpt_dir, cfg, dtype),
        "t5": load_stage2_t5(ckpt_dir, cfg, dtype),
    }


def load_vae(ckpt_dir: str | Path, cfg: LanDiffConfig, dtype=jnp.float32):
    """3d-vae.pt alone (Lightning state_dict; autoencoder.py:603-614)."""
    vae_sd = convert.load_torch_file(
        Path(ckpt_dir) / "CogVideoX-2b-sat" / "vae" / "3d-vae.pt")
    return _to_jnp(convert.convert_vae(vae_sd, cfg.vae.num_res_blocks,
                                       len(cfg.vae.ch_mult)), dtype)


def load_stage2_t5(ckpt_dir: str | Path, cfg: LanDiffConfig,
                   dtype=jnp.float32):
    """Stage-2 local T5 dir (FrozenT5Embedder, encoders/modules.py:246-295)."""
    from landiff_tpu.models import t5 as t5_lib

    t5_sd = load_hf_sharded_safetensors(
        Path(ckpt_dir) / "CogVideoX-2b-sat" / "t5-v1_1-xxl")
    return t5_lib.params_from_hf_state_dict(t5_sd, cfg.t5, dtype)
