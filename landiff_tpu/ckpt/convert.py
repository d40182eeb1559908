"""Checkpoint conversion: reference torch checkpoints -> landiff-tpu pytrees.

Handles the reference's four formats (SURVEY §5 checkpoint/resume):
  1. safetensors strict-load for LLM & tokenizer (llm_infer.py:70-71,
     video_titok_vq.py:161-167)
  2. SAT/DeepSpeed `mp_rank_00_model_states.pt["module"]` for the DiT
     (dif_infer.py:147, dit_video_concat.py:1176-1185)
  3. Lightning-style `["state_dict"]` for 3d-vae.pt (autoencoder.py:603-614)
  4. HF hub T5/Theia (frozen weights, omitted from released ckpts via
     freeze_model — utils.py:220-275)

All mapping functions take a FLAT dict[str, np.ndarray] (torch state_dict
converted to numpy) and return our nested pytrees; torch is only needed by
the `load_torch_file` helper (dev-time). Linear weights transpose
(out,in)->(in,out); convs to HWIO/DHWIO.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger("landiff_tpu.ckpt")


def load_torch_file(path: str | Path) -> dict[str, np.ndarray]:
    """Load .pt/.safetensors into numpy, unwrapping DeepSpeed 'module' and
    Lightning 'state_dict' envelopes."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "module" in obj:
        obj = obj["module"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def _lin(sd, key):
    """torch Linear weight -> (in, out)."""
    return np.ascontiguousarray(sd[key].T)


def _sub(sd, prefix):
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# 1. Stage-1 LLM (Semantic1DLM safetensors; module names from
#    llm/models/lm_model.py + transformer.py + transformer_blocks.py)


def convert_llm(sd: dict[str, np.ndarray], num_layers: int) -> dict:
    blocks = []
    for i in range(num_layers):
        p = f"transformer.blocks.{i}."
        blocks.append({
            "wqkv": _lin(sd, p + "wqkv.weight"),
            "wo": _lin(sd, p + "wo.weight"),
            "norm0": sd[p + "norm0.weight"],
            "norm1": sd[p + "norm1.weight"],
            "w1": _lin(sd, p + "mlp.w1.weight"),
            "w2": _lin(sd, p + "mlp.w2.weight"),
            "w3": _lin(sd, p + "mlp.w3.weight"),
        })
    micro = {}
    for key in ("frames", "motion_score"):
        p = f"micro_condition.mlps.{key}."
        if p + "0.weight" in sd:
            micro[key] = {
                "fc0_w": _lin(sd, p + "0.weight"),
                "fc0_b": sd[p + "0.bias"],
                "fc1_w": _lin(sd, p + "2.weight"),
                "fc1_b": sd[p + "2.bias"],
            }
    return {
        "gpt": {
            "blocks": blocks,
            "ln_f": {"w": sd["transformer.layer_norm.weight"],
                     "b": sd["transformer.layer_norm.bias"]},
            "head": _lin(sd, "transformer.head.weight"),
        },
        "tok_emb": sd["visual_embedding_model.tok_emb_code.weight"],
        "text_proj": {
            "fc0_w": _lin(sd, "cond_model.embeddings.fc0.weight"),
            "fc0_b": sd["cond_model.embeddings.fc0.bias"],
            "fc1_w": _lin(sd, "cond_model.embeddings.fc1.weight"),
            "fc1_b": sd["cond_model.embeddings.fc1.bias"],
        },
        "null_text_embedding": sd["cond_model.null_text_embedding"],
        "micro": micro,
    }


# ---------------------------------------------------------------------------
# 2. Tokenizer (VideoVQ safetensors; tokenizer/modules/blocks.py names)


def _convert_titok_block(sd, prefix):
    return {
        "ln0_w": sd[prefix + "ln_1.weight"],
        "ln0_b": sd[prefix + "ln_1.bias"],
        "wq": _lin(sd, prefix + "attn.wq.weight"),
        "wk": _lin(sd, prefix + "attn.wk.weight"),
        "wv": _lin(sd, prefix + "attn.wv.weight"),
        "wo": _lin(sd, prefix + "attn.wo.weight"),
        "ln1_w": sd[prefix + "ln_2.weight"],
        "ln1_b": sd[prefix + "ln_2.bias"],
        "fc0_w": _lin(sd, prefix + "mlp.c_fc.weight"),
        "fc0_b": sd[prefix + "mlp.c_fc.bias"],
        "fc1_w": _lin(sd, prefix + "mlp.c_proj.weight"),
        "fc1_b": sd[prefix + "mlp.c_proj.bias"],
    }


def _count_layers(sd, pat):
    i = 0
    while any(k.startswith(pat.format(i)) for k in sd):
        i += 1
    return i


def convert_tokenizer(sd: dict[str, np.ndarray]) -> dict:
    n_enc = _count_layers(sd, "encoder.transformer.{}.")
    n_dec = _count_layers(sd, "decoder.transformer.{}.")
    # patch_embed conv2d 1x1 (C_out, C_in, 1, 1) -> per-token linear (in,out)
    pw = sd["encoder.patch_embed.weight"]
    enc = {
        "patch_w": np.ascontiguousarray(pw[:, :, 0, 0].T),
        "patch_b": sd["encoder.patch_embed.bias"],
        "iframe_latent": sd["encoder.IFrame_latent_tokens"],
        "pframe_latent": sd["encoder.PFrame_latent_tokens"],
        "ln_pre_w": sd["encoder.ln_pre.weight"],
        "ln_pre_b": sd["encoder.ln_pre.bias"],
        "blocks": [_convert_titok_block(sd, f"encoder.transformer.{i}.")
                   for i in range(n_enc)],
        "ln_post_w": sd["encoder.ln_post.weight"],
        "ln_post_b": sd["encoder.ln_post.bias"],
        "proj_w": _lin(sd, "encoder.proj_out.weight"),
        "proj_b": sd["encoder.proj_out.bias"],
    }
    dec = {
        "embed_w": _lin(sd, "decoder.decoder_embed.weight"),
        "embed_b": sd["decoder.decoder_embed.bias"],
        "mask_token": sd["decoder.mask_token"].reshape(-1),
        "ln_pre_w": sd["decoder.ln_pre.weight"],
        "ln_pre_b": sd["decoder.ln_pre.bias"],
        "blocks": [_convert_titok_block(sd, f"decoder.transformer.{i}.")
                   for i in range(n_dec)],
        "ln_post_w": sd["decoder.ln_post.weight"],
        "ln_post_b": sd["decoder.ln_post.bias"],
        "ffn0_w": _lin(sd, "decoder.ffn.0.weight"),
        "ffn0_b": sd["decoder.ffn.0.bias"],
        "ffn1_w": _lin(sd, "decoder.ffn.2.weight"),
        "ffn1_b": sd["decoder.ffn.2.bias"],
    }
    # vector-quantize-pytorch VectorQuantize
    codebook = sd.get("quantizer._codebook.embed",
                      sd.get("quantizer.codebook"))
    if codebook is not None and codebook.ndim == 3:
        codebook = codebook[0]
    quant = {
        "in_w": _lin(sd, "quantizer.project_in.weight"),
        "in_b": sd["quantizer.project_in.bias"],
        "out_w": _lin(sd, "quantizer.project_out.weight"),
        "out_b": sd["quantizer.project_out.bias"],
        "codebook": codebook,
    }
    out = {"encoder": enc, "decoder": dec, "quant": quant}
    if "mean" in sd:
        out["mean"] = sd["mean"]
        out["std"] = sd["std"]
    return out


# ---------------------------------------------------------------------------
# 3. DiT (SAT mp_rank_00_model_states.pt; sat module names, see
#    dit_video_concat.py mixin construction)


def convert_dit(sd: dict[str, np.ndarray], num_layers: int,
                control: bool = False) -> dict:
    layers = []
    for i in range(num_layers):
        lp = f"transformer.layers.{i}."
        ap = "mixins.adaln_layer."
        layer = {
            "adaln_w": _lin(sd, ap + f"adaLN_modulations.{i}.1.weight"),
            "adaln_b": sd[ap + f"adaLN_modulations.{i}.1.bias"],
            "ln1_w": sd[lp + "input_layernorm.weight"],
            "ln1_b": sd[lp + "input_layernorm.bias"],
            "qkv_w": _lin(sd, lp + "attention.query_key_value.weight"),
            "qkv_b": sd[lp + "attention.query_key_value.bias"],
            "attn_out_w": _lin(sd, lp + "attention.dense.weight"),
            "attn_out_b": sd[lp + "attention.dense.bias"],
            "ln2_w": sd[lp + "post_attention_layernorm.weight"],
            "ln2_b": sd[lp + "post_attention_layernorm.bias"],
            "mlp0_w": _lin(sd, lp + "mlp.dense_h_to_4h.weight"),
            "mlp0_b": sd[lp + "mlp.dense_h_to_4h.bias"],
            "mlp1_w": _lin(sd, lp + "mlp.dense_4h_to_h.weight"),
            "mlp1_b": sd[lp + "mlp.dense_4h_to_h.bias"],
        }
        if ap + f"query_layernorm_list.{i}.weight" in sd:
            layer.update({
                "q_ln_w": sd[ap + f"query_layernorm_list.{i}.weight"],
                "q_ln_b": sd[ap + f"query_layernorm_list.{i}.bias"],
                "k_ln_w": sd[ap + f"key_layernorm_list.{i}.weight"],
                "k_ln_b": sd[ap + f"key_layernorm_list.{i}.bias"],
            })
        if control:
            layer["zero_linear_w"] = _lin(
                sd, ap + f"zero_linears.{i}.weight")
        layers.append(layer)

    pw = sd["mixins.patch_embed.proj.weight"]  # (D, C, p, p)
    out = {
        "patch_w": np.ascontiguousarray(pw.transpose(2, 3, 1, 0)),
        "patch_b": sd["mixins.patch_embed.proj.bias"],
        "text_proj_w": _lin(sd, "mixins.patch_embed.text_proj.weight"),
        "text_proj_b": sd["mixins.patch_embed.text_proj.bias"],
        "time_mlp": {
            "fc0_w": _lin(sd, "time_embed.0.weight"),
            "fc0_b": sd["time_embed.0.bias"],
            "fc1_w": _lin(sd, "time_embed.2.weight"),
            "fc1_b": sd["time_embed.2.bias"],
        },
        "layers": layers,
        "final_ln_w": sd["transformer.final_layernorm.weight"],
        "final_ln_b": sd["transformer.final_layernorm.bias"],
    }
    # the control net has EmptyFinalLayerMixin — any final_layer keys in the
    # (base) state dict are ignored, as SAT's strict=False load does
    if not control and "mixins.final_layer.norm_final.weight" in sd:
        out["final"] = {
            "norm_w": sd["mixins.final_layer.norm_final.weight"],
            "norm_b": sd["mixins.final_layer.norm_final.bias"],
            "adaln_w": _lin(sd, "mixins.final_layer.adaLN_modulation.1.weight"),
            "adaln_b": sd["mixins.final_layer.adaLN_modulation.1.bias"],
            "linear_w": _lin(sd, "mixins.final_layer.linear.weight"),
            "linear_b": sd["mixins.final_layer.linear.bias"],
        }
    return out


# ---------------------------------------------------------------------------
# 4. Semantic conditioner (control_model.semantic_conditioner.*)


def _conv2d(sd, key):
    """(O, I, kh, kw) -> HWIO."""
    return np.ascontiguousarray(sd[key].transpose(2, 3, 1, 0))


def _vq_resblock(sd, prefix):
    p = {
        "norm1_w": sd[prefix + "norm1.weight"],
        "norm1_b": sd[prefix + "norm1.bias"],
        "conv1_w": _conv2d(sd, prefix + "conv1.weight"),
        "conv1_b": sd[prefix + "conv1.bias"],
        "norm2_w": sd[prefix + "norm2.weight"],
        "norm2_b": sd[prefix + "norm2.bias"],
        "conv2_w": _conv2d(sd, prefix + "conv2.weight"),
        "conv2_b": sd[prefix + "conv2.bias"],
    }
    if prefix + "nin_shortcut.weight" in sd:
        p["nin_w"] = _conv2d(sd, prefix + "nin_shortcut.weight")
        p["nin_b"] = sd[prefix + "nin_shortcut.bias"]
    return p


def convert_semantic_cond(sd: dict[str, np.ndarray],
                          num_res_blocks: int = 4) -> dict:
    """sd scoped to semantic_conditioner.* (strip the prefix first).
    The inner VideoVQ lives at semantic_model.model.*"""
    vq = convert_tokenizer(_sub(sd, "semantic_model.model."))
    up = "upsample_model."
    upsampler = {
        "conv_in_w": _conv2d(sd, up + "conv_in.weight"),
        "conv_in_b": sd[up + "conv_in.bias"],
        "mid1": _vq_resblock(sd, up + "mid.block_1."),
        "mid2": _vq_resblock(sd, up + "mid.block_2."),
        "up1": [_vq_resblock(sd, up + f"up.1.block.{i}.")
                for i in range(num_res_blocks + 1)],
        "up1_conv_w": _conv2d(sd, up + "up.1.upsample.conv.weight"),
        "up1_conv_b": sd[up + "up.1.upsample.conv.bias"],
        "up0": [_vq_resblock(sd, up + f"up.0.block.{i}.")
                for i in range(num_res_blocks + 1)],
        "norm_out_w": sd[up + "norm_out.weight"],
        "norm_out_b": sd[up + "norm_out.bias"],
        "conv_out_w": _conv2d(sd, up + "conv_out.weight"),
        "conv_out_b": sd[up + "conv_out.bias"],
    }
    return {
        "vq": vq,
        "upsampler": upsampler,
        "conv_out_w": _conv2d(sd, "conv_out.weight"),
        "conv_out_b": sd["conv_out.bias"],
    }


# ---------------------------------------------------------------------------
# 5. VAE (3d-vae.pt["state_dict"]; vae_modules/cp_enc_dec.py names)


def _conv3d(sd, key):
    """(O, I, kt, kh, kw) -> DHWIO."""
    return np.ascontiguousarray(sd[key].transpose(2, 3, 4, 1, 0))


def _causal(sd, prefix):
    return {"w": _conv3d(sd, prefix + "conv.weight"),
            "b": sd[prefix + "conv.bias"]}


def _vae_norm(sd, prefix, spatial: bool):
    if not spatial:
        return {"norm_w": sd[prefix + "weight"],
                "norm_b": sd[prefix + "bias"]}
    return {
        "norm_w": sd[prefix + "norm_layer.weight"],
        "norm_b": sd[prefix + "norm_layer.bias"],
        "conv_y": _causal(sd, prefix + "conv_y."),
        "conv_b": _causal(sd, prefix + "conv_b."),
    }


def _vae_resblock(sd, prefix, spatial: bool):
    p = {
        "norm1": _vae_norm(sd, prefix + "norm1.", spatial),
        "conv1": _causal(sd, prefix + "conv1."),
        "norm2": _vae_norm(sd, prefix + "norm2.", spatial),
        "conv2": _causal(sd, prefix + "conv2."),
    }
    if prefix + "nin_shortcut.weight" in sd:
        w = sd[prefix + "nin_shortcut.weight"]  # Conv3d 1x1x1 (O,I,1,1,1)
        p["nin_w"] = np.ascontiguousarray(w[:, :, 0, 0, 0].T)
        p["nin_b"] = sd[prefix + "nin_shortcut.bias"]
    return p


def convert_vae(sd: dict[str, np.ndarray], num_res_blocks: int = 3,
                num_levels: int = 4) -> dict:
    enc = {
        "conv_in": _causal(sd, "encoder.conv_in."),
        "down": [],
        "mid1": _vae_resblock(sd, "encoder.mid.block_1.", False),
        "mid2": _vae_resblock(sd, "encoder.mid.block_2.", False),
        "norm_out_w": sd["encoder.norm_out.weight"],
        "norm_out_b": sd["encoder.norm_out.bias"],
        "conv_out": _causal(sd, "encoder.conv_out."),
    }
    for i in range(num_levels):
        level = {"blocks": [
            _vae_resblock(sd, f"encoder.down.{i}.block.{j}.", False)
            for j in range(num_res_blocks)]}
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["down"] = {
                "conv_w": _conv2d(sd, f"encoder.down.{i}.downsample.conv.weight"),
                "conv_b": sd[f"encoder.down.{i}.downsample.conv.bias"],
            }
        enc["down"].append(level)
    dec = {
        "conv_in": _causal(sd, "decoder.conv_in."),
        "mid1": _vae_resblock(sd, "decoder.mid.block_1.", True),
        "mid2": _vae_resblock(sd, "decoder.mid.block_2.", True),
        "up": [],
        "norm_out": _vae_norm(sd, "decoder.norm_out.", True),
        "conv_out": _causal(sd, "decoder.conv_out."),
    }
    for i in range(num_levels):
        level = {"blocks": [
            _vae_resblock(sd, f"decoder.up.{i}.block.{j}.", True)
            for j in range(num_res_blocks + 1)]}
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["up"] = {
                "conv_w": _conv2d(sd, f"decoder.up.{i}.upsample.conv.weight"),
                "conv_b": sd[f"decoder.up.{i}.upsample.conv.bias"],
            }
        dec["up"].append(level)
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# 6. Theia ViT (HF DeiT/ViTModel state dict, possibly under backbone.model.)


def convert_theia(sd: dict[str, np.ndarray], num_layers: int = 12) -> dict:
    for pre in ("backbone.model.", "model.backbone.model.", ""):
        if pre + "embeddings.cls_token" in sd:
            sd = _sub(sd, pre)
            break
    blocks = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        blocks.append({
            "ln0_w": sd[p + "layernorm_before.weight"],
            "ln0_b": sd[p + "layernorm_before.bias"],
            "q_w": _lin(sd, p + "attention.attention.query.weight"),
            "q_b": sd[p + "attention.attention.query.bias"],
            "k_w": _lin(sd, p + "attention.attention.key.weight"),
            "k_b": sd[p + "attention.attention.key.bias"],
            "v_w": _lin(sd, p + "attention.attention.value.weight"),
            "v_b": sd[p + "attention.attention.value.bias"],
            "o_w": _lin(sd, p + "attention.output.dense.weight"),
            "o_b": sd[p + "attention.output.dense.bias"],
            "ln1_w": sd[p + "layernorm_after.weight"],
            "ln1_b": sd[p + "layernorm_after.bias"],
            "fc0_w": _lin(sd, p + "intermediate.dense.weight"),
            "fc0_b": sd[p + "intermediate.dense.bias"],
            "fc1_w": _lin(sd, p + "output.dense.weight"),
            "fc1_b": sd[p + "output.dense.bias"],
        })
    return {
        "patch_w": _conv2d(sd, "embeddings.patch_embeddings.projection.weight"),
        "patch_b": sd["embeddings.patch_embeddings.projection.bias"],
        "cls": sd["embeddings.cls_token"].reshape(-1),
        "pos": sd["embeddings.position_embeddings"][0],
        "blocks": blocks,
        "ln_f_w": sd["layernorm.weight"],
        "ln_f_b": sd["layernorm.bias"],
    }


# ---------------------------------------------------------------------------
# engine-checkpoint splitter


def split_engine_state(sd: dict[str, np.ndarray]):
    """Split a SATControlVideoDiffusionEngine checkpoint into per-model flat
    dicts: main DiT, control DiT, semantic conditioner, VAE, T5."""
    return {
        "main": _sub(sd, "model.diffusion_model.main_model."),
        "control": _sub(sd, "model.diffusion_model.control_model."),
        "semantic": _sub(sd, "model.diffusion_model.control_model."
                             "semantic_conditioner."),
        "vae": _sub(sd, "first_stage_model."),
        "t5": _sub(sd, "conditioner.embedders.0.transformer."),
    }
