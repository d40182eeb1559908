"""CogVideoX-2b DiT (main 30-layer + ControlNet-style 15-layer branch).

Reference: landiff/diffusion/dit_video_concat.py — the SAT BaseModel +
mixin-hook indirection is flattened into one direct functional module (the
hooks were an artifact of patching a pretrained SAT model, SURVEY §7):

  - ImagePatchEmbeddingMixin (:25-68): per-frame conv2d patchify (p=2) +
    text_proj(4096->1920), sequence = [text(226) | video(13*30*45=17550)]
  - Basic3DPositionEmbeddingMixin (:200-246): frozen 3-D sincos table,
    temporal D/4 + spatial 3D/4, h/w interpolation 1.875; zeros on text part
  - AdaLNMixin (:490-664): per-layer 12-way modulation (img/text x
    shift/scale/gate x msa/mlp), one full self-attention over the concat
    sequence with per-layer qk-LayerNorm (head_dim, eps 1e-6, affine)
  - SAT layer internals: fused query_key_value(+bias) split [q|k|v],
    scale 1/sqrt(hd), dense(+bias); mlp 1920->7680 gelu(tanh) ->1920(+bias);
    input/post_attention layernorms eps 1e-6 affine
  - final: SAT final_layernorm on full seq, then FinalLayerMixin (:413-460)
    norm + 2-way adaLN modulate + linear + unpatchify
  - ControlDiffusionTransformer (:912-1027): 15-layer copy; adds the
    semantic feature to the input latent; ControlOutAdaLNMixin (:1203-1238)
    maps each layer output through a zero-init bias-free linear (note: the
    zero linear REPLACES the stream, not just the tap); returns all layer
    outputs
  - ControlAdaLNMixin (:1241-1372): main layer i<15 adds control output i
    to the FULL hidden sequence (text included — SAT dict path :1355-1368)

num_classes is unset in the released config -> no label_emb / y.
Compute dtype bf16 (infer_cfgs/2b.yaml:11); norms/softmax accumulate fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import DiTConfig
from landiff_tpu.ops.attention import attention
from landiff_tpu.ops.embeddings import timestep_embedding
from landiff_tpu.ops.norms import layer_norm


# ---------------------------------------------------------------------------
# 3-D sincos position table (host, f64->f32; dit_video_concat.py:72-171)


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim, grid_h, grid_w, t_size,
                            interp_h=1.0, interp_w=1.0, interp_t=1.0):
    """(T, H*W, D): temporal D/4 block then spatial 3D/4 (h-half, w-half)."""
    dim_sp = embed_dim // 4 * 3
    dim_t = embed_dim // 4
    gh = np.arange(grid_h, dtype=np.float32) / interp_h
    gw = np.arange(grid_w, dtype=np.float32) / interp_w
    # np.meshgrid(w, h) -> grid[0]=w varying, grid[1]=h; reference encodes
    # h-half from grid[0] (w values!) per get_2d_sincos_pos_embed_from_grid
    grid = np.stack(np.meshgrid(gw, gh), axis=0).reshape(2, 1, grid_h, grid_w)
    emb_h = _sincos_1d(dim_sp // 2, grid[0])
    emb_w = _sincos_1d(dim_sp // 2, grid[1])
    pos_sp = np.concatenate([emb_h, emb_w], axis=1)          # (H*W, 3D/4)
    gt = np.arange(t_size, dtype=np.float32) / interp_t
    pos_t = _sincos_1d(dim_t, gt)                            # (T, D/4)
    pos_t = np.repeat(pos_t[:, None, :], grid_h * grid_w, axis=1)
    pos_sp = np.repeat(pos_sp[None, :, :], t_size, axis=0)
    return np.concatenate([pos_t, pos_sp], axis=-1)          # (T, H*W, D)


@functools.lru_cache(maxsize=4)
def pos_embed_table(cfg: DiTConfig) -> np.ndarray:
    """(text_length + T*n, D) float32; zeros over the text positions."""
    h = cfg.latent_height // cfg.patch_size
    w = cfg.latent_width // cfg.patch_size
    pe = get_3d_sincos_pos_embed(cfg.hidden_size, h, w, cfg.latent_frames,
                                 cfg.pos_interp_scale, cfg.pos_interp_scale)
    pe = pe.reshape(-1, cfg.hidden_size)
    out = np.zeros((cfg.text_length + pe.shape[0], cfg.hidden_size),
                   np.float32)
    out[cfg.text_length:] = pe
    return out


# ---------------------------------------------------------------------------
# Rotary 3-D positional alternative (Rotary3DPositionEmbeddingMixin,
# dit_video_concat.py:275-385). Unused by the released checkpoint (which
# ships Basic3D sincos) but part of the reference surface: per-head-dim
# axis split t:D/4, h:3D/8, w:3D/8, pairwise-interleaved frequencies,
# rotation applied to the VIDEO token slice of q/k (and v when rot_v)
# after qk-LN, i.e. exactly where the reference's attention_fn hook
# mutates query/key_layer (:352-371).


@functools.lru_cache(maxsize=4)
def rotary3d_tables(cfg: DiTConfig):
    """(video_tokens, head_dim) f32 cos/sin tables. Matches the reference
    construction (f32 throughout): freqs per axis 1/theta^(2i/dim),
    repeat-interleaved x2, broadcast-concat over the (T, H, W) grid
    (dit_video_concat.py:291-330)."""
    Dk = cfg.head_dim
    dim_t, dim_h = Dk // 4, Dk // 8 * 3
    dim_w = dim_h

    def freqs(dim):
        idx = np.arange(0, dim, 2, dtype=np.float32)[: dim // 2]
        return (1.0 / cfg.rope_theta ** (idx / dim)).astype(np.float32)

    T = cfg.latent_frames
    hh = cfg.latent_height // cfg.patch_size
    ww = cfg.latent_width // cfg.patch_size
    ft = np.outer(np.arange(T, dtype=np.float32), freqs(dim_t))
    fh = np.outer(np.arange(hh, dtype=np.float32), freqs(dim_h))
    fw = np.outer(np.arange(ww, dtype=np.float32), freqs(dim_w))
    # repeat '... n -> ... (n r)', r=2 (:313-315)
    ft, fh, fw = (np.repeat(a, 2, axis=-1) for a in (ft, fh, fw))
    f = np.concatenate([
        np.broadcast_to(ft[:, None, None, :], (T, hh, ww, dim_t)),
        np.broadcast_to(fh[None, :, None, :], (T, hh, ww, dim_h)),
        np.broadcast_to(fw[None, None, :, :], (T, hh, ww, dim_w)),
    ], axis=-1).reshape(T * hh * ww, Dk)
    return np.cos(f), np.sin(f)


def _rotate_half(t):
    # pairwise-interleaved rotate (dit_video_concat.py:268-273)
    x = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
    return jnp.stack([-x[..., 1], x[..., 0]], axis=-1).reshape(t.shape)


def _apply_rotary3d(t, cos, sin, text_len: int, offset=0):
    """t: (B, S_local, H, Dk) holding tokens [offset, offset + S_local) of
    the [text|video] sequence; rotates only positions >= text_len (the
    reference mutates the video slice of query/key_layer in place,
    :352-360). Implemented as a table gather + where so it works unchanged
    when the sequence is sharded (offset may be a traced shard offset
    under SP/TP-hybrid) — no concat, one (S_local, Dk) row gather."""
    S = t.shape[1]
    g = offset + jnp.arange(S)
    vp = jnp.clip(g - text_len, 0, cos.shape[0] - 1)
    c = cos[vp][None, :, None, :].astype(t.dtype)
    s = sin[vp][None, :, None, :].astype(t.dtype)
    rot = t * c + _rotate_half(t) * s
    return jnp.where((g < text_len)[None, :, None, None], t, rot)


def _maybe_rotary(q, k, v, cfg: DiTConfig, text_len: int, offset=0):
    """Applied AFTER qk-LN — the reference's attention_fn hook receives
    the post-LN query/key_layer (dit_video_concat.py:352-371)."""
    if cfg.pos_embed != "rotary3d":
        return q, k, v
    cos, sin = (jnp.asarray(a) for a in rotary3d_tables(cfg))
    q = _apply_rotary3d(q, cos, sin, text_len, offset)
    k = _apply_rotary3d(k, cos, sin, text_len, offset)
    if cfg.rot_v:
        v = _apply_rotary3d(v, cos, sin, text_len, offset)
    return q, k, v


# ---------------------------------------------------------------------------
# layers


def _w8a8_matmul(x, q, s):
    """int8 x int8 MXU matmul: per-token dynamic activation scales x
    per-output-channel weight scales, s32 accumulation.

    The v5e MXU's int8 peak is 2x bf16 (~394 vs ~197 T/s) and the DiT's
    big linears are MXU-bound at ~82 TFLOP/s bf16 (PARITY.md), so W8A8
    roughly halves their time. The reference has no quantized inference
    path (SURVEY §2.9 lists only bf16 autocast); this is a TPU-side bonus,
    opt-in via LANDIFF_DIT_INT8=1 (pipeline/dif_infer.py) and drift-gated
    by tests/test_dit_int8_drift.py."""
    sa = jnp.maximum(
        jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32),
        1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sa),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sa * s).astype(x.dtype)


def _linear(p, name, x):
    w = p[f"{name}_w"]
    if isinstance(w, dict):
        y = _w8a8_matmul(x, w["q"], w["s"])
    else:
        y = x @ w.astype(x.dtype)
    return y + p[f"{name}_b"].astype(x.dtype)


_INT8_LAYER_LEAVES = ("qkv_w", "attn_out_w", "mlp0_w", "mlp1_w")


def quantize_int8(params):
    """W8A8 int8 quantization of the per-layer transformer matmuls
    (qkv / attn-out / mlp), per-output-channel weight scales. adaLN,
    zero_linear, patch/text/time embeddings and the final head stay bf16
    (tiny next to the blocks; adaLN/zero paths are also exactness-critical
    at init where their params are zero). Apply to main AND control params
    before engine.make_denoise_fn; the forwards dispatch on the leaf type
    (see _linear)."""
    def quant(a):
        a = jnp.asarray(a, jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(a), axis=0), 1e-8) / 127.0
        qv = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
        return {"q": qv, "s": s}

    out = dict(params)
    out["layers"] = [
        {k: (quant(v) if k in _INT8_LAYER_LEAVES else v)
         for k, v in layer.items()}
        for layer in params["layers"]]
    return out


def _modulate(x, shift, scale):
    # modulate (dit_video_concat.py:388-390): shift/scale (B, D)
    return x * (1.0 + scale[:, None]) + shift[:, None]


def _adaln_sel(p, emb, S, tl, dt, offset=0):
    """adaLN_modulation = Sequential(SiLU, Linear) (dit_video_concat.py:
    510-515) -> the 12 (B, D) pieces + a position-select helper: the
    reference modulates text/img slices separately and re-concats
    (:577-588); here the per-token shift/scale/gate are position-selected
    (text vs video) so every modulation fuses into the neighbouring
    elementwise op instead of materializing concats.

    offset: global position of this stream's first token — 0 except under
    sequence-parallel sharding (_layer_sp), where each shard holds tokens
    [offset, offset + S) of the [text|video] sequence (may be traced)."""
    mods = _linear(p, "adaln", jax.nn.silu(emb.astype(dt)))
    pieces = jnp.split(mods, 12, axis=-1)
    is_text = ((offset + jnp.arange(S)) < tl)[None, :, None]

    def sel(tv, vv):
        # (B, 1, D) pair -> (B, S, D)-broadcast per-token value
        return jnp.where(is_text, tv[:, None], vv[:, None])

    return sel, pieces


def _layer(p, x, emb, cfg: DiTConfig, attn_impl):
    """One AdaLN DiT layer over the concat [text|video] sequence."""
    B, S, D = x.shape
    tl = cfg.text_length
    H, Dk = cfg.num_heads, cfg.head_dim
    dt = x.dtype

    sel, (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
          t_shift_msa, t_scale_msa, t_gate_msa, t_shift_mlp, t_scale_mlp,
          t_gate_mlp) = _adaln_sel(p, emb, S, tl, dt)

    # LANDIFF_FUSED_ADALN=1: one-HBM-pass Pallas LayerNorm+modulate
    # (ops/adaln.py). MEASURED SLOWER than XLA at production shape
    # (1.87 vs 1.44 ms/call, benchmarks/bench_adaln.py) — rejected,
    # keep OFF; knob retained for archaeology only
    from landiff_tpu.ops import adaln as adaln_lib
    from landiff_tpu.utils import env_flag

    fused = env_flag("LANDIFF_FUSED_ADALN")
    mod_impl = "auto" if fused else "xla"

    def modulate(y, wname, bname, t_shift, t_scale, v_shift, v_scale):
        if fused:
            return adaln_lib.adaln_modulate(
                y, p[wname].astype(dt), p[bname].astype(dt), t_shift,
                t_scale, v_shift, v_scale, text_len=tl, impl=mod_impl)
        h = layer_norm(y, p[wname], p[bname], 1e-6)
        return h * (1.0 + sel(t_scale, v_scale)) + sel(t_shift, v_shift)

    h = modulate(x, "ln1_w", "ln1_b", t_shift_msa, t_scale_msa,
                 shift_msa, scale_msa)

    qkv = _linear(p, "qkv", h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, Dk)
    k = k.reshape(B, S, H, Dk)
    v = v.reshape(B, S, H, Dk)
    if cfg.qk_ln:
        q = layer_norm(q, p["q_ln_w"], p["q_ln_b"], 1e-6)
        k = layer_norm(k, p["k_ln_w"], p["k_ln_b"], 1e-6)
    q, k, v = _maybe_rotary(q, k, v, cfg, tl)
    attn = attention(q, k, v, impl=attn_impl).reshape(B, S, D)
    attn = _linear(p, "attn_out", attn)
    x = x + sel(t_gate_msa, gate_msa) * attn

    h = modulate(x, "ln2_w", "ln2_b", t_shift_mlp, t_scale_mlp,
                 shift_mlp, scale_mlp)
    h = jax.nn.gelu(_linear(p, "mlp0", h), approximate=True)
    h = _linear(p, "mlp1", h)
    x = x + sel(t_gate_mlp, gate_mlp) * h
    return x


def _layer_tp(p, x, emb, cfg: DiTConfig, attn_impl, axis: str,
              sp_axis=None, offset=0):
    """Megatron-TP variant of `_layer`, run INSIDE shard_map: `p` holds the
    LOCAL shard of the tp-prepped layer params (parallel/tp_infer.py) —
    qkv_w (D, 3, H_local, Dk) column-parallel, attn_out_w (H_local, Dk, D)
    row-parallel, mlp0 column- / mlp1 row-parallel. The hidden stream x is
    replicated over the model axis (sharded over data only); one psum after
    attention-out and one after mlp1 per layer — 2 ICI all-reduces/layer,
    the collective count the v5e-8 projection models (bench.py).

    Head padding: when cfg.num_heads doesn't divide tp (30 heads / tp=4),
    prep pads to H_pad with ZERO q/k/v weights and zero attn_out rows —
    a pad head's v is 0, so its softmax output is 0 and it contributes
    nothing; exactness is preserved (qk_ln on a zero vector yields the
    constant bias -> uniform softmax over zero v, still 0).

    sp_axis/offset: optional 2-D hybrid — x additionally holds only the
    LOCAL tokens [offset, offset + S) sharded over `sp_axis` (the `time`
    mesh axis); attention becomes a ring over sp_axis on the local heads
    (each time-shard carries the SAME head shard, so the ring stays within
    one model index). This is the v5e-16/32 layout: model=4 x time=2/4
    (see parallel/tp_infer.py)."""
    B, S, D = x.shape
    tl = cfg.text_length
    dt = x.dtype
    w = p["qkv_w"]                          # (D, 3, H_local, Dk)
    _, _, Hl, Dk = (w["q"] if isinstance(w, dict) else w).shape

    sel, (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
          t_shift_msa, t_scale_msa, t_gate_msa, t_shift_mlp, t_scale_mlp,
          t_gate_mlp) = _adaln_sel(p, emb, S, tl, dt, offset=offset)

    h = layer_norm(x, p["ln1_w"], p["ln1_b"], 1e-6)
    h = h * (1.0 + sel(t_scale_msa, scale_msa)) + sel(t_shift_msa, shift_msa)

    if isinstance(w, dict):                 # W8A8 tp layout (tp_infer)
        qkv = _w8a8_matmul(h, w["q"].reshape(D, 3 * Hl * Dk),
                           w["s"].reshape(3 * Hl * Dk))
    else:
        qkv = h @ w.reshape(D, 3 * Hl * Dk).astype(dt)
    qkv = qkv + p["qkv_b"].reshape(3 * Hl * Dk).astype(dt)
    qkv = qkv.reshape(B, S, 3, Hl, Dk)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if cfg.qk_ln:
        q = layer_norm(q, p["q_ln_w"], p["q_ln_b"], 1e-6)
        k = layer_norm(k, p["k_ln_w"], p["k_ln_b"], 1e-6)
    q, k, v = _maybe_rotary(q, k, v, cfg, tl, offset)
    if sp_axis is not None:
        from landiff_tpu.parallel.ring_attention import ring_attention_local

        ring_impl = ("pallas" if attn_impl in ("auto", "pallas")
                     and jax.default_backend() == "tpu" else "xla")
        attn = ring_attention_local(q, k, v, sp_axis, impl=ring_impl)
    else:
        attn = attention(q, k, v, impl=attn_impl)
    attn = attn.reshape(B, S, Hl * Dk)
    wo = p["attn_out_w"]
    if isinstance(wo, dict):
        # per-token activation scales are LOCAL to this shard's features;
        # the per-output weight scale applies uniformly and commutes with
        # the psum, so partial products sum exactly like the bf16 path
        attn = _w8a8_matmul(attn, wo["q"].reshape(Hl * Dk, D), wo["s"])
    else:
        attn = attn @ wo.reshape(Hl * Dk, D).astype(dt)
    attn = jax.lax.psum(attn, axis) + p["attn_out_b"].astype(dt)
    x = x + sel(t_gate_msa, gate_msa) * attn

    h = layer_norm(x, p["ln2_w"], p["ln2_b"], 1e-6)
    h = h * (1.0 + sel(t_scale_mlp, scale_mlp)) + sel(t_shift_mlp, shift_mlp)
    h = jax.nn.gelu(_linear(p, "mlp0", h), approximate=True)
    w1 = p["mlp1_w"]
    if isinstance(w1, dict):
        h = _w8a8_matmul(h, w1["q"], w1["s"])
    else:
        h = h @ w1.astype(dt)
    h = jax.lax.psum(h, axis) + p["mlp1_b"].astype(dt)
    x = x + sel(t_gate_mlp, gate_mlp) * h
    return x


def _layer_sp(p, x, emb, cfg: DiTConfig, attn_impl, axis: str, offset):
    """Sequence-parallel variant of `_layer`, run INSIDE shard_map: the
    hidden stream x holds this shard's LOCAL tokens ([offset, offset +
    S_local) of the [text|video] sequence, sharded over the `time` mesh
    axis); layer weights are REPLICATED. Every op is per-token except
    attention, which runs as ring attention (parallel/ring_attention.py:
    K/V shards rotate via ppermute, lse-merged) — so a layer costs the
    same FLOPs as the unsharded one at 1/n tokens with NO per-layer
    all-reduce (vs _layer_tp's 2 psums/layer); the ppermute traffic
    overlaps the per-hop attention compute.

    This is the DiT scaling mode the head count can't cap: tp over heads
    stops at 30 (padded 32), while S = 17776 splits over 8/16/32 chips
    exactly. int8 (W8A8) layer params from dit.quantize_int8 work
    unchanged — per-token activation scales are local rows. Inference ring
    hops follow the single-chip int8-scores default (ring_attention_diff's
    PRIMAL path, opt-out LANDIFF_ATTN_INT8=0); only the DIFFERENTIATED
    (training) ring pins exact-f32 hops."""
    B, S, D = x.shape
    tl = cfg.text_length
    H, Dk = cfg.num_heads, cfg.head_dim
    dt = x.dtype

    from landiff_tpu.parallel.ring_attention import ring_attention_local

    ring_impl = ("pallas" if attn_impl in ("auto", "pallas")
                 and jax.default_backend() == "tpu" else "xla")

    sel, (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
          t_shift_msa, t_scale_msa, t_gate_msa, t_shift_mlp, t_scale_mlp,
          t_gate_mlp) = _adaln_sel(p, emb, S, tl, dt, offset=offset)

    h = layer_norm(x, p["ln1_w"], p["ln1_b"], 1e-6)
    h = h * (1.0 + sel(t_scale_msa, scale_msa)) + sel(t_shift_msa, shift_msa)

    qkv = _linear(p, "qkv", h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, Dk)
    k = k.reshape(B, S, H, Dk)
    v = v.reshape(B, S, H, Dk)
    if cfg.qk_ln:
        q = layer_norm(q, p["q_ln_w"], p["q_ln_b"], 1e-6)
        k = layer_norm(k, p["k_ln_w"], p["k_ln_b"], 1e-6)
    q, k, v = _maybe_rotary(q, k, v, cfg, tl, offset)
    attn = ring_attention_local(q, k, v, axis, impl=ring_impl)
    attn = _linear(p, "attn_out", attn.reshape(B, S, D))
    x = x + sel(t_gate_msa, gate_msa) * attn

    h = layer_norm(x, p["ln2_w"], p["ln2_b"], 1e-6)
    h = h * (1.0 + sel(t_scale_mlp, scale_mlp)) + sel(t_shift_mlp, shift_mlp)
    h = jax.nn.gelu(_linear(p, "mlp0", h), approximate=True)
    h = _linear(p, "mlp1", h)
    x = x + sel(t_gate_mlp, gate_mlp) * h
    return x


def _embed_inputs(params, x, timesteps, context, cfg: DiTConfig,
                  compute_dtype):
    """patchify + text proj + pos table; time embedding MLP."""
    B, T, C, Hh, Ww = x.shape
    dt = compute_dtype
    P = cfg.patch_size
    xi = x.astype(dt).transpose(0, 1, 3, 4, 2).reshape(B * T, Hh, Ww, C)
    emb = jax.lax.conv_general_dilated(
        xi, params["patch_w"].astype(dt), (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    emb = emb + params["patch_b"].astype(dt)
    n = (Hh // P) * (Ww // P)
    emb = emb.reshape(B, T * n, cfg.hidden_size)
    text = _linear(params, "text_proj", context.astype(dt))
    h = jnp.concatenate([text, emb], axis=1)
    if cfg.pos_embed != "rotary3d":
        pos = jnp.asarray(pos_embed_table(cfg), dt)
        h = h + pos[None, : h.shape[1]]
    # rotary3d: NO additive table — the reference mixin's
    # position_embedding_forward returns None unconditionally
    # (dit_video_concat.py:349-350); its learnable zeros `pos_embedding`
    # parameter (:336-341) exists in checkpoints but is never added, a
    # quirk we reproduce (see init)

    t_emb = timestep_embedding(timesteps, cfg.hidden_size, dtype=dt)
    e = _linear(params["time_mlp"], "fc0", t_emb)
    e = _linear(params["time_mlp"], "fc1", jax.nn.silu(e))
    return h, e


def _remat_policy():
    """Remat policy for the per-layer checkpoint. LANDIFF_REMAT_SAVE_ATTN=1
    saves the flash kernel's out/lse (tagged in ops/attention.
    _flash_diff_fwd, ~71 MB/layer) so the backward recomputes only the
    cheap projections, not the attention kernel (~45 ms/layer at
    production shapes). Costs ~3.2 GB of residuals over 45 layers: OOMs a
    single 16 GB v5e at full shapes (measured: 19.2 GB needed), but is
    the right default once DP/ZeRO sharding shrinks per-chip state —
    multi-chip training enables it in training/train.py."""
    import os

    if os.environ.get("LANDIFF_REMAT_SAVE_ATTN") == "1":
        return jax.checkpoint_policies.save_only_these_names(
            "flash_out", "flash_lse")
    return None


def forward(params, x, timesteps, context, cfg: DiTConfig, *,
            control_outputs=None, attn_impl="auto",
            compute_dtype=jnp.bfloat16, remat=False):
    """Main DiT forward.

    Args:
      x: (B, T, C, H, W) noisy latents (the denoiser applies c_in=1).
      timesteps: (B,) DDPM timestep indices (c_noise).
      context: (B, text_length, 4096) T5 features.
      control_outputs: optional list of (B, S, D) tensors added to the full
        hidden sequence after layers 0..len-1.
    Returns: (B, T, C_out, H, W) v-prediction.
    """
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    layer_fn = _layer
    if remat:
        # gradient checkpointing per layer: a 30L backward at S=17776
        # holds ~full-sequence activations per layer otherwise and OOMs a
        # 16 GB chip; remat trades ~1/3 more FLOPs for O(1-layer) memory.
        # The policy SAVES the flash kernel's out/lse (~71 MB/layer,
        # tagged in ops/attention._flash_diff_fwd) so the backward pass
        # recomputes only the cheap projections, not the attention kernel
        # (~45 ms/layer at production shapes)
        layer_fn = jax.checkpoint(_layer, static_argnums=(3, 4),
                                  policy=_remat_policy())
    for i, p in enumerate(params["layers"]):
        h = layer_fn(p, h, emb, cfg, attn_impl)
        if control_outputs is not None and i < len(control_outputs):
            h = h + control_outputs[i].astype(h.dtype)
    return _final_head(params, h, emb, cfg)


def _final_head(params, h, emb, cfg: DiTConfig):
    """SAT final_layernorm + FinalLayerMixin modulate/linear/unpatchify
    (dit_video_concat.py:392-460)."""
    h = layer_norm(h, params["final_ln_w"], params["final_ln_b"], 1e-6)
    hv = h[:, cfg.text_length:]
    f = params["final"]
    hv = layer_norm(hv, f["norm_w"], f["norm_b"], 1e-6)
    mods = _linear(f, "adaln", jax.nn.silu(emb))
    shift, scale = jnp.split(mods, 2, axis=-1)
    hv = _modulate(hv, shift, scale)
    hv = _linear(f, "linear", hv)
    # unpatchify (dit_video_concat.py:392-410)
    B = hv.shape[0]
    P = cfg.patch_size
    hh = cfg.latent_height // P
    ww = cfg.latent_width // P
    out = hv.reshape(B, cfg.latent_frames, hh, ww, cfg.out_channels, P, P)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
        B, cfg.latent_frames, cfg.out_channels, hh * P, ww * P)
    return out


def control_forward(params, x, timesteps, context, cfg: DiTConfig,
                    semantic_feature, *, attn_impl="auto",
                    compute_dtype=jnp.bfloat16, remat=False):
    """Control branch: x + semantic_feature, run control layers, each layer's
    stream passes through its zero-init linear; returns list of layer
    outputs (full [text|video] sequences)."""
    x = x.astype(compute_dtype) + semantic_feature.astype(compute_dtype)
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    layer_fn = (jax.checkpoint(_layer, static_argnums=(3, 4),
                               policy=_remat_policy()) if remat
                else _layer)
    outs = []
    for p in params["layers"]:
        h = layer_fn(p, h, emb, cfg, attn_impl)
        h = h @ p["zero_linear_w"].astype(h.dtype)  # bias-free (1210-1218)
        outs.append(h)
    return outs


def control_warp_forward(main_params, control_params, x, timesteps, context,
                         cfg: DiTConfig, semantic_feature, *,
                         attn_impl="auto", compute_dtype=jnp.bfloat16,
                         remat=False):
    """ControlDiffWarp.forward (dit_video_concat.py:1196-1200)."""
    import dataclasses

    ctrl_cfg = dataclasses.replace(cfg, num_layers=cfg.control_layers)
    ctrl = control_forward(control_params, x, timesteps, context, ctrl_cfg,
                           semantic_feature, attn_impl=attn_impl,
                           compute_dtype=compute_dtype, remat=remat)
    return forward(main_params, x, timesteps, context, cfg,
                   control_outputs=ctrl, attn_impl=attn_impl,
                   compute_dtype=compute_dtype, remat=remat)


# ---------------------------------------------------------------------------
# tensor-parallel forwards (run INSIDE shard_map; params in the tp layout
# produced by parallel/tp_infer.prep_dit_tp — see _layer_tp). Replaces the
# reference's SAT mpu model-parallel groups (arguments.py:215-299) with
# explicit per-shard compute + psum collectives over the `model` mesh axis.


def _sp_slice(h, sp_axis):
    """(local token count, global offset, sliced h) for an sp_axis shard."""
    S = h.shape[1]
    n = jax.lax.axis_size(sp_axis)
    assert S % n == 0, (S, n)
    s_loc = S // n
    offset = jax.lax.axis_index(sp_axis) * s_loc
    return offset, jax.lax.dynamic_slice_in_dim(h, offset, s_loc, 1)


def forward_tp(params, x, timesteps, context, cfg: DiTConfig, *, axis: str,
               control_outputs=None, attn_impl="auto",
               compute_dtype=jnp.bfloat16, sp_axis=None):
    """Main DiT forward with TP-local transformer layers. Embeddings and
    the final head are replicated compute (tiny next to the blocks).
    sp_axis: optional 2-D hybrid — tokens additionally sharded over this
    mesh axis with ring attention (see _layer_tp)."""
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    offset = 0
    if sp_axis is not None:
        offset, h = _sp_slice(h, sp_axis)
    for i, p in enumerate(params["layers"]):
        h = _layer_tp(p, h, emb, cfg, attn_impl, axis, sp_axis, offset)
        if control_outputs is not None and i < len(control_outputs):
            h = h + control_outputs[i].astype(h.dtype)
    if sp_axis is not None:
        h = jax.lax.all_gather(h, sp_axis, axis=1, tiled=True)
    return _final_head(params, h, emb, cfg)


def control_forward_tp(params, x, timesteps, context, cfg: DiTConfig,
                       semantic_feature, *, axis: str, attn_impl="auto",
                       compute_dtype=jnp.bfloat16, sp_axis=None):
    """TP control branch; zero_linear stays replicated (D x D per layer —
    small, and its output feeds the replicated main stream). Under a 2-D
    hybrid the taps stay sp-LOCAL (the main stream shares the token
    sharding — no gather)."""
    x = x.astype(compute_dtype) + semantic_feature.astype(compute_dtype)
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    offset = 0
    if sp_axis is not None:
        offset, h = _sp_slice(h, sp_axis)
    outs = []
    for p in params["layers"]:
        h = _layer_tp(p, h, emb, cfg, attn_impl, axis, sp_axis, offset)
        h = h @ p["zero_linear_w"].astype(h.dtype)
        outs.append(h)
    return outs


def control_warp_forward_tp(main_params, control_params, x, timesteps,
                            context, cfg: DiTConfig, semantic_feature, *,
                            axis: str, attn_impl="auto",
                            compute_dtype=jnp.bfloat16, sp_axis=None):
    """ControlDiffWarp.forward under TP (dit_video_concat.py:1196-1200),
    optionally 2-D hybrid (x sp_axis token sharding)."""
    import dataclasses

    ctrl_cfg = dataclasses.replace(cfg, num_layers=cfg.control_layers)
    ctrl = control_forward_tp(control_params, x, timesteps, context,
                              ctrl_cfg, semantic_feature, axis=axis,
                              attn_impl=attn_impl,
                              compute_dtype=compute_dtype, sp_axis=sp_axis)
    return forward_tp(main_params, x, timesteps, context, cfg,
                      control_outputs=ctrl, axis=axis, attn_impl=attn_impl,
                      compute_dtype=compute_dtype, sp_axis=sp_axis)


# ---------------------------------------------------------------------------
# sequence-parallel forwards (run INSIDE shard_map over the `time` mesh
# axis; weights REPLICATED, tokens sharded, attention as ring attention —
# see _layer_sp). The reference has no sequence-parallel DiT at all (its CP
# covers only the VAE, cp_enc_dec.py); this is the TPU scaling mode for
# chip counts past the head count and for long-video sequences.


def forward_sp(params, x, timesteps, context, cfg: DiTConfig, *, axis: str,
               control_outputs=None, attn_impl="auto",
               compute_dtype=jnp.bfloat16, remat=False):
    """Main DiT forward, sequence-parallel. Embeddings run replicated on
    the full sequence (one patchify conv + text proj — tiny next to the
    blocks), each shard then slices its token range; the final head runs
    on the all-gathered sequence (one (B, S, D) gather per forward).
    control_outputs are LOCAL shards (control_forward_sp output).
    remat: per-layer gradient checkpointing for the SP TRAINING path
    (training/diffusion_loss.make_train_step_sp) — residuals shrink to
    the 1/n_time local token shard."""
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    offset, h = _sp_slice(h, axis)
    layer_fn = (jax.checkpoint(_layer_sp, static_argnums=(3, 4, 5))
                if remat else _layer_sp)
    for i, p in enumerate(params["layers"]):
        h = layer_fn(p, h, emb, cfg, attn_impl, axis, offset)
        if control_outputs is not None and i < len(control_outputs):
            h = h + control_outputs[i].astype(h.dtype)
    h = jax.lax.all_gather(h, axis, axis=1, tiled=True)
    return _final_head(params, h, emb, cfg)


def control_forward_sp(params, x, timesteps, context, cfg: DiTConfig,
                       semantic_feature, *, axis: str, attn_impl="auto",
                       compute_dtype=jnp.bfloat16, remat=False):
    """SP control branch: returns LOCAL (B, S_local, D) zero-linear taps —
    the main stream adds them shard-locally (same token sharding), so the
    control path needs no gather at all."""
    x = x.astype(compute_dtype) + semantic_feature.astype(compute_dtype)
    h, emb = _embed_inputs(params, x, timesteps, context, cfg, compute_dtype)
    offset, h = _sp_slice(h, axis)
    layer_fn = (jax.checkpoint(_layer_sp, static_argnums=(3, 4, 5))
                if remat else _layer_sp)
    outs = []
    for p in params["layers"]:
        h = layer_fn(p, h, emb, cfg, attn_impl, axis, offset)
        outs.append(h @ p["zero_linear_w"].astype(h.dtype))
    return outs


def control_warp_forward_sp(main_params, control_params, x, timesteps,
                            context, cfg: DiTConfig, semantic_feature, *,
                            axis: str, attn_impl="auto",
                            compute_dtype=jnp.bfloat16, remat=False):
    """ControlDiffWarp.forward under sequence parallelism."""
    import dataclasses

    ctrl_cfg = dataclasses.replace(cfg, num_layers=cfg.control_layers)
    ctrl = control_forward_sp(control_params, x, timesteps, context,
                              ctrl_cfg, semantic_feature, axis=axis,
                              attn_impl=attn_impl,
                              compute_dtype=compute_dtype, remat=remat)
    return forward_sp(main_params, x, timesteps, context, cfg,
                      control_outputs=ctrl, axis=axis, attn_impl=attn_impl,
                      compute_dtype=compute_dtype, remat=remat)


def control_mlp_adapter_forward(params, x, context, cfg: DiTConfig, *,
                                compute_dtype=jnp.bfloat16):
    """ControlMLPAdapter (dit_video_concat.py:1030-1161): the lighter
    control alternative — patch embed + per-layer (LN -> D->2D -> SiLU ->
    2D->D) residual adapters, each tapped through a zero-init linear.
    Note the reference computes the semantic feature but does not add it to
    x in this adapter (literal parity); x is patch-embedded directly."""
    dt = compute_dtype
    B, T, C, Hh, Ww = x.shape
    P = cfg.patch_size
    xi = x.astype(dt).transpose(0, 1, 3, 4, 2).reshape(B * T, Hh, Ww, C)
    emb = jax.lax.conv_general_dilated(
        xi, params["patch_w"].astype(dt), (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["patch_b"].astype(dt)
    n = (Hh // P) * (Ww // P)
    hidden = emb.reshape(B, T * n, cfg.hidden_size)
    text = _linear(params, "text_proj", context.astype(dt))
    hidden = jnp.concatenate([text, hidden], axis=1)
    outs = []
    for p in params["adapters"]:
        h = layer_norm(hidden, p["ln_w"], p["ln_b"], 1e-5)
        h = jax.nn.silu(_linear(p, "fc0", h))
        hidden = hidden + _linear(p, "fc1", h)
        outs.append(hidden @ p["zero_linear_w"].astype(dt))
    return outs


def init_mlp_adapter(key, cfg: DiTConfig, dtype=jnp.float32):
    D = cfg.hidden_size
    P = cfg.patch_size
    ks = iter(jax.random.split(key, cfg.control_layers + 4))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    adapters = []
    for _ in range(cfg.control_layers):
        k = next(ks)
        k1, k2 = jax.random.split(k)
        adapters.append({
            "ln_w": jnp.ones((D,), dtype), "ln_b": jnp.zeros((D,), dtype),
            "fc0_w": nrm(k1, (D, 2 * D)), "fc0_b": jnp.zeros((2 * D,), dtype),
            "fc1_w": nrm(k2, (2 * D, D)), "fc1_b": jnp.zeros((D,), dtype),
            "zero_linear_w": jnp.zeros((D, D), dtype),
        })
    return {
        "patch_w": nrm(next(ks), (P, P, cfg.in_channels, D)),
        "patch_b": jnp.zeros((D,), dtype),
        "text_proj_w": nrm(next(ks), (cfg.text_dim, D)),
        "text_proj_b": jnp.zeros((D,), dtype),
        "adapters": adapters,
    }


# ---------------------------------------------------------------------------
# init


def _init_layer(key, cfg: DiTConfig, control: bool, dtype):
    D = cfg.hidden_size
    TE = cfg.time_embed_dim
    Dk = cfg.head_dim
    M = D * 4
    ks = iter(jax.random.split(key, 8))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    p = {
        # adaLN zero-init (reinit, dit_video_concat.py:633-636)
        "adaln_w": jnp.zeros((TE, 12 * D), dtype),
        "adaln_b": jnp.zeros((12 * D,), dtype),
        "ln1_w": jnp.ones((D,), dtype), "ln1_b": jnp.zeros((D,), dtype),
        "qkv_w": nrm(next(ks), (D, 3 * D)), "qkv_b": jnp.zeros((3 * D,), dtype),
        "attn_out_w": nrm(next(ks), (D, D)),
        "attn_out_b": jnp.zeros((D,), dtype),
        "ln2_w": jnp.ones((D,), dtype), "ln2_b": jnp.zeros((D,), dtype),
        "mlp0_w": nrm(next(ks), (D, M)), "mlp0_b": jnp.zeros((M,), dtype),
        "mlp1_w": nrm(next(ks), (M, D)), "mlp1_b": jnp.zeros((D,), dtype),
    }
    if cfg.qk_ln:
        p.update({"q_ln_w": jnp.ones((Dk,), dtype),
                  "q_ln_b": jnp.zeros((Dk,), dtype),
                  "k_ln_w": jnp.ones((Dk,), dtype),
                  "k_ln_b": jnp.zeros((Dk,), dtype)})
    if control:
        p["zero_linear_w"] = jnp.zeros((D, D), dtype)
    return p


def init(key, cfg: DiTConfig, *, control: bool = False, dtype=jnp.float32):
    D = cfg.hidden_size
    TE = cfg.time_embed_dim
    P = cfg.patch_size
    n_layers = cfg.control_layers if control else cfg.num_layers
    ks = iter(jax.random.split(key, n_layers + 8))
    nrm = lambda k, s, std=0.02: (jax.random.normal(k, s) * std).astype(dtype)
    return {
        "patch_w": nrm(next(ks), (P, P, cfg.in_channels, D)),
        "patch_b": jnp.zeros((D,), dtype),
        "text_proj_w": nrm(next(ks), (cfg.text_dim, D)),
        "text_proj_b": jnp.zeros((D,), dtype),
        "time_mlp": {
            "fc0_w": nrm(next(ks), (D, TE)), "fc0_b": jnp.zeros((TE,), dtype),
            "fc1_w": nrm(next(ks), (TE, TE)), "fc1_b": jnp.zeros((TE,), dtype),
        },
        "layers": [_init_layer(next(ks), cfg, control, dtype)
                   for _ in range(n_layers)],
        # rotary3d + learnable_pos_embed: the reference creates a zeros
        # (1, S, D) nn.Parameter (dit_video_concat.py:336-341) that its
        # position_embedding_forward never adds (:349-350) — a DEAD
        # checkpoint key; created here only so converted checkpoints map
        # 1:1, never read by any forward
        **({"pos_embedding": jnp.zeros(
            (1, cfg.text_length + cfg.latent_frames
             * (cfg.latent_height // P) * (cfg.latent_width // P), D),
            dtype)}
           if cfg.pos_embed == "rotary3d" and cfg.learnable_pos_embed
           else {}),
        "final_ln_w": jnp.ones((D,), dtype),
        "final_ln_b": jnp.zeros((D,), dtype),
        # the control net has EmptyFinalLayerMixin (dit_video_concat.py:
        # 1241-1372) — no final head params exist in its checkpoint and
        # control_forward never runs _final_head, so don't create dead ones
        **({} if control else {"final": {
            "norm_w": jnp.ones((D,), dtype), "norm_b": jnp.zeros((D,), dtype),
            "adaln_w": jnp.zeros((TE, 2 * D), dtype),
            "adaln_b": jnp.zeros((2 * D,), dtype),
            "linear_w": nrm(next(ks), (D, P * P * cfg.out_channels)),
            "linear_b": jnp.zeros((P * P * cfg.out_channels,), dtype),
        }}),
    }
