"""Semantic 1-D LM: vocab, prompt assembly, structural schedule, and the
constrained autoregressive sampling loop — stage 1 of LanDiff.

Reference: landiff/llm/models/lm_model.py. The reference samples with a
~1,244-step *Python* loop doing per-step tensor surgery (lm_model.py:408-508);
here the structural constraints are precomputed into static per-position
arrays (forced-token table + free-position mask) so the whole decode runs as
one `lax.fori_loop` inside jit — the #1 performance lever on TPU.

Vocab (lm_model.py:62-71): visual ids [0, codebook) then specials
EOS, BOS, START_OF_IFrame, END_OF_IFrame, START_OF_PFrame, END_OF_PFrame, PAD.

Sequence layout at inference (tokenize, lm_model.py:175-276):
  [BOS][micro frames][micro motion][text cond ...][SOI] then sampled:
  330 I tokens [EOI] ([SOP] 74 P tokens [EOP]) x (frames-1), per segment,
  [SOI]-per-extra-segment, final [EOS].
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.config import ARSampleConfig, LLMConfig
from landiff_tpu.models import gpt
from landiff_tpu.ops.embeddings import timestep_embedding
from landiff_tpu.ops.rope import rope_1d_table
from landiff_tpu.utils import top_k_filter_logits, top_p_filter_probs


@dataclass(frozen=True)
class Vocab:
    codebook_size: int

    @property
    def EOS(self):
        return self.codebook_size

    @property
    def BOS(self):
        return self.codebook_size + 1

    @property
    def START_OF_IFRAME(self):
        return self.codebook_size + 2

    @property
    def END_OF_IFRAME(self):
        return self.codebook_size + 3

    @property
    def START_OF_PFRAME(self):
        return self.codebook_size + 4

    @property
    def END_OF_PFRAME(self):
        return self.codebook_size + 5

    @property
    def PAD(self):
        return self.codebook_size + 6

    @property
    def size(self):
        return self.codebook_size + 7


def video_frames_to_code_len(cfg: LLMConfig, num_frames: int,
                             segment_length: int | None = None,
                             segment_stride: int | None = None) -> int:
    """Total sampled positions for `num_frames` semantic frames
    (lm_model.py:278-291), incl. structural tokens, excl. the leading SOI."""
    seg_len = segment_length or cfg.frames_per_segment
    seg_stride = segment_stride or cfg.frames_per_segment
    res = 0
    for offset in range(0, num_frames, seg_stride):
        frame_len = min(offset + seg_len, num_frames) - offset
        res += cfg.iframe_len + (frame_len - 1) * cfg.pframe_len
        res += 2 * frame_len  # use_end_of_IFrame and use_end_of_PFrame
    return res


@dataclass(frozen=True)
class SampleSchedule:
    """Static structural schedule for the AR decode (lm_model.py:353-396).

    Arrays of length `full_len`; position i describes the token SAMPLED at i:
      forced[i]  >= 0: token id forced at this position; -1: free (visual)
      visual[i]  True where the sampled token is a visual code to emit
      allow_eos[i] True where EOS may terminate generation (predict_eos mode)
    """

    prefix_len: int
    full_len: int
    forced: np.ndarray
    visual: np.ndarray
    allow_eos: np.ndarray

    @property
    def num_visual(self) -> int:
        return int(self.visual.sum())


def gt_first_frame_prefix_len(cfg: LLMConfig, soi_index: int) -> int:
    """Prompt length when the ground-truth first I-frame is given
    (use_gt_first_frame, lm_model.py:337-343): prompt extends through
    [SOI][330 gt I][EOI][SOP]."""
    return soi_index + cfg.iframe_len + 2 + 1


def build_schedule(cfg: LLMConfig, prefix_len: int, num_frames: int,
                   segment_length: int | None = None,
                   soi_index: int | None = None) -> SampleSchedule:
    """Replicates the index-set construction of lm_model.py:353-396.

    `prefix_len` = first SAMPLED position (index of SOI + 1 normally; deeper
    when the prompt embeds a ground-truth I-frame — pass `soi_index`
    explicitly then)."""
    vocab = Vocab(cfg.codebook_size)
    seg_len = segment_length or cfg.frames_per_segment
    p_num = seg_len - 1
    i_len, p_len = cfg.iframe_len, cfg.pframe_len
    start_of_iframe_index = (prefix_len - 1 if soi_index is None
                             else soi_index)

    full_len = start_of_iframe_index + video_frames_to_code_len(
        cfg, num_frames, seg_len, seg_len) + 1

    forced = np.full(full_len, -1, np.int64)
    visual = np.zeros(full_len, bool)
    allow_eos = np.zeros(full_len, bool)

    visual_block_len = i_len + p_num * p_len + seg_len * 2
    for index in range(start_of_iframe_index, full_len - 1, visual_block_len):
        move = index
        forced[move] = vocab.START_OF_IFRAME
        move += 1
        visual[move:move + i_len] = True
        move += i_len
        forced[move] = vocab.END_OF_IFRAME
        move += 1
        if index > start_of_iframe_index:
            allow_eos[move] = True
        p_end = min(full_len - 1, move - 1 + p_len * p_num + 2 * p_num)
        for j in range(move, p_end, p_len + 2):
            forced[j] = vocab.START_OF_PFRAME
            visual[j + 1:j + 1 + p_len] = True
            forced[j + p_len + 1] = vocab.END_OF_PFRAME
            move = j + p_len + 2
            if index > start_of_iframe_index:
                allow_eos[move] = True
    if forced[full_len - 1] < 0:  # structural sets take precedence
        forced[full_len - 1] = vocab.EOS
    visual[full_len - 1:] = False
    # the prompt's SOI is at start_of_iframe_index and not sampled
    return SampleSchedule(prefix_len=prefix_len, full_len=full_len,
                          forced=forced, visual=visual, allow_eos=allow_eos)


# ---------------------------------------------------------------------------
# Conditioners


def micro_cond_features(params, cfg: LLMConfig, values: dict[str, float],
                        compute_dtype=jnp.bfloat16):
    """MicroConditioner (llm/modules/conditioner.py:17-170): scalar ->
    sinusoid(256) -> per-key MLP(freq->512->SiLU->2048). Keys sorted.
    Returns (num_keys, D)."""
    outs = []
    for key in sorted(cfg.micro_cond_keys):
        p = params["micro"][key]
        v = jnp.asarray([values[key]], jnp.float32)
        emb = timestep_embedding(v, cfg.micro_cond_embed_dim,
                                 dtype=compute_dtype)
        h = jax.nn.silu(emb @ p["fc0_w"].astype(compute_dtype)
                        + p["fc0_b"].astype(compute_dtype))
        out = h @ p["fc1_w"].astype(compute_dtype) + p["fc1_b"].astype(compute_dtype)
        outs.append(out[0])
    return jnp.stack(outs)


def micro_cond_features_batch(params, cfg: LLMConfig, values, batch: int,
                              *, drop_key=None, drop_probs=None,
                              compute_dtype=jnp.bfloat16):
    """Batched MicroConditioner with training-time conditioning dropout
    (conditioner.py:77-88, 117-141): per key, the sinusoid embedding is
    replaced PRE-MLP by the learned null embedding
    (params["micro_null"][key], shape (freq,)) with probability
    drop_probs[key], per sample. Returns (batch, num_keys, D)."""
    drop_probs = drop_probs or {}
    outs = []
    keys = sorted(cfg.micro_cond_keys)
    if drop_key is not None:
        subkeys = dict(zip(keys, jax.random.split(drop_key, len(keys))))
    for key in keys:
        p = params["micro"][key]
        v = jnp.broadcast_to(jnp.asarray(values[key], jnp.float32), (batch,))
        emb = timestep_embedding(v, cfg.micro_cond_embed_dim,
                                 dtype=compute_dtype)          # (B, freq)
        prob = drop_probs.get(key, 0.0)
        if drop_key is not None and prob > 0:
            null = params["micro_null"][key].astype(compute_dtype)
            keep = (jax.random.uniform(subkeys[key], (batch, 1)) > prob)
            emb = jnp.where(keep, emb, null[None])
        h = jax.nn.silu(emb @ p["fc0_w"].astype(compute_dtype)
                        + p["fc0_b"].astype(compute_dtype))
        outs.append(h @ p["fc1_w"].astype(compute_dtype)
                    + p["fc1_b"].astype(compute_dtype))
    return jnp.stack(outs, axis=1)


def text_dropout(params, text_feats, key, drop_prob: float):
    """TextCond training-time CFG dropout (conditioner.py:238-248): with
    probability drop_prob per SAMPLE, the whole projected text feature block
    is replaced by the learned null embedding (which thereby receives
    gradients). text_feats: (B, n_text, D)."""
    if drop_prob <= 0:
        return text_feats
    B = text_feats.shape[0]
    keep = jax.random.uniform(key, (B, 1, 1)) > drop_prob
    null = params["null_text_embedding"].astype(text_feats.dtype)
    return jnp.where(keep, text_feats, null[None, None])


def text_cond_features(params, text_embedding, compute_dtype=jnp.bfloat16):
    """TextCond MLP projection (conditioner.py:173-264): T5 features (S, 4096)
    -> MLP2(gelu-tanh) -> (S, D)."""
    p = params["text_proj"]
    x = text_embedding.astype(compute_dtype)
    h = jax.nn.gelu(x @ p["fc0_w"].astype(compute_dtype)
                    + p["fc0_b"].astype(compute_dtype), approximate=True)
    return h @ p["fc1_w"].astype(compute_dtype) + p["fc1_b"].astype(compute_dtype)


def null_text_features(params, length: int, compute_dtype=jnp.bfloat16):
    """forward_unconditional (conditioner.py:309-323): the learned null
    embedding repeated to the tokenized length (NOT passed through the MLP)."""
    null = params["null_text_embedding"].astype(compute_dtype)
    return jnp.broadcast_to(null[None], (length, null.shape[0]))


def assemble_prompt(params, cfg: LLMConfig, text_feats, micro_feats,
                    compute_dtype=jnp.bfloat16):
    """Build prompt features [BOS][micro x2][text][SOI] -> (prefix_len, D)
    (lm_model.py:201-276, micro_cond_first=True)."""
    vocab = Vocab(cfg.codebook_size)
    embed = params["tok_emb"]
    bos = embed[vocab.BOS][None].astype(compute_dtype)
    soi = embed[vocab.START_OF_IFRAME][None].astype(compute_dtype)
    return jnp.concatenate(
        [bos, micro_feats.astype(compute_dtype),
         text_feats.astype(compute_dtype), soi], axis=0)


def assemble_prompt_with_gt_iframe(params, cfg: LLMConfig, text_feats,
                                   micro_feats, gt_codes,
                                   compute_dtype=jnp.bfloat16):
    """use_gt_first_frame prompt (lm_model.py:337-349): the ground-truth
    first I-frame codes are part of the prompt —
    [BOS][micro x2][text][SOI][gt I x330][EOI][SOP]. Sampling then starts at
    the first P token; callers prepend gt_codes to the sampled output."""
    vocab = Vocab(cfg.codebook_size)
    base = assemble_prompt(params, cfg, text_feats, micro_feats,
                           compute_dtype)
    emb = params["tok_emb"].astype(compute_dtype)
    gt = emb[jnp.asarray(gt_codes, jnp.int32)]
    eoi = emb[vocab.END_OF_IFRAME][None]
    sop = emb[vocab.START_OF_PFRAME][None]
    return jnp.concatenate([base, gt, eoi, sop], axis=0)


# ---------------------------------------------------------------------------
# Constrained AR sampling


@dataclasses.dataclass(frozen=True)
class _SampleStatic:
    """Hashable static bundle for the jitted sampler."""

    cfg: LLMConfig
    prefix_len: int
    full_len: int
    temperature: float
    top_k: int
    top_p: float
    guidance_scale: float


def _combined_logits(logits, st: _SampleStatic):
    """CFG combine + temperature. logits: (rows, V) fp32."""
    if st.guidance_scale > 0 and st.guidance_scale != 1:
        cond, uncond = logits[0], logits[1]
        logits = uncond + st.guidance_scale * (cond - uncond)
    else:
        logits = logits[0]
    return logits / st.temperature


def _sample_token(logits, forced_t, key, st: _SampleStatic):
    """top-k/top-p + structural forcing for one step. logits: (rows, V)
    fp32 (rows=2 iff guidance). Returns scalar token."""
    logits = _combined_logits(logits, st)
    if st.top_k > 0:
        logits = top_k_filter_logits(logits, st.top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    if st.top_p < 1.0:
        probs = top_p_filter_probs(probs, st.top_p)
    sampled = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)))
    return jnp.where(forced_t >= 0, forced_t, sampled)


def _sample_restricted(logits, forced_t, eos_id, key, st: _SampleStatic):
    """Structural positions where EOS may fire sample from the RESTRICTED
    set {forced, EOS} (lm_model.py:448-453 possable_indexes mask)."""
    logits = _combined_logits(logits, st)
    v = logits.shape[-1]
    ids = jnp.arange(v)
    allowed = (ids == forced_t) | (ids == eos_id)
    masked = jnp.where(allowed, logits, -jnp.inf)
    return jax.random.categorical(key, masked)


def sample(params, cfg: LLMConfig, schedule: SampleSchedule, prompt_features,
           sample_cfg: ARSampleConfig, *, rng_key,
           teacher_tokens=None, predict_eos: bool = False,
           compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16):
    """Constrained AR decode (lm_model.py:293-516), fully jitted.

    Args:
      prompt_features: (rows, prefix_len, D) — rows=2 for CFG ([cond, uncond])
        else 1.
      schedule: static structural schedule from build_schedule.
      teacher_tokens: optional (full_len,) ground-truth tokens; when given,
        the fed token is the ground truth (teacher forcing,
        lm_model.py:506-507) while sampled tokens are still recorded.
      predict_eos: allow early termination when EOS is sampled at an
        allowed position (lm_model.py:455-462); codes after the stop are
        dropped.
    Returns: (num_visual,) int32 codes clamped to the visual range (shorter
    if predict_eos fired).
    """
    st = _SampleStatic(
        cfg=cfg, prefix_len=schedule.prefix_len, full_len=schedule.full_len,
        temperature=sample_cfg.temperature, top_k=sample_cfg.top_k,
        top_p=sample_cfg.top_p, guidance_scale=sample_cfg.cfg_scale)
    teacher = (jnp.full((schedule.full_len,), -1, jnp.int32)
               if teacher_tokens is None
               else jnp.asarray(teacher_tokens, jnp.int32))
    tokens, stop_pos = _sample_jit(
        params, prompt_features, jnp.asarray(schedule.forced),
        jnp.asarray(schedule.allow_eos), teacher, rng_key, st,
        predict_eos, compute_dtype, cache_dtype)
    tokens = np.asarray(tokens)
    pos = np.arange(schedule.full_len)
    # visual positions inside the prompt (gt first frame) are not sampled
    keep = schedule.visual & (pos >= schedule.prefix_len) & (pos < int(stop_pos))
    codes = tokens[keep]
    return np.clip(codes, 0, cfg.codebook_size - 1)


def _embed_token(params, tok, rows: int):
    f = params["tok_emb"][tok][None, None]          # (1, 1, D)
    return jnp.broadcast_to(f, (rows, 1, f.shape[-1]))


import functools


@functools.partial(jax.jit, static_argnames=("st", "predict_eos",
                                             "compute_dtype", "cache_dtype"))
def _sample_jit(params, prompt_features, forced, allow_eos, teacher, rng_key,
                st: _SampleStatic, predict_eos, compute_dtype, cache_dtype):
    cfg = st.cfg
    vocab = Vocab(cfg.codebook_size)
    rows = prompt_features.shape[0]
    cos_t, sin_t = rope_1d_table(cfg.rope)
    cos = jnp.asarray(cos_t[: st.full_len])
    sin = jnp.asarray(sin_t[: st.full_len])

    cache = gpt.KVCache.create(cfg, rows, st.full_len, cache_dtype)
    logits, cache = gpt.prefill(
        params["gpt"], prompt_features, cache, cfg,
        cos[: st.prefix_len], sin[: st.prefix_len],
        compute_dtype=compute_dtype)

    out0 = jnp.zeros((st.full_len,), jnp.int32)
    stop0 = jnp.asarray(st.full_len, jnp.int32)

    def body(carry):
        i, logits, cache, key, out, stop = carry
        key, sub = jax.random.split(key)
        sampled = _sample_token(logits, forced[i], sub, st).astype(jnp.int32)
        if predict_eos:
            # at eos-allowed structural positions, draw from {forced, EOS}
            restricted = _sample_restricted(
                logits, forced[i], vocab.EOS, sub, st).astype(jnp.int32)
            hit_eos = allow_eos[i] & (restricted == vocab.EOS)
            sampled = jnp.where(allow_eos[i] & (forced[i] >= 0), restricted,
                                sampled)
            stop = jnp.where(hit_eos, jnp.minimum(stop, i), stop)
        out = out.at[i].set(sampled)
        fed = jnp.where(teacher[i] >= 0, teacher[i], sampled)
        feat = _embed_token(params, fed, rows).astype(compute_dtype)
        logits, cache = gpt.decode_step(
            params["gpt"], feat, cache, i, cfg,
            jax.lax.dynamic_slice_in_dim(cos, i, 1),
            jax.lax.dynamic_slice_in_dim(sin, i, 1),
            compute_dtype=compute_dtype)
        return i + 1, logits, cache, key, out, stop

    def cond(carry):
        i = carry[0]
        stop = carry[5]
        return (i < st.full_len) & (i <= stop)

    _, _, _, _, out, stop = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(st.prefix_len, jnp.int32), logits, cache, rng_key,
         out0, stop0))
    return out, stop


# ---------------------------------------------------------------------------
# Batched multi-prompt sampling (serving throughput)
#
# Decode at rows<=2 is weights-bandwidth/MXU-occupancy bound (PARITY.md):
# each step streams the full 2 GB of GPT weights for 2 gemv rows. Batching N
# prompts into one decode amortizes the weight reads N-fold — the remaining
# single-chip stage-1 lever. Design: prompts are RIGHT-ALIGNED (left
# zero-pad to the batch max prefix length, per-row `pad` offsets shift the
# rope positions and mask padded slots out of attention), so every row
# shares ONE structural schedule and the whole batch runs in the same
# jitted while_loop as the single-prompt path. Per-prompt PRNG streams are
# vmapped, making the batched draw bit-identical to N single runs with the
# same seeds (tests/test_lm_batch.py).


def sample_batch(params, cfg: LLMConfig, schedule: SampleSchedule,
                 prompt_features, pad, sample_cfg: ARSampleConfig, *,
                 rng_keys, predict_eos: bool = False,
                 compute_dtype=jnp.bfloat16, cache_dtype=jnp.bfloat16):
    """Constrained AR decode for N prompts at once.

    Args:
      prompt_features: (R, P, D) right-aligned prompt rows; R = 2N with CFG
        ([cond_0, uncond_0, cond_1, uncond_1, ...]) else N. P = max prompt
        length in the batch.
      pad: (R,) int32 left-pad length per row (P - true_prefix_len).
      schedule: shared schedule built with prefix_len = P (right alignment
        puts every row's SOI at buffer index P-1, so the structural tables
        are batch-invariant).
      rng_keys: (N,) stacked PRNG keys, one stream per prompt —
        PRNGKey(seed_n); a prompt's draw sequence matches the single-prompt
        sampler exactly.
    Returns: list of N (num_visual_n,) int32 code arrays (shorter per
    prompt if predict_eos fired).
    """
    st = _SampleStatic(
        cfg=cfg, prefix_len=schedule.prefix_len, full_len=schedule.full_len,
        temperature=sample_cfg.temperature, top_k=sample_cfg.top_k,
        top_p=sample_cfg.top_p, guidance_scale=sample_cfg.cfg_scale)
    tokens, stops = _sample_jit_batch(
        params, prompt_features, jnp.asarray(pad, jnp.int32),
        jnp.asarray(schedule.forced), jnp.asarray(schedule.allow_eos),
        rng_keys, st, predict_eos, compute_dtype, cache_dtype)
    tokens = np.asarray(tokens)              # (N, full_len)
    stops = np.asarray(stops)
    pos = np.arange(schedule.full_len)
    out = []
    for n in range(tokens.shape[0]):
        keep = (schedule.visual & (pos >= schedule.prefix_len)
                & (pos < int(stops[n])))
        out.append(np.clip(tokens[n][keep], 0, cfg.codebook_size - 1))
    return out


def _draw_one(logits, forced_t, eos_id, key, st: _SampleStatic,
              allow_eos_t, predict_eos: bool):
    """Per-prompt draw on combined (V,) logits — vmapped over the batch;
    op-for-op identical to the single-prompt _sample_token/_sample_restricted
    sequence so per-key results match bit-exactly."""
    x = logits
    if st.top_k > 0:
        x = top_k_filter_logits(x, st.top_k)
    probs = jax.nn.softmax(x, axis=-1)
    if st.top_p < 1.0:
        probs = top_p_filter_probs(probs, st.top_p)
    sampled = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)))
    sampled = jnp.where(forced_t >= 0, forced_t, sampled).astype(jnp.int32)
    hit_eos = jnp.asarray(False)
    if predict_eos:
        ids = jnp.arange(logits.shape[-1])
        allowed = (ids == forced_t) | (ids == eos_id)
        restricted = jax.random.categorical(
            key, jnp.where(allowed, logits, -jnp.inf)).astype(jnp.int32)
        hit_eos = allow_eos_t & (restricted == eos_id)
        sampled = jnp.where(allow_eos_t & (forced_t >= 0), restricted,
                            sampled)
    return sampled, hit_eos


@functools.partial(jax.jit, static_argnames=("st", "predict_eos",
                                             "compute_dtype", "cache_dtype"))
def _sample_jit_batch(params, prompt_features, pad, forced, allow_eos,
                      rng_keys, st: _SampleStatic, predict_eos,
                      compute_dtype, cache_dtype):
    cfg = st.cfg
    vocab = Vocab(cfg.codebook_size)
    rows = prompt_features.shape[0]
    with_guidance = st.guidance_scale > 0 and st.guidance_scale != 1
    rows_per = 2 if with_guidance else 1
    n_prompts = rows // rows_per
    cos_t, sin_t = rope_1d_table(cfg.rope)
    cos = jnp.asarray(cos_t[: st.full_len])
    sin = jnp.asarray(sin_t[: st.full_len])

    # per-row rope angles shifted by the left pad: buffer index j is the
    # row's logical position j - pad (padded slots clip to 0; masked anyway)
    ppos = jnp.maximum(
        jnp.arange(st.prefix_len)[None, :] - pad[:, None], 0)
    cache = gpt.KVCache.create(cfg, rows, st.full_len, cache_dtype)
    logits, cache = gpt.prefill(
        params["gpt"], prompt_features, cache, cfg,
        cos[ppos], sin[ppos], compute_dtype=compute_dtype, pad=pad)

    out0 = jnp.zeros((n_prompts, st.full_len), jnp.int32)
    stop0 = jnp.full((n_prompts,), st.full_len, jnp.int32)
    emb = params["tok_emb"]

    def body(carry):
        i, logits, cache, keys, out, stop = carry
        split = jax.vmap(jax.random.split)(keys)       # (N, 2, key)
        keys, subs = split[:, 0], split[:, 1]
        comb = logits.reshape(n_prompts, rows_per, -1)
        if with_guidance:
            comb = comb[:, 1] + st.guidance_scale * (comb[:, 0] - comb[:, 1])
        else:
            comb = comb[:, 0]
        comb = comb / st.temperature
        draw = lambda lg, k: _draw_one(lg, forced[i], vocab.EOS, k, st,
                                       allow_eos[i], predict_eos)
        sampled, hit_eos = jax.vmap(draw)(comb, subs)
        stop = jnp.where(hit_eos, jnp.minimum(stop, i), stop)
        out = out.at[:, i].set(sampled)
        feat = emb[sampled][:, None]                   # (N, 1, D)
        feat = jnp.repeat(feat, rows_per, axis=0)      # (R, 1, D)
        dpos = jnp.maximum(i - pad, 0)[:, None]        # (R, 1)
        logits, cache = gpt.decode_step(
            params["gpt"], feat.astype(compute_dtype), cache, i, cfg,
            cos[dpos], sin[dpos], compute_dtype=compute_dtype, pad=pad)
        return i + 1, logits, cache, keys, out, stop

    def cond(carry):
        i = carry[0]
        stop = carry[5]
        return (i < st.full_len) & (i <= jnp.max(stop))

    _, _, _, _, out, stop = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(st.prefix_len, jnp.int32), logits, cache, rng_keys,
         out0, stop0))
    return out, stop


# ---------------------------------------------------------------------------
# init


def init(key, cfg: LLMConfig, t5_dim: int = 4096, dtype=jnp.float32,
         micro_drop_probs: dict[str, float] | None = None):
    """micro_drop_probs: keys with prob > 0 get a learned null embedding
    (randn(freq)/sqrt(freq), conditioner.py:58-68) used by the training-time
    per-key conditioning dropout. The released inference checkpoints have
    none (drop_probs unset in llm_cfg.py), so these params are optional."""
    import math

    D = cfg.hidden_size
    keys = iter(jax.random.split(key, 18 + len(cfg.micro_cond_keys)))
    tn = lambda k, shape: (jax.random.truncated_normal(k, -2, 2, shape)
                           * math.sqrt(2 / shape[0])).astype(dtype)
    micro = {}
    for name in sorted(cfg.micro_cond_keys):
        micro[name] = {
            "fc0_w": (jax.random.normal(next(keys),
                                        (cfg.micro_cond_embed_dim, 512))
                      * 0.02).astype(dtype),
            "fc0_b": jnp.zeros((512,), dtype),
            # reference zero-inits the output linear (conditioner.py:85-89)
            "fc1_w": jnp.zeros((512, D), dtype),
            "fc1_b": jnp.zeros((D,), dtype),
        }
    out = {
        "gpt": gpt.init(next(keys), cfg, dtype),
        "tok_emb": (jax.random.normal(next(keys), (cfg.vocab_size, D))
                    * 0.02).astype(dtype),
        "text_proj": {
            "fc0_w": tn(next(keys), (t5_dim, D)),
            "fc0_b": jnp.zeros((D,), dtype),
            "fc1_w": tn(next(keys), (D, D)),
            "fc1_b": jnp.zeros((D,), dtype),
        },
        "null_text_embedding": (jax.random.normal(next(keys), (D,))
                                / D ** 0.5).astype(dtype),
        "micro": micro,
    }
    micro_null = {}
    for name in sorted(cfg.micro_cond_keys):
        if micro_drop_probs and micro_drop_probs.get(name, 0.0) > 0:
            F = cfg.micro_cond_embed_dim
            micro_null[name] = (jax.random.normal(next(keys), (F,))
                                / F ** 0.5).astype(dtype)
    if micro_null:
        out["micro_null"] = micro_null
    return out
