"""Stage-1 LM training: teacher-forcing forward + masked cross-entropy.

The reference ships inference-only stage-1 code — `forward_packing` raises
NotImplementedError (transformer.py:131-132) and the blocks only support
KV-cache decode (transformer_blocks.py:206-219). The training forward here
is designed fresh from the released pieces (SURVEY §2.2): sequence assembly
follows tokenize() (lm_model.py:175-276), the loss follows
CondTransformerBase._losses (transformer.py:134-138, masked cross-entropy),
with the standard next-token shift (logits at i-1 predict the label at i;
loss-masked positions are exactly the tokens appended with loss_mask=True:
SOI, visual codes, EOI, SOP, EOP, EOS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from landiff_tpu.config import LLMConfig
from landiff_tpu.models import gpt, lm
from landiff_tpu.ops.rope import rope_1d_table


def build_training_batch(params, cfg: LLMConfig, text_feats, micro_feats,
                         codes, *, num_frames: int | None = None,
                         compute_dtype=jnp.float32):
    """Assemble one teacher-forcing row.

    Args:
      text_feats: (n_text, D) projected text condition features.
      codes: (num_visual,) ground-truth visual token ids.
    Returns: (features (L, D), labels (L,), loss_mask (L,)).
    """
    if num_frames is None:
        num_frames = cfg.frames_per_segment
    prompt = lm.assemble_prompt(params, cfg, text_feats, micro_feats,
                                compute_dtype)
    sched = lm.build_schedule(cfg, prompt.shape[0], num_frames)
    assert len(codes) == sched.num_visual, (len(codes), sched.num_visual)

    tokens = np.asarray(sched.forced).copy()
    tokens[sched.visual] = np.asarray(codes)
    tokens = jnp.asarray(np.maximum(tokens, 0))
    # features: prompt part from cond embeddings, sampled part from tok_emb
    emb = params["tok_emb"].astype(compute_dtype)[tokens[sched.prefix_len:]]
    features = jnp.concatenate([prompt, emb], axis=0)
    loss_mask = np.zeros(sched.full_len, bool)
    loss_mask[sched.prefix_len:] = True
    # SOI sits at prefix_len-1 inside the prompt with loss_mask=True
    # (lm_model.py:213-215); it is a label for the position before it
    loss_mask[sched.prefix_len - 1] = True
    vocab = lm.Vocab(cfg.codebook_size)
    labels = tokens.at[:sched.prefix_len - 1].set(0)
    labels = labels.at[sched.prefix_len - 1].set(vocab.START_OF_IFRAME)
    return features, labels, jnp.asarray(loss_mask)


def lm_loss(params, cfg: LLMConfig, features, labels, loss_mask,
            compute_dtype=jnp.float32):
    """Masked next-token cross-entropy: logits[i-1] predict labels[i]."""
    L = features.shape[-2]
    cos, sin = rope_1d_table(cfg.rope)
    logits = gpt.forward(params["gpt"], features[None] if features.ndim == 2
                         else features, cfg,
                         jnp.asarray(cos[:L]), jnp.asarray(sin[:L]),
                         attn_impl="xla", compute_dtype=compute_dtype)
    logits = logits.astype(jnp.float32)
    if features.ndim == 2:
        labels = labels[None]
        loss_mask = loss_mask[None]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    shift_mask = loss_mask[:, 1:]
    ce = optax.softmax_cross_entropy_with_integer_labels(
        shift_logits, shift_labels)
    return jnp.sum(ce * shift_mask) / jnp.maximum(jnp.sum(shift_mask), 1)


def lm_cond_loss(params, cfg: LLMConfig, t5_feats, codes, micro_values, *,
                 key=None, cfg_drop_prob: float = 0.0,
                 micro_drop_probs=None, num_frames: int | None = None,
                 compute_dtype=jnp.float32):
    """Teacher-forcing loss with the conditioners INSIDE the gradient:
    text projection MLP, micro-cond MLPs, token embeddings AND the learned
    null embeddings all receive gradients — required for CFG training, where
    the null_text_embedding must be trained via the per-sample conditioning
    dropout (TextCond cfg_drop_prob=0.1, conditioner.py:238-248 +
    llm_cfg.py:60-62; MicroConditioner per-key drop, conditioner.py:77-88,
    117-141).

    Args:
      t5_feats: (B, n_text, t5_dim) raw frozen-T5 features.
      codes: (B, num_visual) ground-truth visual ids.
      micro_values: dict key -> scalar (or (B,) array).
      key: PRNG key enabling training dropout (None = eval, no dropout).
    """
    B, n_text = t5_feats.shape[:2]
    if num_frames is None:
        num_frames = cfg.frames_per_segment
    num_micro = len(cfg.micro_cond_keys)
    prefix_len = 1 + num_micro + n_text + 1
    sched = lm.build_schedule(cfg, prefix_len, num_frames)
    assert codes.shape[1] == sched.num_visual, (codes.shape,
                                                sched.num_visual)
    vocab = lm.Vocab(cfg.codebook_size)
    visual_idx = np.nonzero(np.asarray(sched.visual))[0]
    template = np.maximum(np.asarray(sched.forced), 0)
    tokens = jnp.broadcast_to(jnp.asarray(template), (B, sched.full_len))
    tokens = tokens.at[:, jnp.asarray(visual_idx)].set(codes)
    labels = tokens.at[:, :prefix_len - 1].set(0)
    labels = labels.at[:, prefix_len - 1].set(vocab.START_OF_IFRAME)
    loss_mask = np.zeros(sched.full_len, bool)
    loss_mask[prefix_len - 1:] = True
    loss_mask = jnp.broadcast_to(jnp.asarray(loss_mask),
                                 (B, sched.full_len))

    k_text = k_micro = None
    if key is not None:
        k_text, k_micro = jax.random.split(key)
    text = lm.text_cond_features(params, t5_feats, compute_dtype)
    if k_text is not None and cfg_drop_prob > 0:
        text = lm.text_dropout(params, text, k_text, cfg_drop_prob)
    mic = lm.micro_cond_features_batch(
        params, cfg, micro_values, B, drop_key=k_micro,
        drop_probs=micro_drop_probs, compute_dtype=compute_dtype)
    emb_table = params["tok_emb"].astype(compute_dtype)
    D = emb_table.shape[1]
    bos = jnp.broadcast_to(emb_table[vocab.BOS][None, None], (B, 1, D))
    soi = jnp.broadcast_to(emb_table[vocab.START_OF_IFRAME][None, None],
                           (B, 1, D))
    suffix = emb_table[tokens[:, prefix_len:]]
    features = jnp.concatenate(
        [bos, mic.astype(compute_dtype), text.astype(compute_dtype), soi,
         suffix], axis=1)
    return lm_loss(params, cfg, features, labels, loss_mask, compute_dtype)


def make_cond_train_step(optimizer, cfg: LLMConfig, micro_values, *,
                         cfg_drop_prob: float = 0.1, micro_drop_probs=None,
                         num_frames: int | None = None,
                         compute_dtype=jnp.float32, opt_shardings=None):
    """Gradient-correct stage-1 step: conditioners assembled in-grad, with
    CFG conditioning dropout (the reference's training-capability gap —
    SURVEY §7 step 10). Step signature:
    (params, opt_state, t5_feats, codes, key) -> (params, opt_state, loss).
    """
    def loss_fn(params, t5_feats, codes, key):
        return lm_cond_loss(params, cfg, t5_feats, codes, micro_values,
                            key=key, cfg_drop_prob=cfg_drop_prob,
                            micro_drop_probs=micro_drop_probs,
                            num_frames=num_frames,
                            compute_dtype=compute_dtype)

    jit_kw = ({"out_shardings": (None, opt_shardings, None)}
              if opt_shardings is not None else {})

    @functools.partial(jax.jit, **jit_kw)
    def train_step(params, opt_state, t5_feats, codes, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, t5_feats, codes,
                                                  key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_train_step(optimizer, cfg: LLMConfig, compute_dtype=jnp.float32,
                    opt_shardings=None):
    """opt_shardings: optional ZeRO shardings pytree for the optimizer
    state (training/zero.py) — pinned as jit out_shardings so the updated
    state stays DP-sharded instead of relying on GSPMD propagation."""
    def loss_fn(params, features, labels, loss_mask):
        return lm_loss(params, cfg, features, labels, loss_mask,
                       compute_dtype)

    jit_kw = ({"out_shardings": (None, opt_shardings, None)}
              if opt_shardings is not None else {})

    @functools.partial(jax.jit, **jit_kw)
    def train_step(params, opt_state, features, labels, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, features, labels,
                                                  loss_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
