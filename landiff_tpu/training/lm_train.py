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
