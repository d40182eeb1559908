"""GeneralConditioner: the reference's multi-embedder conditioning engine
(sgm/modules/encoders/modules.py:62-243), functional-JAX.

The shipped LanDiff config uses exactly one embedder (FrozenT5Embedder ->
"crossattn"), which pipeline/dif_infer.py implements as a hardcoded fast
path. Stage-2 TRAINING with extra conditionings (fps / motion vectors /
image concat etc.) needs the general machinery, reproduced here:

- embedders declared as `EmbedderSpec`s over plain pytree params;
- outputs routed by rank — 2-D "vector", 3-D "crossattn", 4/5-D "concat"
  (OUTPUT_DIM2KEYS, modules.py:63) — and concatenated per key along
  KEY2CATDIM (vector: feature axis 1, crossattn: token-feature axis 2,
  concat: channel axis 1);
- per-embedder `ucg_rate` dropout: output rows zeroed per sample
  (modules.py:150-166), or for `legacy_ucg_val` embedders the INPUT batch
  value replaced before the embedder runs (possibly_get_ucg_val,
  modules.py:107-115);
- correlated dropout `cor_embs`/`cor_p`: ONE categorical draw per sample
  over 2**len(cor_embs) joint outcomes, bit-decomposed into per-embedder
  drop masks (modules.py:188-203) — lets e.g. text and image conditioning
  drop together with a controlled joint distribution;
- `force_zero_embeddings` (inference uc rows) zeroes outputs by input_key
  (modules.py:178-181);
- non-trainable embedders contribute via stop_gradient (the reference
  freezes their parameters and disables train(), modules.py:75-80);
- `get_unconditional_conditioning` runs the (c, uc) pair with every
  ucg_rate and cor dropout DISABLED (modules.py:222-243).

All array ops trace under jit; dropout randomness comes from an explicit
`key`. Embedder `apply` callables receive (params_subtree, *batch_inputs)
and may return one array or a tuple (each routed independently,
modules.py:146-149).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

OUTPUT_DIM2KEYS = {2: "vector", 3: "crossattn", 4: "concat", 5: "concat"}
KEY2CATDIM = {"vector": 1, "crossattn": 2, "concat": 1}


@dataclasses.dataclass(frozen=True)
class EmbedderSpec:
    """One conditioning embedder (AbstractEmbModel, modules.py:30-59).

    name: key of this embedder's subtree in the conditioner params dict
      (may be absent for parameterless embedders — apply receives None).
    apply: (params_subtree, *inputs) -> array | tuple of arrays.
    input_key / input_keys: which batch entries feed `apply` (exactly one
      of the two, modules.py:86-93).
    ucg_rate: per-sample unconditional-guidance dropout probability.
    legacy_ucg_val: if set, dropout replaces the INPUT batch value with
      this scalar instead of zeroing the output (modules.py:95-98).
    is_trainable: gradients flow into params_subtree iff True.
    """
    name: str
    apply: Callable
    input_key: Optional[str] = None
    input_keys: Tuple[str, ...] = ()
    ucg_rate: float = 0.0
    legacy_ucg_val: Optional[float] = None
    is_trainable: bool = False

    def __post_init__(self):
        if (self.input_key is None) == (len(self.input_keys) == 0):
            raise ValueError(
                f"embedder {self.name}: need exactly one of input_key / "
                "input_keys (modules.py:86-93)")


def _expand_like(mask, emb):
    """(B,) -> (B, 1, 1, ...) broadcastable to emb (expand_dims_like)."""
    return mask.reshape(mask.shape + (1,) * (emb.ndim - 1)).astype(emb.dtype)


def _batch_size(batch):
    return next(iter(jax.tree.leaves(batch))).shape[0]


def _run_embedder(spec: EmbedderSpec, params, batch, drop, output,
                  force_zero_keys):
    """get_single_embedding (modules.py:127-184). drop: (B,) float 1.0 =
    drop this sample's conditioning, or None (no dropout)."""
    sub = params.get(spec.name) if params else None
    if spec.input_key is not None:
        val = batch[spec.input_key]
        if spec.legacy_ucg_val is not None and drop is not None:
            # surely/possibly_get_ucg_val: input replacement
            val = jnp.where(_expand_like(drop, val) > 0.5,
                            jnp.asarray(spec.legacy_ucg_val, val.dtype), val)
        emb_out = spec.apply(sub, val)
    else:
        emb_out = spec.apply(sub, *[batch[k] for k in spec.input_keys])
    if not isinstance(emb_out, (list, tuple)):
        emb_out = [emb_out]
    for emb in emb_out:
        out_key = OUTPUT_DIM2KEYS[emb.ndim]
        if not spec.is_trainable:
            emb = jax.lax.stop_gradient(emb)
        if (spec.ucg_rate > 0.0 and spec.legacy_ucg_val is None
                and drop is not None):
            emb = emb * (1.0 - _expand_like(drop, emb))
        if spec.input_key is not None and spec.input_key in force_zero_keys:
            emb = jnp.zeros_like(emb)
        if out_key in output:
            output[out_key] = jnp.concatenate(
                [output[out_key], emb], axis=KEY2CATDIM[out_key])
        else:
            output[out_key] = emb
    return output


def apply_conditioner(specs: Sequence[EmbedderSpec], params, batch, *,
                      key=None, train: bool = False,
                      cor_embs: Sequence[int] = (),
                      cor_p: Sequence[float] = (),
                      force_zero_embeddings: Sequence[str] = ()):
    """GeneralConditioner.forward (modules.py:186-218): returns a dict with
    any of "vector" / "crossattn" / "concat".

    train=False (or key=None) disables all dropout — the inference
    behavior. Correlated embedders (indices in cor_embs) are processed
    FIRST, in cor_embs order, then the rest in spec order — the reference's
    processing order, which fixes the per-key concatenation order."""
    if cor_embs:
        if len(cor_p) != 2 ** len(cor_embs):
            raise ValueError("len(cor_p) must be 2**len(cor_embs)")
    output = {}
    dropout_on = train and key is not None
    B = _batch_size(batch)
    cond_or_not = {}
    if cor_embs and dropout_on:
        key, k_cor = jax.random.split(key)
        rand_idx = jax.random.choice(k_cor, len(cor_p), (B,),
                                     p=jnp.asarray(cor_p, jnp.float32))
        for emb_idx in cor_embs:
            cond_or_not[emb_idx] = (rand_idx % 2).astype(jnp.float32)
            rand_idx = rand_idx // 2
    for i in tuple(cor_embs) + tuple(j for j in range(len(specs))
                                     if j not in cor_embs):
        spec = specs[i]
        drop = None
        if dropout_on:
            if i in cond_or_not:
                drop = cond_or_not[i]
            elif spec.ucg_rate > 0.0:
                key, k_i = jax.random.split(key)
                drop = jax.random.bernoulli(
                    k_i, spec.ucg_rate, (B,)).astype(jnp.float32)
        output = _run_embedder(spec, params, batch, drop, output,
                               tuple(force_zero_embeddings))
    return output


def get_unconditional_conditioning(specs, params, batch_c, batch_uc=None, *,
                                   force_uc_zero_embeddings: Sequence[str]
                                   = ()):
    """(c, uc) pair with all ucg/cor dropout disabled
    (modules.py:222-243). uc runs on batch_uc if given, else batch_c with
    force_uc_zero_embeddings zeroed — the shipped config's
    force_uc_zero_embeddings=["txt"] produces the exact-zeros uc context
    the pipelines rely on."""
    c = apply_conditioner(specs, params, batch_c, train=False)
    uc = apply_conditioner(specs, params,
                           batch_c if batch_uc is None else batch_uc,
                           train=False,
                           force_zero_embeddings=force_uc_zero_embeddings)
    return c, uc
