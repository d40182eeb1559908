"""Isolate the int4 weight-only matmul slowdown on the v5e.

Decode-shaped matvec: x (2, 3072) @ W (3072, 8192), 64-call chains
(MICROBENCH RULE: >=16 calls/execution). Variants:
  bf16      — plain dot, weights bf16 (2 B/weight HBM)
  int8      — weight-only int8, per-out-channel scale (1 B/weight)
  int4_g1   — packed int4, per-out-channel scale (G=1: single dot,
              isolates the int4 bitcast-convert fusion)
  int4_g24  — packed int4, group=128 scales (the shipped quantize_int4
              layout: G-batched einsum + scaled partial sum)

Measured (1x v5e, r4): bf16 370 us/call, int8 475, int4_g1 651,
int4_g24 681 — grouping costs ~5%; the int4 bitcast+convert chain does
not fuse into the dot (the dominant loss). At this single-weight scale
the chain is MXU/occupancy-dominated (bf16 reads only ~136 GB/s of its
819 GB/s roofline), which is also why int8 shows no win HERE while it
halves the full 24-layer decode (weights ~2 GB: streaming dominates
there). Verdict: int4 rejected — see PARITY.md "Measured".
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

I, O, B, CHAIN = 3072, 8192, 2, 64
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (I, O), jnp.float32) * 0.02
x0 = jax.random.normal(jax.random.PRNGKey(1), (B, I), jnp.bfloat16)


def pack4(q):
    return ((q[:, 1::2] << 4) | (q[:, 0::2] & 0x0F)).astype(jnp.int8)


def quant_int8(w):
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    return {"q": jnp.round(w / s).astype(jnp.int8), "s": s.astype(jnp.bfloat16)}


def quant_int4(w, group):
    G = I // group
    wg = w.reshape(G, group, O)
    s = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / s[:, None, :]), -7, 7).reshape(I, O)
    return {"q4": pack4(q.astype(jnp.int8)), "s": s.astype(jnp.bfloat16)}


def dot_bf16(x, w):
    return x @ w


def dot_int8(x, w):
    return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)


def dot_int4(x, w):
    p, s = w["q4"], w["s"]
    q = jax.lax.bitcast_convert_type(p, jnp.int4).reshape(I, -1)
    G, _ = s.shape
    g = I // G
    if G == 1:
        return (x @ q.astype(x.dtype)) * s[0].astype(x.dtype)
    xg = x.reshape(x.shape[:-1] + (G, g))
    part = jnp.einsum("...gi,gio->...go", xg, q.reshape(G, g, O).astype(x.dtype))
    return (part * s.astype(x.dtype)).sum(-2)


def chain(fn, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = fn(c, w)
            # fold back to (B, I) so the chain reuses the weight read
            return jnp.tanh(y[:, :I]).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return c
    return run


variants = {
    "bf16": (dot_bf16, w.astype(jnp.bfloat16)),
    "int8": (dot_int8, quant_int8(w)),
    "int4_g1": (dot_int4, quant_int4(w, I)),
    "int4_g24": (dot_int4, quant_int4(w, 128)),
}

for name, (fn, wq) in variants.items():
    run = chain(fn, wq)
    r = run(x0, wq)
    np.asarray(r)  # warm + fetch
    times = []
    for _ in range(3):
        t = time.time()
        r = run(x0, wq)
        np.asarray(r)
        times.append(time.time() - t)
    per_call_us = min(times) / CHAIN * 1e6
    gbps = (I * O * {"bf16": 2, "int8": 1, "int4_g1": 0.5, "int4_g24": 0.5}[name]) / (min(times) / CHAIN) / 1e9
    print(f"{name:10s} {per_call_us:8.1f} us/call  ~{gbps:6.1f} GB/s weight stream")
