"""Attention kernel microbench at DiT shapes (B=2 CFG, H=30, S=18002,
D=64) on the real chip: pallas cached-K/V vs streaming vs XLA dense.

Usage: python benchmarks/bench_attention.py [S] [iters] [B] [H]

The TP=4 per-chip shard shape (VERDICT r2 #7) is B=1 (CFG rows DP over
data=2), H=8 (30 heads zero-padded to 32, /4): `bench_attention.py 17776
3 1 8`; feed the per-call ms to bench.py via LANDIFF_BENCH_TP_ATTN_MS so
the v5e-8 projection uses a MEASURED sharded kernel time.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()


def run(S=18002, iters=3, B=2, H=30):
    from landiff_tpu.ops import attention as attn

    D = 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), jnp.bfloat16)

    flops = 4 * B * H * S * S * D

    # chain depth: amortize the ~30-40 ms per-execution tunnel dispatch
    # overhead below ~5% of the measured time (a depth of 2 puts ~15-20 ms
    # of host overhead on EACH call — at the TP=4 shard shape that more
    # than doubles the apparent kernel time); keep executions <= ~10 s
    depth = int(os.environ.get("LANDIFF_BENCH_CHAIN", "16"))

    def bench(name, fn):
        # chain calls on-device; fetch a scalar
        @jax.jit
        def chained(q, k, v):
            def body(_, qc):
                return fn(qc, k, v).astype(jnp.bfloat16)
            out = jax.lax.fori_loop(0, depth, body, q)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        float(np.asarray(chained(q, k, v)))
        compile_s = time.time() - t0
        ts = []
        for _ in range(iters):
            t = time.time()
            float(np.asarray(chained(q, k, v)))
            ts.append((time.time() - t) / depth)
        ms = sorted(ts)[len(ts) // 2] * 1e3
        print(f"{name}: {ms:.1f} ms/call ({flops / (ms / 1e3) / 1e12:.1f} "
              f"TFLOP/s), compile {compile_s:.0f}s", flush=True)
        return ms

    os.environ["LANDIFF_ATTN_CACHED"] = "1"
    results = {}
    for bq, bkv in ((512, 1024), (1024, 1024), (512, 2048), (1024, 2048),
                    (2048, 1024)):
        try:
            results[(bq, bkv)] = bench(
                f"pallas cached bq={bq} bkv={bkv}",
                lambda q, k, v, bq=bq, bkv=bkv: attn.flash_attention(
                    q, k, v, block_q=bq, block_kv=bkv))
        except Exception as e:
            print(f"pallas cached bq={bq} bkv={bkv}: FAILED "
                  f"({str(e)[:120]})", flush=True)
    os.environ["LANDIFF_ATTN_CACHED"] = "0"
    stream = bench("pallas streaming",
                   lambda q, k, v: attn.flash_attention(q, k, v))
    if results:
        best = min(results, key=results.get)
        print(f"# best cached {best}: {results[best]:.1f} ms; streaming "
              f"{stream:.1f} ms ({stream / results[best]:.3f}x)")
    else:
        print("# all cached configs failed; streaming only")
    if B * H * S * S * 4 < 8e9:   # dense scores won't fit HBM at DiT size
        xla = bench("xla dense", lambda q, k, v: attn.mha_reference(q, k, v))
        ref = results[best] if results else stream
        print(f"# {'cached' if results else 'streaming'} vs xla: "
              f"{xla / ref:.3f}x")


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 18002
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    H = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    run(S, iters, B, H)
