"""Microbench: fused adaLN (ops/adaln.py) vs the XLA LN+modulate chain at
production DiT shape (B=2, S=17776, D=3072, bf16, text_len=226).

MICROBENCH RULE (CLAUDE.md): chain >=16 calls per execution — here 64 via
lax.scan — and fetch a scalar through np.asarray to defeat the tunnel's
early block_until_ready.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_adaln.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.ops import adaln  # noqa: E402

B, S, D, TL = 2, 17776, 3072, 226
CHAIN = 64


def make(fn):
    @jax.jit
    def run(x, w, b, ts, tc, vs, vc):
        def body(h, _):
            return fn(h, w, b, ts, tc, vs, vc), None
        out, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(out[0, 0].astype(jnp.float32))
    return run


def time_it(name, run, args, reps=3):
    out = run(*args)
    np.asarray(out)  # warm (compile + load)
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best.append((time.perf_counter() - t0) / CHAIN * 1e3)
    print(f"{name:28s} {min(best):7.3f} ms/call   (reps {['%.3f' % r for r in best]})")
    return min(best)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, S, D), dt)
    w = 1.0 + 0.1 * jax.random.normal(ks[1], (D,), dt)
    b = 0.1 * jax.random.normal(ks[2], (D,), dt)
    ts, tc, vs, vc = (0.2 * jax.random.normal(k, (B, D), dt)
                      for k in ks[3:])
    args = (x, w, b, ts, tc, vs, vc)

    variants = [
        ("xla", functools.partial(adaln.adaln_modulate, text_len=TL,
                                  impl="xla")),
        ("pallas b256", functools.partial(adaln.adaln_modulate, text_len=TL,
                                          impl="pallas", block_s=256)),
        ("pallas b512", functools.partial(adaln.adaln_modulate, text_len=TL,
                                          impl="pallas", block_s=512)),
        ("pallas b1024", functools.partial(adaln.adaln_modulate,
                                           text_len=TL, impl="pallas",
                                           block_s=1024)),
    ]
    results = {}
    for name, fn in variants:
        results[name] = time_it(name, make(fn), args)

    # correctness on-device at full shape
    want = adaln.adaln_modulate(*args, text_len=TL, impl="xla")
    got = adaln.adaln_modulate(*args, text_len=TL, impl="pallas",
                               block_s=512)
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"max |pallas-xla| at full shape: {err:.3e}")
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
