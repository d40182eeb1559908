"""VAE encode benchmark (VERDICT r3 #7): `engine.encode_first_stage` — the
training / data-prepare hot path (reference encoder cp_enc_dec.py:785-909,
used via diffusion_video.py:232-253) — at production 480x720 in bf16.

Shapes: the 13-frame training segment unit (full graph — fits) and the
49-frame shipped clip length, which does NOT fit as one graph on a 16 GB
v5e (22.7 GB of HLO temps, measured) and runs via the chunked
vae.encode_streaming (conv-cache carry, 9+8*5 frame chunks). Warm pass
first (the axon remote backend pays a per-process executable load), then
timed runs fetching to host (np.asarray defeats the tunnel's early
block_until_ready).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_vae_encode.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()

from landiff_tpu.config import LanDiffConfig  # noqa: E402
from landiff_tpu.diffusion import engine  # noqa: E402
from landiff_tpu.models import vae as vae_lib  # noqa: E402


def main():
    cfg = LanDiffConfig()
    dt = jnp.bfloat16
    params = {"encoder": vae_lib.init_encoder(jax.random.PRNGKey(0),
                                              cfg.vae, dtype=dt)}

    @jax.jit
    def enc_full(p, v):
        return engine.encode_first_stage(p, v, cfg.vae, compute_dtype=dt)

    def enc_stream(p, v):
        return engine.encode_first_stage(p, v, cfg.vae, compute_dtype=dt,
                                         streaming=True)

    results = {}
    for frames, fn, tag in ((13, enc_full, "full"),
                            (49, enc_stream, "streaming")):
        video = jax.random.uniform(jax.random.PRNGKey(1),
                                   (1, 3, frames, 480, 720), dt,
                                   minval=-1.0, maxval=1.0)
        lat = fn(params, video)
        np.asarray(lat)  # warm: compile + executable load
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(params, video)
            np.asarray(out)
            times.append(time.perf_counter() - t0)
        results[f"encode_{frames}f_{tag}_s"] = round(min(times), 3)
        print(json.dumps({"frames": frames, "mode": tag,
                          "latents": list(lat.shape),
                          "seconds": round(min(times), 3),
                          "reps": [round(t, 3) for t in times]}))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
