"""Tokenizer benchmark (BASELINE staged config #1): video -> Theia
features -> TiTok encode -> VQ codes -> TiTok decode round-trip at the
production segment size (13 frames, 480x720 -> 30x45 grid, 1,218 tokens).

This is the token-production path for stage-1 training data
(tokenizer round-trip; reference llm/modules/tokenizer.py:90-102 +
tokenizer/models/video_titok_vq.py encode/decode).

Prints per-stage seconds (warm, one v5e chip, bf16).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from landiff_tpu.utils import enable_compile_cache
enable_compile_cache()


def main():
    from landiff_tpu.config import LanDiffConfig
    from landiff_tpu.models import theia as theia_lib
    from landiff_tpu.models import vq as vq_lib

    cfg = LanDiffConfig().tokenizer
    dt = jnp.bfloat16
    params = vq_lib.init(jax.random.PRNGKey(0), cfg, dtype=dt)
    T = int(os.environ.get("LANDIFF_BENCH_FRAMES", "13"))
    video = jax.random.randint(jax.random.PRNGKey(1), (1, T, 480, 720, 3),
                               0, 256, jnp.int32).astype(jnp.uint8)

    feats_fn = jax.jit(lambda v: vq_lib.extract_features(
        params, v, cfg, compute_dtype=dt))
    enc_fn = jax.jit(lambda f: vq_lib.encode_features_to_index(
        params, f, cfg, compute_dtype=dt))
    dec_fn = jax.jit(lambda i: vq_lib.index_to_feature(
        params, i, cfg, forward_t=T, compute_dtype=dt))

    def timed(fn, x):
        out = fn(x)
        jax.tree_util.tree_map(np.asarray, out)   # warm (compile)
        t0 = time.time()
        out = fn(x)
        out = jax.tree_util.tree_map(np.asarray, out)
        return time.time() - t0, out

    t_feat, feats = timed(feats_fn, video)
    t_enc, (_, idx) = timed(enc_fn, jnp.asarray(feats))
    t_dec, rec = timed(dec_fn, jnp.asarray(idx))

    n_tokens = int(np.asarray(idx).shape[-1])
    print(json.dumps({
        "metric": "tokenizer_roundtrip_s_13f_480p",
        "value": round(t_feat + t_enc + t_dec, 3),
        "unit": "s",
        "vs_baseline": None,
        "stages": {"theia_extract": round(t_feat, 3),
                   "titok_vq_encode": round(t_enc, 3),
                   "titok_decode": round(t_dec, 3)},
        "tokens": n_tokens,
        "compression_x": round(video.size / n_tokens, 0),
    }))


if __name__ == "__main__":
    main()
