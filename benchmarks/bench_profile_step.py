"""Per-op-class breakdown of the production CFG denoise step (VERDICT r4
#5): make the "remaining time = attention-at-floor + linears" arithmetic
auditable by measuring, in ONE process on the real chip, each op class of
the 4.4 s step at its EXACT production shape and reconciling the sum
against the measured full step.

Every timed program is a chained fori_loop (depth >= 8, output feeds the
next iteration's input) so the ~30-40 ms tunnel dispatch amortizes off
the per-call numbers (CLAUDE.md microbench rule). Non-endomorphic pieces
(embed/final head) are chained via a value-feedback term (carry * (1 +
1e-12*mean(out))) that forces the data dependency without changing the
numerics materially. jax.profiler.start_trace is also attempted; through
the remote axon tunnel the device trace may be empty — the JSON records
whether a trace was produced, and the op-class decomposition is the
primary artifact either way.

Writes PROFILE.json at the repo root; prints it as one JSON line.
Env: LANDIFF_BENCH_SCALE (<1 shrinks for CPU smoke), LANDIFF_PROF_TRACE=1
to attempt the profiler capture.
"""

import dataclasses
import json
import os
import time

SCALE = float(os.environ.get("LANDIFF_BENCH_SCALE", "1"))


def _timed_body(body, carry0, depth=8, reps=3):
    """Median per-iteration seconds of body(c)->c chained on device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def chained(c0):
        c = jax.lax.fori_loop(0, depth, lambda _, c: body(c), c0)
        return jnp.sum(c.astype(jnp.float32))

    float(np.asarray(chained(carry0)))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(chained(carry0)))
        ts.append((time.time() - t0) / depth)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from landiff_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from landiff_tpu.config import DiTConfig
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.ops.attention import attention
    from landiff_tpu.ops.norms import layer_norm

    cfg = DiTConfig()
    if SCALE < 1:
        cfg = dataclasses.replace(
            cfg, num_layers=2, control_layers=1, hidden_size=128,
            num_heads=2, latent_frames=2, latent_height=16, latent_width=16,
            text_length=8)
    dt = jnp.bfloat16
    attn_impl = "pallas" if SCALE >= 1 else "xla"
    B = 2
    S = cfg.text_length + cfg.latent_frames \
        * (cfg.latent_height // cfg.patch_size) \
        * (cfg.latent_width // cfg.patch_size)
    D, H, Dk = cfg.hidden_size, cfg.num_heads, cfg.head_dim

    main_p = dit_lib.init(jax.random.PRNGKey(0), cfg, dtype=dt)
    ctrl_p = dit_lib.init(jax.random.PRNGKey(1), cfg, control=True, dtype=dt)
    layer_p = main_p["layers"][0]

    x = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), dt)
    emb = jax.random.normal(jax.random.PRNGKey(3),
                            (B, cfg.time_embed_dim), dt)
    q = jax.random.normal(jax.random.PRNGKey(4), (B, S, H, Dk), dt)
    k = jax.random.normal(jax.random.PRNGKey(5), (B, S, H, Dk), dt)
    v = jax.random.normal(jax.random.PRNGKey(6), (B, S, H, Dk), dt)

    res = {}

    # -- one full AdaLN layer at production shape (the 45x unit) --
    res["layer_full_ms"] = _timed_body(
        lambda c: dit_lib._layer(layer_p, c, emb, cfg, attn_impl), x) * 1e3

    # -- attention path (qk-LN + rotary-if-any + kernel + reshape) --
    def attn_path(c):
        qq = c.reshape(B, S, H, Dk)
        kk = layer_norm(qq, layer_p["k_ln_w"], layer_p["k_ln_b"], 1e-6)
        qq = layer_norm(qq, layer_p["q_ln_w"], layer_p["q_ln_b"], 1e-6)
        return attention(qq, kk, qq, impl=attn_impl).reshape(B, S, D)

    res["attention_ms"] = _timed_body(attn_path, x) * 1e3

    # -- bare attention kernel --
    res["attention_kernel_ms"] = _timed_body(
        lambda c: attention(c, k, v, impl=attn_impl), q, depth=16) * 1e3

    # -- the four layer linears (qkv, attn_out, mlp0+gelu, mlp1) --
    def linears_only(c):
        h = dit_lib._linear(layer_p, "qkv", c)
        h = dit_lib._linear(layer_p, "attn_out", h[..., :D])
        h = jax.nn.gelu(dit_lib._linear(layer_p, "mlp0", h),
                        approximate=True)
        return dit_lib._linear(layer_p, "mlp1", h)

    res["linears_ms"] = _timed_body(linears_only, x) * 1e3

    # -- adaLN: SiLU+linear -> 12 pieces, 2x (LN + modulate) + gated adds
    def adaln_only(c):
        sel, pc = dit_lib._adaln_sel(layer_p, emb, S, cfg.text_length, dt)
        h = layer_norm(c, layer_p["ln1_w"], layer_p["ln1_b"], 1e-6)
        h = h * (1.0 + sel(pc[7], pc[1])) + sel(pc[6], pc[0])
        c = c + sel(pc[8], pc[2]) * h
        h = layer_norm(c, layer_p["ln2_w"], layer_p["ln2_b"], 1e-6)
        h = h * (1.0 + sel(pc[10], pc[4])) + sel(pc[9], pc[3])
        return c + sel(pc[11], pc[5]) * h

    res["adaln_modulate_ms"] = _timed_body(adaln_only, x) * 1e3

    # -- per-step extras (run once per step, not per layer) --
    ts_vec = jnp.full((B,), 999.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7),
                            (B, cfg.text_length, cfg.text_dim), dt)
    lat = jax.random.normal(jax.random.PRNGKey(8),
                            (B, cfg.latent_frames, cfg.in_channels,
                             cfg.latent_height, cfg.latent_width), dt)

    def embed_body(c):
        h, e = dit_lib._embed_inputs(main_p, c, ts_vec, ctx, cfg, dt)
        fb = (jnp.mean(h) + jnp.mean(e)).astype(c.dtype)
        return c * (1 + 1e-12 * fb)

    res["embed_inputs_ms"] = _timed_body(embed_body, lat) * 1e3

    def final_body(c):
        out = dit_lib._final_head(main_p, c, emb, cfg)
        return c * (1 + 1e-12 * jnp.mean(out).astype(c.dtype))

    res["final_head_ms"] = _timed_body(final_body, x) * 1e3

    # -- the full step (bench.py's program), measured in the same process
    sem = jnp.zeros_like(lat)

    def step_body(c):
        net = dit_lib.control_warp_forward(main_p, ctrl_p, c, ts_vec, ctx,
                                           cfg, sem, attn_impl=attn_impl,
                                           compute_dtype=dt)
        alpha = jnp.float32(0.5)
        return (net.astype(jnp.float32) * (-jnp.sqrt(1 - alpha ** 2))
                + c.astype(jnp.float32) * alpha).astype(dt)

    res["step_ms"] = _timed_body(step_body, lat, depth=4) * 1e3

    # -- reconciliation --
    layers = cfg.num_layers + cfg.control_layers
    per_layer_sum = (res["attention_ms"] + res["linears_ms"]
                     + res["adaln_modulate_ms"])
    explained = (layers * res["layer_full_ms"] + res["embed_inputs_ms"]
                 + res["final_head_ms"])
    record = {
        "metric": "dit_step_op_class_profile",
        "shapes": {"B": B, "S": int(S), "D": D, "H": H, "layers": layers},
        "per_layer": {
            "layer_full_ms": round(res["layer_full_ms"], 2),
            "attention_ms": round(res["attention_ms"], 2),
            "attention_kernel_ms": round(res["attention_kernel_ms"], 2),
            "linears_ms": round(res["linears_ms"], 2),
            "adaln_modulate_ms": round(res["adaln_modulate_ms"], 2),
            "sum_of_parts_ms": round(per_layer_sum, 2),
            "layer_unexplained_ms": round(res["layer_full_ms"]
                                          - per_layer_sum, 2),
        },
        "per_step": {
            "step_ms": round(res["step_ms"], 1),
            "embed_inputs_ms": round(res["embed_inputs_ms"], 2),
            "final_head_ms": round(res["final_head_ms"], 2),
            "layers_x_layer_full_ms": round(layers * res["layer_full_ms"],
                                            1),
            "explained_ms": round(explained, 1),
            "step_unexplained_ms": round(res["step_ms"] - explained, 1),
        },
        "notes": "chained fori_loop programs at exact production shapes; "
                 "int8-scores attention default; 'unexplained' covers "
                 "control-branch zero_linear adds, residual traffic and "
                 "fusion differences between isolated and in-context ops",
    }

    if os.environ.get("LANDIFF_PROF_TRACE") == "1":
        trace_dir = "/tmp/landiff_trace"
        try:
            from landiff_tpu import observability

            with observability.trace(trace_dir):
                float(np.asarray(jax.jit(
                    lambda c: jnp.sum(step_body(c).astype(jnp.float32)))
                    (lat)))
            import glob

            produced = glob.glob(os.path.join(trace_dir, "**", "*"),
                                 recursive=True)
            record["profiler_trace"] = {
                "dir": trace_dir, "files": len(produced),
                "device_trace_present": any(
                    "trace.json" in p or "xplane" in p for p in produced)}
        except Exception as e:  # remote backend may not support tracing
            record["profiler_trace"] = {"error": str(e)[:200]}

    if SCALE >= 1:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PROFILE.json")
        with open(out, "w") as f:
            json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
