"""CPU smoke for the per-chip shard-step benches that feed the v5e-8 mesh
projection (benchmarks/bench_tp_shard_step.py, benchmarks/bench_sp_shard_
step.py). Runs each script at LANDIFF_BENCH_SCALE=0.125 on CPU and asserts
it emits a valid JSON metric line — a plumbing check so a hardware run
never discovers a crash (timings at this scale are meaningless and not
asserted). The projections these scripts de-assumption: bench.py
bench_mesh (MESH_r04.json)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, extra_env):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # single-device smoke; no virtual mesh
    # strip the axon sitecustomize path: its register() would force the
    # TPU platform regardless of JAX_PLATFORMS=cpu (same as bench_mesh)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p])
    env["JAX_PLATFORMS"] = "cpu"
    env["LANDIFF_BENCH_SCALE"] = "0.125"
    env["LANDIFF_BENCH_STEPS"] = "2"
    env["LANDIFF_BENCH_ATTN"] = "xla"
    env.update(extra_env)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", script)],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stdout
    return json.loads(lines[-1])

def test_tp_shard_step_smoke():
    out = _run("bench_tp_shard_step.py", {})
    assert "per_chip" in out["metric"]
    assert out["value"] > 0


def test_sp_shard_step_smoke():
    out = _run("bench_sp_shard_step.py", {"LANDIFF_BENCH_SP": "2"})
    assert "per_chip" in out["metric"]
    assert out["value"] > 0


def test_step_reuse_bench_smoke():
    out = _run("bench_step_reuse.py", {"LANDIFF_BENCH_REUSE_STEPS": "8",
                                       "LANDIFF_STEP_REUSE_K": "2"})
    assert out["metric"] == "diffusion_phase_step_reuse"
    assert out["computed_steps"] == 7  # head3 + {3,5} + tail3 on 8 steps
    assert abs(out["latent_corr_vs_exact"]) <= 1.0


def test_cfg_window_bench_smoke():
    out = _run("bench_cfg_window.py", {"LANDIFF_BENCH_GW_STEPS": "8",
                                       "LANDIFF_BENCH_GW_WINDOW": "2,6"})
    assert out["metric"] == "diffusion_phase_cfg_window"
    assert out["full_cfg_steps"] == 4
    assert abs(out["latent_corr_vs_exact"]) <= 1.0
