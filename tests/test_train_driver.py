"""Unified training driver (training/train.py): synthetic-data smoke for
all three trainable components on the virtual CPU mesh, plus checkpoint
resume. The reference ships no training entry point (README train TODO);
this is the SURVEY §7 step-10 completion."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import tiny_test_config
from landiff_tpu.training import train as train_lib


@pytest.mark.parametrize("model", ["vq", "lm", "dit"])
def test_driver_smoke(model, tmp_path):
    cfg = tiny_test_config()
    data_dir = tmp_path / "data"
    train_lib.synthesize(model, cfg, 6, data_dir, shard_size=3)
    metrics = tmp_path / "metrics.jsonl"
    state, last = train_lib.train(
        model, str(data_dir), steps=3, batch_size=2, lr=1e-3,
        mesh_spec="data=2,model=2", log_every=1,
        metrics_path=str(metrics), tiny=True)
    key = "total_loss" if model == "vq" else "loss"
    assert np.isfinite(float(np.asarray(last[key])))
    rows = [json.loads(l) for l in metrics.read_text().splitlines()]
    assert rows[-1]["step"] == 3 and key in rows[-1]


def test_driver_resume(tmp_path):
    cfg = tiny_test_config()
    data_dir = tmp_path / "data"
    train_lib.synthesize("lm", cfg, 6, data_dir, shard_size=3)
    ckpt = tmp_path / "ckpt"
    train_lib.train("lm", str(data_dir), steps=2, batch_size=2,
                    mesh_spec="data=2,model=2", ckpt_dir=str(ckpt),
                    save_every=2, log_every=1, tiny=True)
    # resume picks up at step 3 and runs to 4
    _, last = train_lib.train("lm", str(data_dir), steps=4, batch_size=2,
                              mesh_spec="data=2,model=2",
                              ckpt_dir=str(ckpt), save_every=2,
                              log_every=1, resume=True, tiny=True)
    assert np.isfinite(float(np.asarray(last["loss"])))


def test_parse_mesh():
    m = train_lib.parse_mesh("data=2,model=4")
    assert (m.data, m.model) == (2, 4)


def test_driver_resume_vq_keeps_codebook(tmp_path):
    """Regression: vq resume must round-trip cb_state and the kmeans-init
    flag — restoring params alone re-ran the first-batch kmeans init and
    wiped the trained codebook."""
    cfg = tiny_test_config()
    data_dir = tmp_path / "data"
    train_lib.synthesize("vq", cfg, 6, data_dir, shard_size=3)
    ckpt = tmp_path / "ckpt"
    state, _ = train_lib.train("vq", str(data_dir), steps=2, batch_size=2,
                               mesh_spec="data=2,model=2",
                               ckpt_dir=str(ckpt), save_every=2,
                               log_every=1, tiny=True)
    cb_after_2 = np.asarray(state[0]["quant"]["codebook"]).copy()
    cs_after_2 = np.asarray(state[2].cluster_size).copy()
    # resume with steps == saved step: zero new steps run, so the returned
    # state IS the restored state — codebook and cb_state must round-trip
    # exactly and the kmeans-init flag must stay consumed
    state2, _ = train_lib.train("vq", str(data_dir), steps=2,
                                batch_size=2, mesh_spec="data=2,model=2",
                                ckpt_dir=str(ckpt), save_every=10,
                                log_every=1, resume=True, tiny=True)
    np.testing.assert_allclose(np.asarray(state2[0]["quant"]["codebook"]),
                               cb_after_2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2[2].cluster_size),
                               cs_after_2, rtol=1e-6)
    assert not bool(np.asarray(state2[3]))   # first=False: no re-init
    # and one further resumed step trains without error
    _, last = train_lib.train("vq", str(data_dir), steps=3, batch_size=2,
                              mesh_spec="data=2,model=2",
                              ckpt_dir=str(ckpt), save_every=10,
                              log_every=1, resume=True, tiny=True)
    assert np.isfinite(float(np.asarray(last["total_loss"])))


def test_driver_smoke_dit_sp_mesh(tmp_path):
    """--mesh data=2,time=4 routes the DiT driver through the sequence-
    parallel train step (make_train_step_sp)."""
    cfg = tiny_test_config()
    data_dir = tmp_path / "data"
    train_lib.synthesize("dit", cfg, 4, data_dir, shard_size=2)
    state, last = train_lib.train(
        "dit", str(data_dir), steps=2, batch_size=2, lr=1e-3,
        mesh_spec="data=2,time=4", log_every=1, tiny=True)
    assert np.isfinite(float(np.asarray(last["loss"])))


def test_grad_accum_equivalence():
    """make_optimizer(grad_accum=k) over k micro-grads == one plain update
    on the mean grad (DeepSpeed gradient_accumulation_steps semantics,
    arguments.py:168-191). Built with matched schedule horizons (the accum
    optimizer counts applied updates)."""
    import optax

    k, rounds = 4, 3  # 3 applied updates (the first is at warmup LR 0)
    params = {"w": jnp.arange(6.0).reshape(2, 3) / 7.0,
              "b": jnp.ones((3,)) * 0.3}
    rng = np.random.default_rng(0)
    micro = [[{"w": jnp.asarray(rng.standard_normal((2, 3)), jnp.float32),
               "b": jnp.asarray(rng.standard_normal((3,)), jnp.float32)}
              for _ in range(k)] for _ in range(rounds)]

    acc = train_lib.make_optimizer(1e-3, steps=rounds * k, grad_accum=k)
    st = acc.init(params)
    p_acc = params
    for rnd in micro:
        for g in rnd:
            upd, st = acc.update(g, st, p_acc)
            p_acc = optax.apply_updates(p_acc, upd)

    plain = train_lib.make_optimizer(1e-3, steps=rounds)
    st_p = plain.init(params)
    p_ref = params
    for rnd in micro:
        mean = {kk: sum(g[kk] for g in rnd) / k for kk in rnd[0]}
        upd, st_p = plain.update(mean, st_p, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
    assert any(float(jnp.abs(p_ref[kk] - params[kk]).max()) > 0
               for kk in params)  # non-vacuous: params actually moved
    for kk in params:
        np.testing.assert_allclose(np.asarray(p_acc[kk]),
                                   np.asarray(p_ref[kk]), rtol=1e-6,
                                   atol=1e-8)


def test_grad_accum_intermediate_steps_are_noops():
    import optax

    params = {"w": jnp.ones((4, 4))}
    acc = train_lib.make_optimizer(1e-3, steps=8, grad_accum=2)
    st = acc.init(params)
    g = {"w": jnp.full((4, 4), 0.5)}
    upd, st = acc.update(g, st, params)  # cycle 1 accumulate
    assert float(jnp.abs(upd["w"]).max()) == 0.0
    upd, st = acc.update(g, st, params)  # cycle 1 apply (warmup LR 0)
    upd, st = acc.update(g, st, params)  # cycle 2 accumulate
    assert float(jnp.abs(upd["w"]).max()) == 0.0
    upd, st = acc.update(g, st, params)  # cycle 2 apply, LR > 0 now
    assert float(jnp.abs(upd["w"]).max()) > 0.0


def test_driver_grad_accum_smoke(tmp_path):
    """--grad-accum 2 through the full driver on the CPU mesh: MultiSteps
    state passes the ZeRO sharding walk and the jitted step donation."""
    cfg = tiny_test_config()
    data_dir = tmp_path / "data"
    train_lib.synthesize("lm", cfg, 8, data_dir, shard_size=4)
    _, last = train_lib.train("lm", str(data_dir), steps=4, batch_size=2,
                              mesh_spec="data=2,model=2", log_every=1,
                              tiny=True, grad_accum=2)
    assert np.isfinite(float(np.asarray(last["loss"])))
