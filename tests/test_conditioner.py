"""GeneralConditioner generality (sgm/modules/encoders/modules.py:62-243):
rank-based output routing (vector/crossattn/concat) with per-key
concatenation, per-embedder ucg dropout (output-zeroing and legacy
input-replacement), correlated cor_embs/cor_p dropout, force-zero uc rows,
frozen-embedder stop_gradient, and the (c, uc) inference pair."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.diffusion import conditioner as cond


def _specs():
    return [
        cond.EmbedderSpec(
            name="txt", input_key="txt",
            apply=lambda p, x: x @ p["w"], ucg_rate=0.5),
        cond.EmbedderSpec(
            name="fps", input_key="fps",
            apply=lambda p, x: x[:, None] * p["w"][None, :], ucg_rate=0.5),
        cond.EmbedderSpec(
            name="img", input_key="img", apply=lambda p, x: x,
            ucg_rate=0.5),
    ]


def _params():
    return {
        "txt": {"w": jnp.asarray(np.random.default_rng(0)
                                 .standard_normal((8, 16), np.float32))},
        "fps": {"w": jnp.ones((6,), jnp.float32)},
    }


def _batch(B=4):
    rng = np.random.default_rng(1)
    return {
        "txt": jnp.asarray(rng.standard_normal((B, 5, 8), np.float32)),
        "fps": jnp.asarray(rng.uniform(1, 30, (B,)).astype(np.float32)),
        "img": jnp.asarray(rng.standard_normal((B, 3, 2, 4, 4), np.float32)),
    }


def test_rank_routing_and_catdims():
    out = cond.apply_conditioner(_specs(), _params(), _batch())
    assert out["crossattn"].shape == (4, 5, 16)   # 3-D
    assert out["vector"].shape == (4, 6)          # 2-D
    assert out["concat"].shape == (4, 3, 2, 4, 4)  # 5-D
    # two embedders on the same key concatenate along KEY2CATDIM
    two = _specs() + [cond.EmbedderSpec(
        name="txt2", input_key="txt", apply=lambda p, x: x @ jnp.ones((8, 4)))]
    out2 = cond.apply_conditioner(two, _params(), _batch())
    assert out2["crossattn"].shape == (4, 5, 20)  # axis 2
    np.testing.assert_array_equal(np.asarray(out2["crossattn"][..., :16]),
                                  np.asarray(out["crossattn"]))


def test_tuple_output_routes_each():
    spec = cond.EmbedderSpec(
        name="multi", input_key="fps",
        apply=lambda p, x: (jnp.tile(x[:, None], (1, 3)),
                            jnp.tile(x[:, None, None], (1, 2, 4))))
    out = cond.apply_conditioner([spec], {}, _batch())
    assert out["vector"].shape == (4, 3)
    assert out["crossattn"].shape == (4, 2, 4)


def test_multi_input_keys():
    spec = cond.EmbedderSpec(
        name="pair", input_keys=("fps", "txt"),
        apply=lambda p, f, t: t.mean(1) * f[:, None])
    out = cond.apply_conditioner([spec], {}, _batch())
    assert out["vector"].shape == (4, 8)


def test_ucg_zeroes_rows_at_rate():
    spec = cond.EmbedderSpec(name="txt", input_key="txt",
                             apply=lambda p, x: x @ p["w"], ucg_rate=0.3)
    B, n_zero = 512, 0
    batch = {"txt": jnp.ones((B, 2, 8), jnp.float32)}
    out = cond.apply_conditioner([spec], _params(), batch, train=True,
                                 key=jax.random.PRNGKey(0))
    rows = np.asarray(out["crossattn"]).reshape(B, -1)
    zero = (np.abs(rows).max(1) == 0.0)
    n_zero = zero.sum()
    assert 0.22 * B < n_zero < 0.38 * B, n_zero
    # non-dropped rows untouched
    keep = np.asarray((jnp.ones((1, 2, 8)) @ _params()["txt"]["w"])).ravel()
    np.testing.assert_allclose(rows[~zero][0],
                               np.tile(keep, 1), rtol=1e-6)
    # no dropout at inference (train=False) even with a key
    out_inf = cond.apply_conditioner([spec], _params(), batch,
                                     key=jax.random.PRNGKey(0))
    assert (np.abs(np.asarray(out_inf["crossattn"])).max(axis=(1, 2)) > 0).all()


def test_legacy_ucg_replaces_input():
    """legacy_ucg_val: dropout replaces the INPUT batch value before the
    embedder runs (possibly_get_ucg_val, modules.py:107-115)."""
    spec = cond.EmbedderSpec(name="fps", input_key="fps",
                             apply=lambda p, x: x[:, None] * jnp.ones((1, 4)),
                             ucg_rate=0.5, legacy_ucg_val=0.0)
    B = 256
    batch = {"fps": jnp.full((B,), 24.0)}
    out = cond.apply_conditioner([spec], {}, batch, train=True,
                                 key=jax.random.PRNGKey(1))
    v = np.asarray(out["vector"])
    dropped = (v == 0.0).all(1)
    kept = (v == 24.0).all(1)
    assert (dropped | kept).all()
    assert 0.4 * B < dropped.sum() < 0.6 * B


def test_cor_embs_joint_distribution():
    """One categorical draw over 2**n joint outcomes, bit-decomposed
    (modules.py:188-203): cor_p=[0,0,0,1] -> both always dropped;
    [1,0,0,0] -> never; [0,1,0,0] -> only embedder cor_embs[0]."""
    specs = _specs()[:2]

    def run(cor_p, key=2):
        out = cond.apply_conditioner(
            specs, _params(), _batch(B=64), train=True,
            key=jax.random.PRNGKey(key), cor_embs=(0, 1), cor_p=cor_p)
        txt0 = (np.abs(np.asarray(out["crossattn"]))
                .reshape(64, -1).max(1) == 0)
        fps0 = (np.abs(np.asarray(out["vector"])).max(1) == 0)
        return txt0, fps0

    t, f = run((0.0, 0.0, 0.0, 1.0))
    assert t.all() and f.all()
    t, f = run((1.0, 0.0, 0.0, 0.0))
    assert not t.any() and not f.any()
    # rand_idx % 2 drops cor_embs[0]; // 2 then % 2 drops cor_embs[1]
    t, f = run((0.0, 1.0, 0.0, 0.0))
    assert t.all() and not f.any()
    t, f = run((0.0, 0.0, 1.0, 0.0))
    assert not t.any() and f.all()


def test_force_zero_and_uc_pair():
    specs = _specs()
    c, uc = cond.get_unconditional_conditioning(
        specs, _params(), _batch(), force_uc_zero_embeddings=["txt"])
    assert (np.asarray(uc["crossattn"]) == 0).all()
    assert not (np.asarray(c["crossattn"]) == 0).all()
    # other keys identical between c and uc
    np.testing.assert_array_equal(np.asarray(c["vector"]),
                                  np.asarray(uc["vector"]))
    np.testing.assert_array_equal(np.asarray(c["concat"]),
                                  np.asarray(uc["concat"]))


def test_frozen_embedder_stops_gradient():
    specs = [
        cond.EmbedderSpec(name="txt", input_key="txt",
                          apply=lambda p, x: x @ p["w"], is_trainable=True),
        cond.EmbedderSpec(name="fps", input_key="fps",
                          apply=lambda p, x: x[:, None] * p["w"][None, :]),
    ]
    batch = _batch()

    def loss(params):
        out = cond.apply_conditioner(specs, params, batch)
        return sum(jnp.sum(v ** 2) for v in out.values())

    g = jax.grad(loss)(_params())
    assert np.abs(np.asarray(g["txt"]["w"])).max() > 0
    assert np.abs(np.asarray(g["fps"]["w"])).max() == 0


def test_cor_first_processing_order():
    """cor_embs are processed before the rest (modules.py:196-218), fixing
    the per-key concatenation order."""
    specs = [
        cond.EmbedderSpec(name="a", input_key="fps",
                          apply=lambda p, x: jnp.full((x.shape[0], 2), 1.0)),
        cond.EmbedderSpec(name="b", input_key="fps",
                          apply=lambda p, x: jnp.full((x.shape[0], 2), 2.0)),
    ]
    out = cond.apply_conditioner(specs, {}, _batch(), train=True,
                                 key=jax.random.PRNGKey(0),
                                 cor_embs=(1,), cor_p=(1.0, 0.0))
    np.testing.assert_array_equal(np.asarray(out["vector"][0]),
                                  [2.0, 2.0, 1.0, 1.0])


def test_jit_traceable():
    specs = _specs()
    params, batch = _params(), _batch()

    @jax.jit
    def f(p, b, k):
        return cond.apply_conditioner(specs, p, b, train=True, key=k,
                                      cor_embs=(0, 1),
                                      cor_p=(0.7, 0.1, 0.1, 0.1))

    out = f(params, batch, jax.random.PRNGKey(3))
    assert set(out) == {"vector", "crossattn", "concat"}
    assert np.isfinite(np.asarray(out["crossattn"])).all()


def test_spec_validation():
    with pytest.raises(ValueError):
        cond.EmbedderSpec(name="x", apply=lambda p: 0)
    with pytest.raises(ValueError):
        cond.EmbedderSpec(name="x", apply=lambda p: 0, input_key="a",
                          input_keys=("b",))
    with pytest.raises(ValueError):
        cond.apply_conditioner(_specs(), _params(), _batch(), train=True,
                               key=jax.random.PRNGKey(0), cor_embs=(0,),
                               cor_p=(1.0,))
