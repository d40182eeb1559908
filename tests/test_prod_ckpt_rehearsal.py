"""Production-shape checkpoint rehearsal (VERDICT r2 #6): synthesize the
FULL LanDiff checkpoint tree — every file, every key, at the REAL
production shapes from ckpt/manifests.py — on disk in the real formats
(safetensors / SAT .pt / HF-sharded T5), then run `convert --verify` and
the runtime loaders against it. First contact with the real weights should
be a formality: only the VALUES differ from this rehearsal.

Zeros are used for the tensors (the loaders/verify only see keys, shapes,
dtypes and layout), and the files are written SPARSE so the ~40 GB tree
costs ~0 disk and seconds to write: safetensors files are just a header +
a truncate (holes read back as the zero payload they represent), and
torch.save is routed through a writer that turns all-zero chunks into
seeks. The files are byte-identical to a dense zero checkpoint. Set
LANDIFF_SKIP_PROD_REHEARSAL=1 to skip (readback still peaks ~15 GB RAM).
"""

import gc
import json
import os

import jax
import numpy as np
import pytest

from landiff_tpu.ckpt import convert, manifests
from landiff_tpu.config import LanDiffConfig

PROD = LanDiffConfig()

pytestmark = pytest.mark.skipif(
    os.environ.get("LANDIFF_SKIP_PROD_REHEARSAL") == "1",
    reason="LANDIFF_SKIP_PROD_REHEARSAL=1")

_ST_DTYPE = {np.dtype(np.float32): "F32", np.dtype(np.float16): "F16"}


def _zeros(manifest, dtype=np.float16):
    return {k: np.zeros(s, dtype) for k, s in manifest.items()}


def _save_st(manifest, path, dtype=np.float16):
    """Sparse-write a zeros safetensors file: 8-byte LE header length +
    JSON header + truncate to the full payload size (file holes == the
    zero tensor bytes, so safetensors reads it back exactly)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    dt = np.dtype(dtype)
    header, off = {}, 0
    for k in sorted(manifest):
        shape = manifest[k]
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        header[k] = {"dtype": _ST_DTYPE[dt], "shape": list(shape),
                     "data_offsets": [off, off + n]}
        off += n
    hj = json.dumps(header).encode()
    hj += b" " * (-len(hj) % 8)  # safetensors pads headers to 8 bytes
    with open(path, "wb") as f:
        f.write(len(hj).to_bytes(8, "little"))
        f.write(hj)
        f.truncate(8 + len(hj) + off)


class _SparseWriter:
    """File-like for torch.save that replaces all-zero write chunks with
    seeks, producing a sparse .pt byte-identical to the dense one (the
    holes ARE the zero tensor payloads; zip headers/CRCs are unaffected
    since torch computes them before calling write)."""

    def __init__(self, path):
        self.f = open(path, "wb")

    def write(self, data):
        b = data if isinstance(data, bytes) else bytes(data)
        n = len(b)
        if n > 4096 and b.count(0) == n:
            self.f.seek(n, 1)
        else:
            self.f.write(b)
        return n

    def flush(self):
        self.f.flush()

    def close(self):
        self.f.truncate()  # materialize a trailing hole, if any
        self.f.close()


def _save_sat_pt(sd, path):
    import torch

    path.parent.mkdir(parents=True, exist_ok=True)
    w = _SparseWriter(path)
    try:
        torch.save({"module": {k: (torch.from_numpy(v) if v is not None
                                   else None) for k, v in sd.items()}}, w)
    finally:
        w.close()


def _save_t5_sharded(cfg, d, dtype=np.float16):
    """Two-shard HF layout with index.json (exercises the shard loader)."""
    d.mkdir(parents=True, exist_ok=True)
    m = manifests.t5_hf_safetensors(cfg)
    keys = sorted(m)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for shard, ks in shards.items():
        _save_st({k: m[k] for k in ks}, d / shard, dtype)
        weight_map.update({k: shard for k in ks})
    (d / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map}))


@pytest.fixture(scope="module")
def prod_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("prod_ckpts")

    _save_st(manifests.llm_safetensors(PROD.llm),
             root / "llm" / "model.safetensors")
    _save_st(manifests.tokenizer_safetensors(PROD.tokenizer),
             root / "tokenizer" / "model.safetensors")

    base = _zeros(manifests.dit_sat(PROD.dit))
    # frozen pos table: write OUR recomputed sincos (fp16, like the real
    # SAT file) so verify reports only fp16 rounding (with real files this
    # validates our table against theirs)
    from landiff_tpu.models import dit as dit_lib

    base["mixins.pos_embed.pos_embedding"] = np.asarray(
        dit_lib.pos_embed_table(PROD.dit), np.float16)[None]
    _save_sat_pt({"model." + k: v for k, v in base.items()},
                 root / "CogVideoX-2b-sat" / "transformer" / "1000"
                 / "mp_rank_00_model_states.pt")
    del base
    gc.collect()

    _save_sat_pt(_zeros(manifests.engine_ckpt(PROD)),
                 root / "diffusion" / "1" / "mp_rank_00_model_states.pt")

    import torch

    vp = root / "CogVideoX-2b-sat" / "vae"
    vp.mkdir(parents=True)
    w = _SparseWriter(vp / "3d-vae.pt")
    try:
        torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in
                                   _zeros(manifests.vae_state_dict(PROD.vae)
                                          ).items()}}, w)
    finally:
        w.close()

    _save_t5_sharded(PROD.t5, root / "CogVideoX-2b-sat" / "t5-v1_1-xxl")
    gc.collect()
    return root


def test_verify_full_production_tree(prod_tree):
    report = convert.verify_ckpt_tree(prod_tree, PROD)
    for name, r in report.items():
        assert r.get("status") != "absent", (name, "file not written?")
        assert r.get("status") == "ok", (name, r)
        for field in ("missing_vs_manifest", "extra_vs_manifest",
                      "shape_mismatch", "unconsumed_unexpected"):
            if field in r:
                assert not r[field], (name, field, r[field][:5])
    # our recomputed sincos table vs the (fp16) stored one: rounding only
    assert report["dit_base"]["pos_embed_max_abs_diff"] < 2e-3, report
    gc.collect()


def test_load_stage1_production_shapes(prod_tree):
    import jax.numpy as jnp

    from landiff_tpu.ckpt import load as ckpt_load
    from landiff_tpu.models import lm as lm_lib
    from landiff_tpu.models import t5 as t5_lib

    params = ckpt_load.load_stage1(prod_tree, PROD, dtype=jnp.bfloat16)
    want_lm = jax.eval_shape(
        lambda: lm_lib.init(jax.random.PRNGKey(0), PROD.llm,
                            t5_dim=PROD.t5.d_model))
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape),
                                        params["lm"])
    want_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), want_lm)
    assert got_shapes == want_shapes
    want_t5 = jax.eval_shape(
        lambda: t5_lib.init(jax.random.PRNGKey(0), PROD.t5))
    assert (jax.tree_util.tree_map(lambda x: tuple(x.shape), params["t5"])
            == jax.tree_util.tree_map(lambda x: tuple(x.shape), want_t5))
    del params
    gc.collect()


def test_load_stage2_production_shapes(prod_tree):
    import jax.numpy as jnp

    from landiff_tpu.ckpt import load as ckpt_load
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib
    from landiff_tpu.models import vae as vae_lib

    params = ckpt_load.load_stage2(prod_tree, PROD, dtype=jnp.bfloat16)

    def shapes(t):
        return jax.tree_util.tree_map(lambda x: tuple(x.shape), t)

    key = jax.random.PRNGKey(0)
    assert shapes(params["main"]) == shapes(jax.eval_shape(
        lambda: dit_lib.init(key, PROD.dit)))
    assert shapes(params["control"]) == shapes(jax.eval_shape(
        lambda: dit_lib.init(key, PROD.dit, control=True)))
    assert shapes(params["vae"]) == shapes(jax.eval_shape(
        lambda: vae_lib.init(key, PROD.vae)))
    assert shapes(params["semantic"]) == shapes(jax.eval_shape(
        lambda: sc_lib.init(key, PROD.tokenizer, PROD.semantic_cond)))
    del params
    gc.collect()
