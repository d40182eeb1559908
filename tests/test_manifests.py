"""Key-inventory tests: convert.py must consume EXACTLY the keys the
reference writes (manifests transcribed from the reference module
definitions) — no missing (KeyError), none unconsumed outside the
documented ignore sets. Unconsumed-key detection is the cheap canary for
state-dict layout drift (VERDICT r1 #3)."""

import numpy as np
import pytest

from landiff_tpu.ckpt import convert, manifests
from landiff_tpu.config import LanDiffConfig, tiny_test_config

CFG = tiny_test_config()
PROD = LanDiffConfig()


def zeros_sd(manifest):
    return {k: np.zeros(s, np.float32) for k, s in manifest.items()}


def _assert_consumed(unconsumed, ignored=()):
    bad = {k for k in unconsumed
           if not any(k.startswith(i) or i in k for i in ignored)}
    assert not bad, f"unconsumed keys (layout drift?): {sorted(bad)[:10]}"


def test_llm_manifest_fully_consumed():
    tree, unconsumed = convert.convert_tracked(
        lambda sd: convert.convert_llm(sd, CFG.llm.num_layers),
        zeros_sd(manifests.llm_safetensors(CFG.llm, t5_dim=24)))
    _assert_consumed(unconsumed)
    assert len(tree["gpt"]["blocks"]) == CFG.llm.num_layers


def test_tokenizer_manifest_fully_consumed():
    tree, unconsumed = convert.convert_tracked(
        convert.convert_tokenizer,
        zeros_sd(manifests.tokenizer_safetensors(CFG.tokenizer)))
    _assert_consumed(unconsumed, manifests.TOKENIZER_IGNORED)
    assert len(tree["encoder"]["blocks"]) == CFG.tokenizer.titok.num_layers
    assert "mean" in tree and "std" in tree


def test_dit_manifest_fully_consumed_main_and_control():
    import dataclasses

    tree, unconsumed = convert.convert_tracked(
        lambda sd: convert.convert_dit(sd, CFG.dit.num_layers),
        zeros_sd(manifests.dit_sat(CFG.dit)))
    _assert_consumed(unconsumed, manifests.DIT_IGNORED)
    assert "final" in tree

    ctrl_cfg = dataclasses.replace(CFG.dit,
                                   num_layers=CFG.dit.control_layers)
    tree, unconsumed = convert.convert_tracked(
        lambda sd: convert.convert_dit(sd, CFG.dit.control_layers,
                                       control=True),
        zeros_sd(manifests.dit_sat(ctrl_cfg, control=True)))
    _assert_consumed(unconsumed, manifests.DIT_IGNORED)
    assert "zero_linear_w" in tree["layers"][0]
    assert "final" not in tree  # EmptyFinalLayerMixin


def test_control_conversion_from_base_ckpt_leaves_only_known_keys():
    """Loading the 30-layer base sd into the 15-layer control net
    (strict=False semantics): unconsumed = deeper layers + final layer +
    the frozen pos table. The CONTROL manifest's zero_linears are absent
    from the base sd and stay random-init — mirrored by .get()."""
    base = zeros_sd(manifests.dit_sat(CFG.dit))
    n_ctrl = CFG.dit.control_layers
    tsd = convert.TrackedStateDict(base)
    # control conversion would KeyError on zero_linears (they're NOT in the
    # base ckpt); the loader overlays the LanDiff engine sd first, so here
    # just verify the expected missing key is exactly the zero linear
    with pytest.raises(KeyError, match="zero_linears"):
        convert.convert_dit(tsd, n_ctrl, control=True)


def test_semantic_cond_manifest_fully_consumed():
    tree, unconsumed = convert.convert_tracked(
        lambda sd: convert.convert_semantic_cond(
            sd, CFG.semantic_cond.num_res_blocks),
        zeros_sd(manifests.semantic_conditioner(CFG.semantic_cond,
                                                CFG.tokenizer)))
    _assert_consumed(unconsumed, manifests.TOKENIZER_IGNORED)
    assert "upsampler" in tree and "vq" in tree


def test_vae_manifest_fully_consumed():
    tree, unconsumed = convert.convert_tracked(
        lambda sd: convert.convert_vae(sd, CFG.vae.num_res_blocks,
                                       len(CFG.vae.ch_mult)),
        zeros_sd(manifests.vae_state_dict(CFG.vae)))
    _assert_consumed(unconsumed)
    assert len(tree["encoder"]["down"]) == len(CFG.vae.ch_mult)
    assert len(tree["decoder"]["up"]) == len(CFG.vae.ch_mult)


def test_engine_manifest_split_and_convert():
    """Full engine ckpt (control_model.* only — frozen parts are saved as
    None and dropped by load_torch_file) splits and converts cleanly."""
    sd = zeros_sd(manifests.engine_ckpt(CFG))
    parts = convert.split_engine_state(sd)
    assert not parts["main"]          # frozen main erased
    assert not parts["vae"] and not parts["t5"]
    sem = convert.convert_semantic_cond(parts["semantic"],
                                        CFG.semantic_cond.num_res_blocks)
    assert "conv_out_w" in sem
    ctrl_sd = {k: v for k, v in parts["control"].items()
               if not k.startswith("semantic_conditioner.")}
    tree, unconsumed = convert.convert_tracked(
        lambda s: convert.convert_dit(s, CFG.dit.control_layers,
                                      control=True), ctrl_sd)
    _assert_consumed(unconsumed, manifests.DIT_IGNORED)


def test_manifest_shapes_match_init_trees():
    """Converted zeros-trees must match init() pytree structure+shapes."""
    import jax

    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import lm as lm_lib
    from tests.test_convert import assert_tree_match

    got = convert.convert_llm(
        zeros_sd(manifests.llm_safetensors(CFG.llm, t5_dim=24)),
        CFG.llm.num_layers)
    want = lm_lib.init(jax.random.PRNGKey(0), CFG.llm, t5_dim=24)
    assert_tree_match(got, want)

    got = convert.convert_dit(zeros_sd(manifests.dit_sat(CFG.dit)),
                              CFG.dit.num_layers)
    want = dit_lib.init(jax.random.PRNGKey(0), CFG.dit)
    assert_tree_match(got, want)


def test_production_manifest_param_counts():
    """Pin the production-scale shape inventory without materializing
    arrays: total parameter counts must match the reference model sizes
    (SURVEY §6: LLM ~2B, DiT 2b ~1.7B, tokenizer ~0.2B, VAE ~0.2B)."""
    def count(m):
        return sum(int(np.prod(s)) for s in m.values())

    assert count(manifests.llm_safetensors(PROD.llm)) == 2_049_321_984
    assert count(manifests.dit_sat(PROD.dit)) == 1_727_913_792
    tok = count(manifests.tokenizer_safetensors(PROD.tokenizer))
    assert 170e6 < tok < 180e6, tok
    vae = count(manifests.vae_state_dict(PROD.vae))
    assert 210e6 < vae < 220e6, vae
    # engine = control (15L) + zero linears + semantic conditioner w/ VQ
    eng = count(manifests.engine_ckpt(PROD))
    assert 1.0e9 < eng < 1.3e9, eng


def test_verify_mode_on_synthetic_tree(tmp_path):
    """--verify end-to-end on a synthetic on-disk tree built FROM the
    manifests (tiny config): every present file reports ok with no
    missing/unconsumed/shape findings, and the torch layer-0 round-trip
    agrees."""
    import torch
    from safetensors.numpy import save_file

    root = tmp_path
    (root / "llm").mkdir()
    (root / "tokenizer").mkdir()
    rng = np.random.default_rng(0)

    def rand_sd(manifest):
        return {k: rng.standard_normal(s).astype(np.float32) * 0.1
                for k, s in manifest.items()}

    save_file(rand_sd(manifests.llm_safetensors(
        CFG.llm, t5_dim=CFG.t5.d_model)),
              str(root / "llm" / "model.safetensors"))
    save_file(rand_sd(manifests.tokenizer_safetensors(CFG.tokenizer)),
              str(root / "tokenizer" / "model.safetensors"))

    base = rand_sd(manifests.dit_sat(CFG.dit))
    # the real frozen pos table is the sincos table — write OURS so verify
    # reports ~0 diff (a real file validates our table against theirs)
    from landiff_tpu.models import dit as dit_lib

    pe = dit_lib.pos_embed_table(CFG.dit)
    base["mixins.pos_embed.pos_embedding"] = pe[None]
    p = root / "CogVideoX-2b-sat" / "transformer" / "1000"
    p.mkdir(parents=True)
    torch.save({"module": {"model." + k: torch.from_numpy(v)
                           for k, v in base.items()}},
               str(p / "mp_rank_00_model_states.pt"))

    eng = rand_sd(manifests.engine_ckpt(CFG))
    eng["model.diffusion_model.main_model.dummy_frozen"] = None  # erased
    p2 = root / "diffusion" / "1"
    p2.mkdir(parents=True)
    torch.save({"module": {k: (torch.from_numpy(v) if v is not None
                               else None) for k, v in eng.items()}},
               str(p2 / "mp_rank_00_model_states.pt"))

    vp = root / "CogVideoX-2b-sat" / "vae"
    vp.mkdir(parents=True)
    torch.save({"state_dict": {k: torch.from_numpy(v) for k, v in
                               rand_sd(manifests.vae_state_dict(
                                   CFG.vae)).items()}},
               str(vp / "3d-vae.pt"))

    report = convert.verify_ckpt_tree(root, CFG)
    for name, entry in report.items():
        assert entry["status"] == "ok", (name, entry)
        assert not entry.get("missing_vs_manifest"), (name, entry)
        assert not entry.get("shape_mismatch"), (name, entry)
        assert not entry.get("unconsumed_unexpected"), (name, entry)
    assert report["dit_base"]["pos_embed_max_abs_diff"] < 1e-6
    parity = report["dit_base"]["layer0_torch_parity"]
    assert isinstance(parity, float) and parity < 5e-4, parity