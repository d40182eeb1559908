"""Direct-execution oracle for the FULL Semantic1DLM sampling stack.

tests/test_reference_oracles.py pins the GPT backbone / RoPE blocks against
the actual reference modules; this module goes one level up and executes the
reference's ENTIRE stage-1 inference path — `Semantic1DLM.sample`
(landiff/llm/models/lm_model.py:293-516): tokenize/prompt assembly
(lm_model.py:175-276), video_frames_to_code_len (278-291), the structural
index-set construction (353-396), the CFG logit combine (425-429), the
constrained per-step masking (433-452), use_gt_first_frame (332-351),
teacher forcing (507-508) and predict_eos early exit (455-462) — and
asserts our `models/lm.py` (static schedule + one jitted while_loop)
produces IDENTICAL codes, with weights mapped through ckpt/convert.convert_llm
exactly as the real checkpoint path does.

The real TextCond / MicroConditioner (llm/modules/conditioner.py) run too;
only the frozen leaves not under test are stand-ins: the T5 text encoder
(we feed precomputed caption embeddings through
TextCond.forward_with_precomputed_embedding, the production path — the fake
supplies just `.dimension/.fwd_dtype/.max_length/tokenize_padded`) and the
frozen video tokenizer (duck-typed `vocab_size/segment_length/stride/
encode_codes` returning fixed codes; TiTok/VQ have their own direct oracles).

Determinism: the reference samples with torch.multinomial and ours with
jax.random.categorical — different RNGs — so token-level comparison runs at
temperature=1e-3, where the post-CFG softmax is one-hot to beyond float
precision and both samplers reduce to argmax. Both sides compute f32
(fwd_dtype=torch.float32 disables the reference's maybe_autocast); logits
agree to ~1e-4 (see the GPT oracle), far below typical argmax gaps on
random weights. MicroConditioner zero-inits its output MLPs
(conditioner.py:85-89) — the vacuous-pass trap — so those leaves are
randomized after construction.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from _ref_stubs import install as _install_stubs  # noqa: E402

_install_stubs()

lm_model = pytest.importorskip("landiff.llm.models.lm_model")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from landiff_tpu.ckpt import convert  # noqa: E402
from landiff_tpu.config import ARSampleConfig, tiny_test_config  # noqa: E402
from landiff_tpu.models import lm  # noqa: E402

T5_DIM = 32
N_TEXT = 5


class _FakeT5(torch.nn.Module):
    """Stand-in for FlanT5XXL: TextCond only reads these attributes on the
    precomputed-embedding path, plus tokenize_padded for
    forward_unconditional (conditioner.py:309-323)."""

    dimension = T5_DIM
    fwd_dtype = torch.float32
    max_length = 64

    def tokenize_padded(self, texts):
        n = len(texts)
        return types.SimpleNamespace(
            input_ids=torch.zeros(n, N_TEXT, dtype=torch.long),
            attention_mask=torch.ones(n, N_TEXT, dtype=torch.long))


class _StandinFrozenTokenizer(torch.nn.Module):
    """Duck-typed SemanticFrozenTokenizer (llm/modules/tokenizer.py:57-110):
    Semantic1DLM reads vocab_size()/segment_length/segment_stride and (for
    gt-first-frame / teacher forcing) encode_codes. Codes are a fixed seeded
    table so both sides consume identical ground truth."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.segment_length = cfg.frames_per_segment
        self.segment_stride = cfg.frames_per_segment
        self._rng = np.random.default_rng(7)

    def vocab_size(self):
        return self.cfg.codebook_size

    def gt_codes(self, num_frames):
        """Flattened per-segment raw codes for num_frames frames (the shape
        tokenize expects after its rearrange+cat, lm_model.py:159-161)."""
        cfg = self.cfg
        total = 0
        for off in range(0, num_frames, self.segment_stride):
            fl = min(off + self.segment_length, num_frames) - off
            total += cfg.iframe_len + (fl - 1) * cfg.pframe_len
        rng = np.random.default_rng(7)
        return rng.integers(0, cfg.codebook_size, size=total)

    def encode_codes(self, visual):
        codes = self.gt_codes(visual.shape[1])
        return [torch.from_numpy(codes[None, :].copy())]


def _build_ref_lm(cfg, seed=0):
    from landiff.llm.models.transformer import GPT
    from landiff.llm.modules.conditioner import MicroConditioner, TextCond
    from landiff.llm.modules.transformer_blocks import LlamaTransformerBlock
    from landiff.modules.pos_emb import Rope1DPosEmb

    torch.manual_seed(seed)
    blocks = [
        LlamaTransformerBlock(cfg.num_heads, cfg.hidden_size, cfg.mlp_hidden,
                              activation=torch.nn.GELU(approximate="tanh"))
        for _ in range(cfg.num_layers)
    ]
    rope = Rope1DPosEmb(dim=cfg.head_dim, max_len=cfg.rope.max_len,
                        device="cpu")
    gpt = GPT(cfg.vocab_size, cfg.hidden_size, blocks, causal=True,
              fwd_dtype=torch.float32, rope=rope)
    cond = TextCond(text_encoder=_FakeT5(), max_cond_tokens_num=64,
                    embed_dim=cfg.hidden_size, padding=False,
                    cfg_drop_prob=0.1, use_mlp_embeddings=True)
    micro = MicroConditioner(
        out_dim=cfg.hidden_size,
        frequency_embedding_size=cfg.micro_cond_embed_dim,
        crossattn_condition_keys=("frames", "motion_score"),
        defaults={"frames": 1, "motion_score": 0},
        fwd_dtype=torch.float32)
    # conditioner.py:85-89 zero-inits the output linears; randomize so the
    # micro-cond path actually contributes (the vacuous-pass trap)
    for key in micro.mlps:
        torch.nn.init.normal_(micro.mlps[key][2].weight, std=0.05)
        torch.nn.init.normal_(micro.mlps[key][2].bias, std=0.05)
    ref = lm_model.Semantic1DLM(
        tokenizer=_StandinFrozenTokenizer(cfg), cond_model=cond,
        transformer=gpt, micro_condition=micro,
        Iframe_len=cfg.iframe_len, Pframe_len=cfg.pframe_len,
        fwd_dtype=torch.float32).eval()
    return ref


def _jax_params(ref, cfg):
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = convert.convert_llm(sd, cfg.num_layers)
    return jax.tree.map(jnp.asarray, tree)


def _ctx_embedding():
    return (np.random.default_rng(3)
            .standard_normal((N_TEXT, T5_DIM)).astype(np.float32))


def _ref_inputs(nf, video=False, cfg=None):
    x = {"caption": ["a cat"],
         "caption_embedding": [torch.from_numpy(_ctx_embedding())],
         "frames": torch.tensor([float(nf)]),
         "motion_score": torch.tensor([0.3])}
    if video:
        x["video"] = [torch.zeros(nf, 3, 8, 8)]
    return x


def _ref_sample(ref, nf, **kw):
    with torch.no_grad():
        codes = ref.sample(_ref_inputs(nf, video=kw.pop("_video", False)),
                           temperature=1e-3, num_frames=nf, **kw)
    return np.asarray(codes)[0]


def _our_prompt_rows(params, cfg, nf, guidance, gt_codes=None):
    f32 = jnp.float32
    text = lm.text_cond_features(params, jnp.asarray(_ctx_embedding()), f32)
    micro = lm.micro_cond_features(
        params, cfg, {"frames": float(nf), "motion_score": 0.3}, f32)
    if gt_codes is None:
        cond = lm.assemble_prompt(params, cfg, text, micro, f32)
    else:
        cond = lm.assemble_prompt_with_gt_iframe(params, cfg, text, micro,
                                                 gt_codes, f32)
    if not guidance:
        return cond[None]
    null = lm.null_text_features(params, N_TEXT, f32)
    if gt_codes is None:
        uncond = lm.assemble_prompt(params, cfg, null, micro, f32)
    else:
        uncond = lm.assemble_prompt_with_gt_iframe(params, cfg, null, micro,
                                                   gt_codes, f32)
    return jnp.stack([cond, uncond])


def _our_sample(params, cfg, nf, cfg_scale, gt_codes=None,
                predict_eos=False, teacher_tokens=None, seed=0):
    rows = _our_prompt_rows(params, cfg, nf, cfg_scale > 0
                            and cfg_scale != 1, gt_codes)
    prefix = rows.shape[1]
    soi = (None if gt_codes is None
           else prefix - len(gt_codes) - 3)  # [SOI][gt I][EOI][SOP]
    sched = lm.build_schedule(cfg, prefix, nf, soi_index=soi)
    sc = ARSampleConfig(temperature=1e-3, top_k=0, top_p=1.0,
                        cfg_scale=cfg_scale, num_frames=nf)
    return lm.sample(params, cfg, sched, rows, sc,
                     rng_key=jax.random.PRNGKey(seed),
                     teacher_tokens=teacher_tokens,
                     predict_eos=predict_eos,
                     compute_dtype=jnp.float32, cache_dtype=jnp.float32)


@pytest.fixture(scope="module")
def built():
    cfg = tiny_test_config().llm
    ref = _build_ref_lm(cfg)
    return cfg, ref, _jax_params(ref, cfg)


def test_code_len_matches_reference(built):
    cfg, ref, _ = built
    for nf in range(1, 9):
        assert (lm.video_frames_to_code_len(cfg, nf)
                == ref.video_frames_to_code_len(nf)), nf


def test_cond_features_match_reference(built):
    """Feature-level pins (tightest comparison, no argmax regime):
    TextCond precomputed-embedding MLP path (conditioner.py:287-307), the
    null embedding NOT through the MLP (309-323), and the MicroConditioner
    crossattn stack (93-170)."""
    cfg, ref, params = built
    with torch.no_grad():
        want_text = ref.cond_model.forward_with_precomputed_embedding(
            [torch.from_numpy(_ctx_embedding())])[0].numpy()
        want_null = ref.cond_model.forward_unconditional(["a cat"])[0].numpy()
        _, want_micro = ref.micro_condition(
            {"caption": ["a cat"], "frames": torch.tensor([4.0]),
             "motion_score": torch.tensor([0.3])})
    got_text = np.asarray(lm.text_cond_features(
        params, jnp.asarray(_ctx_embedding()), jnp.float32))
    np.testing.assert_allclose(got_text, want_text, rtol=1e-5, atol=1e-5)
    got_null = np.asarray(lm.null_text_features(params, N_TEXT, jnp.float32))
    np.testing.assert_allclose(got_null, want_null, rtol=1e-6, atol=0)
    got_micro = np.asarray(lm.micro_cond_features(
        params, cfg, {"frames": 4.0, "motion_score": 0.3}, jnp.float32))
    np.testing.assert_allclose(got_micro, want_micro[0].numpy(),
                               rtol=1e-5, atol=1e-5)


def test_sample_no_guidance_matches_reference(built):
    cfg, ref, params = built
    nf = 2
    want = _ref_sample(ref, nf, guidance_scale=0.0)
    got = _our_sample(params, cfg, nf, cfg_scale=0.0)
    np.testing.assert_array_equal(got, want)


def test_sample_cfg_matches_reference(built):
    """CFG path across a segment boundary (nf=4 > frames_per_segment=3):
    rows [cond, uncond], uncond + scale*(cond - uncond) combine
    (lm_model.py:425-429), per-extra-segment SOI forcing."""
    cfg, ref, params = built
    nf = 4
    want = _ref_sample(ref, nf, guidance_scale=7.5)
    got = _our_sample(params, cfg, nf, cfg_scale=7.5)
    np.testing.assert_array_equal(got, want)


def test_sample_gt_first_frame_matches_reference(built):
    """use_gt_first_frame (lm_model.py:332-351): the ground-truth I-frame
    rides in the prompt; the reference's output prepends it
    (sampled_codes[0] = token slice) while ours returns only sampled codes."""
    cfg, ref, params = built
    nf = 3
    gt = ref.tokenizer.gt_codes(nf)
    want = _ref_sample(ref, nf, guidance_scale=7.5, use_gt_first_frame=True,
                       _video=True)
    np.testing.assert_array_equal(want[:cfg.iframe_len], gt[:cfg.iframe_len])
    got = _our_sample(params, cfg, nf, cfg_scale=7.5,
                      gt_codes=gt[:cfg.iframe_len])
    np.testing.assert_array_equal(got, want[cfg.iframe_len:])


def test_sample_teacher_forcing_matches_reference(built):
    """teacher_forcing=True (lm_model.py:507-508): the fed token is ground
    truth while SAMPLED tokens are still recorded — both sides walk the
    identical GT trajectory, so their argmax outputs must agree exactly.
    The teacher array is the reference's OWN tokenize() sequence, which also
    pins the full GT assembly (BOS/micro/cond/SOI + code blocks + EOS)."""
    from landiff.llm.modules.tokens import TokenSequence

    cfg, ref, params = built
    nf = 3
    with torch.no_grad():
        seqs, _, _ = ref.tokenize(_ref_inputs(nf, video=True))
        tokens, _, _ = TokenSequence.collate(seqs)
    teacher = np.asarray(tokens[0])
    want = _ref_sample(ref, nf, guidance_scale=0.0, teacher_forcing=True,
                       _video=True)
    got = _our_sample(params, cfg, nf, cfg_scale=0.0,
                      teacher_tokens=teacher)
    assert len(teacher) == lm.build_schedule(
        cfg, len(teacher) - lm.video_frames_to_code_len(cfg, nf) - 1 + 1,
        nf).full_len
    np.testing.assert_array_equal(got, want)


def test_sample_predict_eos_matches_reference(built):
    """predict_eos (lm_model.py:455-462): at eos-allowed structural
    positions both sides sample from the restricted {forced, EOS} set and
    stop early on EOS. Model seed 11 makes EOS the argmax at an allowed
    position (asserted), so the early exit itself is exercised, not just
    the full-length fallback."""
    cfg = tiny_test_config().llm
    ref = _build_ref_lm(cfg, seed=11)
    params = _jax_params(ref, cfg)
    nf = 7  # 3 segments -> eos-allowed positions at segments 2 and 3
    full = lm.video_frames_to_code_len(cfg, nf)
    want = _ref_sample(ref, nf, guidance_scale=0.0, predict_eos=True)
    got = _our_sample(params, cfg, nf, cfg_scale=0.0, predict_eos=True)
    np.testing.assert_array_equal(got, want)
    assert len(want) < full, "EOS never fired; pick a different model seed"
