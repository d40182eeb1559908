"""Stage-1 LM: schedule parity vs a literal transcription of the reference
index-set builder (lm_model.py:353-396), code-length arithmetic, and an
end-to-end tiny sampling run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from landiff_tpu.config import ARSampleConfig, LLMConfig, Rope1DConfig
from landiff_tpu.models import lm

CFG = LLMConfig(hidden_size=32, num_layers=2, num_heads=2, mlp_hidden=64,
                codebook_size=16, iframe_len=6, pframe_len=2,
                frames_per_segment=3, cond_dim=32, micro_cond_embed_dim=16,
                rope=Rope1DConfig(dim=16, max_len=512))


def reference_sets(cfg, start_of_iframe_index, full_len, seg_len):
    """Literal transcription of the reference loop (the oracle)."""
    Iframe_len, Pframe_len = cfg.iframe_len, cfg.pframe_len
    Pframe_num = seg_len - 1
    s = dict(soi=set(), iframe=set(), pframe=set(), eoi=set(), sop=set(),
             eop=set(), eos=set())
    visual_block_len = Iframe_len + Pframe_num * Pframe_len + seg_len * 2
    for index in range(start_of_iframe_index, full_len - 1, visual_block_len):
        move_index = index
        s["soi"].add(move_index)
        move_index += 1
        s["iframe"].update(range(move_index + 1, move_index + 1 + Iframe_len))
        move_index += Iframe_len
        s["eoi"].add(move_index)
        move_index += 1
        if index > start_of_iframe_index:
            s["eos"].add(move_index)
        p_frame_end = min(full_len - 1,
                          move_index - 1 + Pframe_len * Pframe_num + 2 * Pframe_num)
        for j in range(move_index, p_frame_end, Pframe_len + 2):
            s["sop"].add(j)
            move_index += 1
            s["pframe"].update(range(j + 1, j + 1 + Pframe_len))
            move_index += Pframe_len
            s["eop"].add(j + Pframe_len + 1)
            move_index += 1
            if index > start_of_iframe_index:
                s["eos"].add(move_index)
    return s


@pytest.mark.parametrize("num_frames", [3, 6])
def test_schedule_matches_reference_sets(num_frames):
    prefix_len = 9
    sched = lm.build_schedule(CFG, prefix_len, num_frames)
    vocab = lm.Vocab(CFG.codebook_size)
    ref = reference_sets(CFG, prefix_len - 1, sched.full_len,
                         CFG.frames_per_segment)
    for i in range(prefix_len, sched.full_len):
        if i in ref["soi"]:
            assert sched.forced[i] == vocab.START_OF_IFRAME, i
        elif i in ref["eoi"]:
            assert sched.forced[i] == vocab.END_OF_IFRAME, i
        elif i in ref["sop"]:
            assert sched.forced[i] == vocab.START_OF_PFRAME, i
        elif i in ref["eop"]:
            assert sched.forced[i] == vocab.END_OF_PFRAME, i
        elif i == sched.full_len - 1:
            assert sched.forced[i] == vocab.EOS, i
        else:
            assert sched.forced[i] == -1, i
            assert sched.visual[i], i
    # visual token count invariant (lm_model.py:512-514)
    assert sched.num_visual == len(ref["iframe"]) + len(ref["pframe"])


def test_code_len_default_config():
    """13 frames -> 330 + 12*74 + 2*13 = 1244 (lm_model.py:278-291)."""
    full_cfg = LLMConfig()
    assert lm.video_frames_to_code_len(full_cfg, 13) == 1244
    # tiny config: 6 + 2*2 + 2*3 = 16 per segment
    assert lm.video_frames_to_code_len(CFG, 3) == 16
    assert lm.video_frames_to_code_len(CFG, 6) == 32


def test_sample_end_to_end_tiny():
    key = jax.random.PRNGKey(0)
    params = lm.init(key, CFG, t5_dim=24)
    text_feats = lm.text_cond_features(
        params, jnp.ones((5, 24)), compute_dtype=jnp.float32)
    micro = lm.micro_cond_features(
        params, CFG, {"frames": 3, "motion_score": 0.1},
        compute_dtype=jnp.float32)
    prompt = lm.assemble_prompt(params, CFG, text_feats, micro,
                                compute_dtype=jnp.float32)
    assert prompt.shape[0] == 1 + 2 + 5 + 1
    sched = lm.build_schedule(CFG, prompt.shape[0], num_frames=3)

    # CFG path: rows = [cond, uncond]
    null = lm.null_text_features(params, 5, compute_dtype=jnp.float32)
    prompt_uncond = lm.assemble_prompt(params, CFG, null, micro,
                                       compute_dtype=jnp.float32)
    rows = jnp.stack([prompt, prompt_uncond])
    codes = lm.sample(params, CFG, sched, rows,
                      ARSampleConfig(cfg_scale=2.0, temperature=1.0,
                                     num_frames=3),
                      rng_key=jax.random.PRNGKey(1),
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    assert codes.shape == (sched.num_visual,)
    assert codes.min() >= 0 and codes.max() < CFG.codebook_size


def test_sample_deterministic_given_key():
    key = jax.random.PRNGKey(0)
    params = lm.init(key, CFG, t5_dim=24)
    micro = lm.micro_cond_features(params, CFG,
                                   {"frames": 3, "motion_score": 0.1},
                                   compute_dtype=jnp.float32)
    text = lm.text_cond_features(params, jnp.ones((4, 24)),
                                 compute_dtype=jnp.float32)
    prompt = lm.assemble_prompt(params, CFG, text, micro,
                                compute_dtype=jnp.float32)[None]
    sched = lm.build_schedule(CFG, prompt.shape[1], num_frames=3)
    scfg = ARSampleConfig(cfg_scale=0.0, top_p=0.9, num_frames=3)
    a = lm.sample(params, CFG, sched, prompt, scfg,
                  rng_key=jax.random.PRNGKey(7), compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32)
    b = lm.sample(params, CFG, sched, prompt, scfg,
                  rng_key=jax.random.PRNGKey(7), compute_dtype=jnp.float32,
                  cache_dtype=jnp.float32)
    np.testing.assert_array_equal(a, b)


def test_teacher_forcing_feeds_gt():
    params = lm.init(jax.random.PRNGKey(0), CFG, t5_dim=24)
    micro = lm.micro_cond_features(params, CFG,
                                   {"frames": 3, "motion_score": 0.1},
                                   compute_dtype=jnp.float32)
    text = lm.text_cond_features(params, jnp.ones((4, 24)),
                                 compute_dtype=jnp.float32)
    prompt = lm.assemble_prompt(params, CFG, text, micro,
                                compute_dtype=jnp.float32)[None]
    sched = lm.build_schedule(CFG, prompt.shape[1], num_frames=3)
    teacher = np.asarray(sched.forced).copy()
    teacher[sched.visual] = 5
    scfg = ARSampleConfig(cfg_scale=0.0, num_frames=3)
    codes = lm.sample(params, CFG, sched, prompt, scfg,
                      rng_key=jax.random.PRNGKey(1),
                      teacher_tokens=teacher, compute_dtype=jnp.float32,
                      cache_dtype=jnp.float32)
    # sampled codes recorded (not the teacher), but run is deterministic
    assert codes.shape == (sched.num_visual,)


def test_predict_eos_early_stop():
    """Force EOS-favoring logits by zero temperature on a head biased to
    EOS: just verify the mechanism truncates output when EOS is hit."""
    params = lm.init(jax.random.PRNGKey(0), CFG, t5_dim=24)
    vocab = lm.Vocab(CFG.codebook_size)
    # bias the head so EOS wins everywhere
    head = np.zeros_like(np.asarray(params["gpt"]["head"]))
    head[:, vocab.EOS] = 0.0
    params = dict(params)
    gptp = dict(params["gpt"])
    bias_head = np.asarray(gptp["head"]).copy() * 0.0
    bias_head[:, vocab.EOS] = 10.0
    gptp["head"] = jnp.asarray(bias_head)
    params["gpt"] = gptp
    micro = lm.micro_cond_features(params, CFG,
                                   {"frames": 6, "motion_score": 0.1},
                                   compute_dtype=jnp.float32)
    text = lm.text_cond_features(params, jnp.ones((4, 24)),
                                 compute_dtype=jnp.float32)
    prompt = lm.assemble_prompt(params, CFG, text, micro,
                                compute_dtype=jnp.float32)[None]
    # 2 segments so allow_eos positions exist (only for blocks > first)
    sched = lm.build_schedule(CFG, prompt.shape[1],
                              num_frames=2 * CFG.frames_per_segment)
    scfg = ARSampleConfig(cfg_scale=0.0, temperature=1.0,
                          num_frames=2 * CFG.frames_per_segment)
    codes = lm.sample(params, CFG, sched, prompt, scfg,
                      rng_key=jax.random.PRNGKey(3), predict_eos=True,
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    assert codes.shape[0] < sched.num_visual  # stopped early
    # stops only at allowed positions (block boundaries after EOI/EOP of
    # blocks > 1): count must be first-block visual + whole sub-blocks
    first_block = sched.num_visual // 2
    assert codes.shape[0] >= first_block

    # the while_loop must EXIT at EOS (reference breaks the Python loop,
    # lm_model.py:455-462), not run to schedule end with masking: positions
    # beyond the stop are never executed, so forced structural slots there
    # keep their zero init instead of the forced ids (all >= codebook_size)
    st = lm._SampleStatic(
        cfg=CFG, prefix_len=sched.prefix_len, full_len=sched.full_len,
        temperature=scfg.temperature, top_k=scfg.top_k, top_p=scfg.top_p,
        guidance_scale=scfg.cfg_scale)
    out, stop = lm._sample_jit(
        params, prompt, jnp.asarray(sched.forced),
        jnp.asarray(sched.allow_eos),
        jnp.full((sched.full_len,), -1, jnp.int32),
        jax.random.PRNGKey(3), st, True, jnp.float32, jnp.float32)
    out, stop = np.asarray(out), int(stop)
    assert stop < sched.full_len - 1
    later_structural = (np.asarray(sched.forced) >= CFG.codebook_size)
    later_structural[: stop + 2] = False  # stop step itself still executes
    assert later_structural.any()
    assert (out[later_structural] == 0).all()


def test_gt_first_frame_sampling():
    """use_gt_first_frame: gt I-frame codes live in the prompt; sampling
    starts at the first P token and yields only non-I visual codes."""
    params = lm.init(jax.random.PRNGKey(0), CFG, t5_dim=24)
    micro = lm.micro_cond_features(params, CFG,
                                   {"frames": 3, "motion_score": 0.1},
                                   compute_dtype=jnp.float32)
    text = lm.text_cond_features(params, jnp.ones((4, 24)),
                                 compute_dtype=jnp.float32)
    gt_codes = np.arange(CFG.iframe_len) % CFG.codebook_size
    prompt = lm.assemble_prompt_with_gt_iframe(
        params, CFG, text, micro, gt_codes, compute_dtype=jnp.float32)[None]
    soi_index = 1 + 2 + 4  # BOS + micro x2 + text
    assert prompt.shape[1] == lm.gt_first_frame_prefix_len(CFG, soi_index)
    sched = lm.build_schedule(CFG, prompt.shape[1], num_frames=3,
                              soi_index=soi_index)
    codes = lm.sample(params, CFG, sched, prompt,
                      ARSampleConfig(cfg_scale=0.0, num_frames=3),
                      rng_key=jax.random.PRNGKey(1),
                      compute_dtype=jnp.float32, cache_dtype=jnp.float32)
    # sampled visual tokens = total visual minus the gt I-frame
    assert codes.shape[0] == sched.num_visual - CFG.iframe_len
    full = np.concatenate([gt_codes, codes])
    assert full.shape[0] == sched.num_visual
