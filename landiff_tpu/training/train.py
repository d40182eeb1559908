"""Unified training driver CLI — the training entry point the reference
does not ship (README.md:29 lists train code as TODO; SURVEY §7 step 10
"training enablement"). One driver for all three trainable components:

  python -m landiff_tpu.training.train --model dit --data DIR --steps 1000
  python -m landiff_tpu.training.train --model lm  --data DIR ...
  python -m landiff_tpu.training.train --model vq  --data DIR ...

  --model dit : stage-2 ControlNet branch (freeze_dit semantics,
                dit_video_concat.py:1190-1193) via
                training/diffusion_loss.make_train_step
  --model lm  : stage-1 GPT teacher forcing (lm_model.py:188-227) via
                training/lm_train.make_train_step
  --model vq  : semantic tokenizer VQ (video_titok_vq.py:279-375) via
                training/vq_train.make_train_step (EMA codebook + LitEma)

TPU-first execution model: ONE jitted SPMD step over a (data, model) mesh —
params TP-sharded by the regex rules in parallel/mesh.py, the global batch
DP-sharded over `data`, optimizer state ZeRO-sharded over `data`
(training/zero.py; XLA inserts the reduce-scatter/all-gather). No process
groups, no DeepSpeed: sharding constraints on the inputs are the whole
distribution story. Checkpoint/resume via orbax (training/checkpoint.py),
metrics as JSONL (observability.MetricsLogger).

Dataset format (data/loader.ShardedNpzDataset — dirs of .npz shards):
  dit: latents (N,T,C,H,W) f32, context (N,text_len,text_dim) f32,
       tokens (N,num_semantic) i32
  lm : t5_feats (N,n_text,t5_dim) f32, codes (N,num_visual) i32
  vq : features (N,T,h,w,C) f32   (Theia feature maps)

`--synth N` writes a synthetic dataset of N samples first (random tensors
with the exact production keys/shapes at the active config scale) — the
smoke path used by tests and for dry-running the full loop on the CPU mesh.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from landiff_tpu.config import LanDiffConfig, MeshConfig, tiny_test_config
from landiff_tpu.data import loader as data_lib
from landiff_tpu.observability import MetricsLogger
from landiff_tpu.parallel import mesh as mesh_lib
from landiff_tpu.training import checkpoint as ckpt_lib
from landiff_tpu.training import diffusion_loss, lm_train, vq_train, zero

logger = logging.getLogger("landiff_tpu.train")


parse_mesh = mesh_lib.parse_mesh  # moved to parallel/mesh.py (shared with
                                  # the inference CLI); kept as an alias


def make_optimizer(lr: float, steps: int, *, warmup: int = 100,
                   weight_decay: float = 1e-4, clip: float = 1.0,
                   grad_accum: int = 1):
    """AdamW + global-norm clip + warmup-cosine; `grad_accum` k>1 wraps the
    whole chain in optax.MultiSteps — the TPU-native equivalent of the
    reference's DeepSpeed `gradient_accumulation_steps`
    (diffusion/arguments.py:168-191): k micro-batch grads are averaged on
    device and applied as ONE update every k-th step (intermediate steps
    emit zero updates), so the effective batch is k× what fits in HBM.
    The LR schedule counts APPLIED updates (steps // k), matching
    DeepSpeed's semantics where scheduler.step() runs per optimizer step.
    MultiSteps' accumulator is a param-sized tree; under the ZeRO wrapper
    (zero_shard_opt_state's generic tree walk) it shards over `data` like
    every other large optimizer-state leaf."""
    if grad_accum > 1:
        steps = max(1, steps // grad_accum)
    wu = min(warmup, max(1, steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, wu, max(steps, wu + 1), lr * 0.1)
    opt = optax.chain(optax.clip_by_global_norm(clip),
                      optax.adamw(sched, weight_decay=weight_decay))
    if grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum)
    return opt


# ---------------------------------------------------------------------------
# synthetic datasets (production keys/shapes at the active config scale)


def synthesize(model: str, cfg: LanDiffConfig, n: int, out_dir: str,
               seed: int = 0, shard_size: int = 8):
    rng = np.random.default_rng(seed)
    d, t = cfg.dit, cfg.tokenizer
    if model == "dit":
        n_sem = t.titok.iframe_latent_tokens + \
            (t.titok.temporal_size - 1) * t.titok.pframe_latent_tokens
        data = {
            "latents": rng.standard_normal(
                (n, d.latent_frames, d.in_channels, d.latent_height,
                 d.latent_width), np.float32),
            "context": rng.standard_normal(
                (n, d.text_length, d.text_dim), np.float32),
            "tokens": rng.integers(0, t.vq.codebook_size,
                                   (n, n_sem), dtype=np.int32),
        }
    elif model == "lm":
        l = cfg.llm
        sched = _lm_schedule(cfg)
        data = {
            "t5_feats": rng.standard_normal((n, 8, cfg.t5.d_model),
                                            np.float32),
            "codes": rng.integers(0, l.codebook_size,
                                  (n, sched.num_visual), dtype=np.int32),
        }
    elif model == "vq":
        data = {
            "features": rng.standard_normal(
                (n, t.titok.temporal_size, t.titok.grid_h, t.titok.grid_w,
                 t.feature_dim), np.float32),
        }
    else:
        raise ValueError(model)
    return data_lib.write_npz_shards(data, out_dir, shard_size)


def _lm_schedule(cfg: LanDiffConfig):
    from landiff_tpu.models import lm as lm_lib

    # prefix: BOS + 2 micro + n_text + SOI (lm_model.py:188-204)
    return lm_lib.build_schedule(cfg.llm, 1 + 2 + 8 + 1,
                                 cfg.llm.frames_per_segment)


# ---------------------------------------------------------------------------
# per-model setup: (init_state, step_fn, batch_fn) triples


def _setup_dit(cfg: LanDiffConfig, optimizer, mesh, dtype):
    from landiff_tpu.models import dit as dit_lib
    from landiff_tpu.models import semantic_cond as sc_lib

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    main_p = mesh_lib.shard_params(
        dit_lib.init(k1, cfg.dit, dtype=dtype), mesh, mesh_lib.DIT_RULES)
    ctrl_p = mesh_lib.shard_params(
        dit_lib.init(k2, cfg.dit, control=True, dtype=dtype), mesh,
        mesh_lib.DIT_RULES)
    sem_p = sc_lib.init(k3, cfg.tokenizer, cfg.semantic_cond, dtype=dtype)
    opt_state, opt_sh = zero.zero_shard_opt_state(optimizer.init(ctrl_p),
                                                  mesh)
    if mesh.shape.get("time", 1) > 1 and mesh.shape.get("model", 1) == 1:
        # sequence-parallel training (--mesh data=D,time=N): token-sharded
        # ring-attention step — per-chip activations shrink to the 1/N
        # token shard (the long-video training lever); weights replicated,
        # so the DIT_RULES placement above degraded to replicated anyway
        raw = diffusion_loss.make_train_step_sp(
            optimizer, mesh, cfg.dit, cfg.sampler, cfg.tokenizer,
            cfg.semantic_cond, compute_dtype=dtype)
    else:
        raw = diffusion_loss.make_train_step(
            optimizer, cfg.dit, cfg.sampler, cfg.tokenizer,
            cfg.semantic_cond, compute_dtype=dtype)
    # pin the updated opt_state to its ZeRO shardings (zero.py contract) —
    # with donated buffers GSPMD propagation alone can silently degrade the
    # output to replicated on a real mesh; params/loss stay GSPMD-chosen
    step = jax.jit(raw, donate_argnums=(0, 1),
                   out_shardings=(None, opt_sh, None))
    bsh = NamedSharding(mesh, P("data"))

    def run(state, batch, key):
        ctrl_p, opt_state = state
        ctrl_p, opt_state, loss = step(
            ctrl_p, opt_state, main_p, sem_p, batch["latents"],
            batch["context"], batch["tokens"], key)
        return (ctrl_p, opt_state), {"loss": loss}

    return (ctrl_p, opt_state), run, bsh


def _setup_lm(cfg: LanDiffConfig, optimizer, mesh, dtype,
              cfg_drop_prob: float = 0.1,
              micro_drop_probs: dict | None = None):
    """Stage-1 step with the conditioners INSIDE the gradient (text proj,
    micro MLPs, token embeddings, null embeddings) and CFG conditioning
    dropout (TextCond cfg_drop_prob=0.1 per llm_cfg.py:60-62; optional
    per-key micro drop). The previous host-side prompt assembly computed
    conditioner features outside the jitted loss, so they never trained."""
    from landiff_tpu.models import lm as lm_lib

    params = mesh_lib.shard_params(
        lm_lib.init(jax.random.PRNGKey(0), cfg.llm, t5_dim=cfg.t5.d_model,
                    dtype=dtype, micro_drop_probs=micro_drop_probs),
        mesh, mesh_lib.GPT_RULES)
    opt_state, opt_sh = zero.zero_shard_opt_state(optimizer.init(params),
                                                  mesh)
    micro = {"frames": cfg.llm.frames_per_segment, "motion_score": 0.1}
    step = lm_train.make_cond_train_step(
        optimizer, cfg.llm, micro, cfg_drop_prob=cfg_drop_prob,
        micro_drop_probs=micro_drop_probs, compute_dtype=dtype,
        opt_shardings=opt_sh)
    bsh = NamedSharding(mesh, P("data"))

    def run(state, batch, key):
        params, opt_state = state
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(np.stack(batch["t5_feats"])),
            jnp.asarray(np.stack(batch["codes"])), key)
        return (params, opt_state), {"loss": loss}

    return (params, opt_state), run, bsh


def _setup_vq(cfg: LanDiffConfig, optimizer, mesh, dtype):
    from landiff_tpu.models import vq as vq_lib

    params = mesh_lib.shard_params(
        vq_lib.init(jax.random.PRNGKey(0), cfg.tokenizer, with_theia=False),
        mesh, mesh_lib.TITOK_RULES)
    opt_state = optimizer.init(params)
    cb_state = vq_train.init_codebook_state(cfg.tokenizer)
    step = vq_train.make_train_step(optimizer, cfg.tokenizer,
                                    compute_dtype=dtype)
    bsh = NamedSharding(mesh, P("data"))

    def run(state, batch, key):
        params, opt_state, cb_state, first = state
        feats = batch["features"]
        if first:
            # kmeans codebook init from the first batch
            _, aux = vq_train.tokenizer_loss(params, feats, cfg.tokenizer)
            params = dict(params)
            q = dict(params["quant"])
            q["codebook"] = vq_train.kmeans_init_codebook(
                aux["zin"], cfg.tokenizer.vq.codebook_size, key)
            params["quant"] = q
        params, opt_state, cb_state, metrics = step(params, opt_state,
                                                    cb_state, feats, key)
        return (params, opt_state, cb_state, False), metrics

    return (params, opt_state, cb_state, True), run, bsh


SETUPS = {"dit": _setup_dit, "lm": _setup_lm, "vq": _setup_vq}


# ---------------------------------------------------------------------------


def train(model: str, data_dir: str, *, steps: int = 100,
          batch_size: int = 2, lr: float = 1e-4, mesh_spec: str | None = None,
          ckpt_dir: str | None = None, save_every: int = 500,
          log_every: int = 10, metrics_path: str | None = None,
          resume: bool = False, tiny: bool = False, seed: int = 0,
          dtype=jnp.float32, grad_accum: int = 1):
    cfg = tiny_test_config() if tiny else LanDiffConfig()
    mesh = mesh_lib.make_mesh(parse_mesh(mesh_spec))
    optimizer = make_optimizer(lr, steps, grad_accum=grad_accum)
    state, run, batch_sharding = SETUPS[model](cfg, optimizer, mesh, dtype)
    logger.info("mesh %s, %d params leaves", dict(mesh.shape),
                len(jax.tree_util.tree_leaves(state[0])))

    start = 0
    if resume and ckpt_dir and Path(ckpt_dir).exists():
        try:
            # the FULL state tuple round-trips (vq carries cb_state and the
            # kmeans-init flag — restoring params alone would re-run the
            # kmeans init and wipe the trained codebook)
            template = {"params": state[0], "opt_state": state[1],
                        "extra": {"rest": list(state[2:])}}
            start, restored = ckpt_lib.restore_checkpoint(ckpt_dir,
                                                          template=template)
            # re-place every restored array: mesh-sharded leaves keep
            # their NamedSharding, everything else is replicated over the
            # mesh (orbax restores scalars single-device-committed, which
            # then fails jit device checks against sharded params)
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())

            def replace(t, r):
                if not hasattr(t, "sharding"):
                    return r
                s = t.sharding
                return jax.device_put(
                    r, s if isinstance(s, NamedSharding) else repl)

            restored = jax.tree_util.tree_map(replace, template, restored)
            state = (restored["params"], restored["opt_state"],
                     *restored["extra"]["rest"])
            # `start` counts completed steps; the loop index i is 0-based,
            # so resuming after saved step N continues at i = N (step N+1)
        except FileNotFoundError:
            pass

    ds = data_lib.ShardedNpzDataset(data_dir, batch_size, seed=seed)
    metrics = MetricsLogger(metrics_path)
    key = jax.random.PRNGKey(seed)

    def host_batches():
        epoch = 0
        while True:
            yield from ds.iter_epoch(epoch)
            epoch += 1

    hb = host_batches()
    # resume determinism: replay the data stream to the checkpoint cursor
    # (batches are seeded-shuffled, so skipping `start` host batches lands
    # exactly where the interrupted run was) ...
    for _ in range(start):
        next(hb)
    it = data_lib.prefetch_to_device(hb, sharding=batch_sharding)
    t0 = time.time()
    last = {}
    for i in range(start, steps):
        # ... and derive the step key from the step INDEX (fold_in, not
        # sequential splits) so a resumed run draws the same noise an
        # uninterrupted one would at the same step
        k_step = jax.random.fold_in(key, i)
        state, last = run(state, next(it), k_step)
        if (i + 1) % log_every == 0 or i + 1 == steps:
            row = {k: float(np.asarray(v)) for k, v in last.items()}
            dt = (time.time() - t0) / max(1, i + 1 - start)
            metrics.log(i + 1, sec_per_step=dt, **row)
            logger.info("step %d %s (%.3f s/step)", i + 1, row, dt)
        if ckpt_dir and ((i + 1) % save_every == 0 or i + 1 == steps):
            ckpt_lib.save_checkpoint(ckpt_dir, i + 1, state[0], state[1],
                                     extra={"rest": list(state[2:])})
    return state, last


def main(argv=None):
    import os

    # make JAX_PLATFORMS effective even where a site hook registers a
    # plugin backend eagerly (env alone is too late once jax initializes)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=sorted(SETUPS), required=True)
    ap.add_argument("--data", required=True, help=".npz shard dir")
    ap.add_argument("--synth", type=int, default=0,
                    help="write N synthetic samples to --data first")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--mesh", default=None, help="e.g. data=2,model=4")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--metrics", default=None, help="JSONL path")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="micro-batches per optimizer update "
                         "(DeepSpeed gradient_accumulation_steps)")
    args = ap.parse_args(argv)

    cfg = tiny_test_config() if args.tiny else LanDiffConfig()
    if args.synth:
        synthesize(args.model, cfg, args.synth, args.data, seed=args.seed)
    train(args.model, args.data, steps=args.steps,
          batch_size=args.batch_size, lr=args.lr, mesh_spec=args.mesh,
          ckpt_dir=args.ckpt_dir, save_every=args.save_every,
          log_every=args.log_every, metrics_path=args.metrics,
          resume=args.resume, tiny=args.tiny, seed=args.seed,
          dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
          grad_accum=args.grad_accum)


if __name__ == "__main__":
    main()
