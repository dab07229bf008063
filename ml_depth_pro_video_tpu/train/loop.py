"""End-to-end fine-tuning loop: data -> sharded step -> checkpoints.

Composes the training subsystem (a capability the reference lacks —
SURVEY §1 notes "no training loop" — added TPU-first): `DepthDataset`
host feed, the DP×TP `make_sharded_train_step`, orbax TrainState
checkpointing with resume, and periodic validation on a held-out slice.

Library entry: ``fit(...)``. CLI: ``depth-pro-train`` /
``python -m ml_depth_pro_video_tpu.train.loop``.
"""

from __future__ import annotations

import argparse
import functools as _functools
import json
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.checkpointing import restore_train_state, save_train_state
from ..core.precision import Precision
from ..models.depth_pro import DEFAULT_MONODEPTH_CONFIG, DepthProConfig, init_depth_pro, load_checkpoint
from ..parallel.mesh import batch_sharding, make_mesh
from .data import DepthDataset
from .step import make_sharded_train_step

log = logging.getLogger(__name__)


def fit(
    data_root: str,
    cfg: DepthProConfig = DEFAULT_MONODEPTH_CONFIG,
    batch_size: int = 8,
    epochs: int = 1,
    lr: float = 1e-4,
    warmup_steps: int = 100,
    clip_norm: float = 1.0,
    tp: int = 1,
    precision: Precision | None = None,
    checkpoint_dir: str | None = None,
    save_every: int = 500,
    holdout: int = 0,
    log_every: int = 10,
    seed: int = 0,
    dp: int | None = None,
    pp: int = 1,
    microbatches: int = 5,
    metrics_file: str | None = None,
    grad_accum: int = 1,
):
    """Fine-tune Depth Pro on a directory of (image, depth) pairs.

    Returns the final TrainState. ``holdout`` reserves that many pairs
    for validation (SILog on the canonical head, reported at every
    checkpoint). Resumes from ``checkpoint_dir`` when it has a step.
    ``pp > 1`` pipelines the ViT depth GPipe-style over a (dp, pp) mesh
    (`parallel/pipeline.py`) instead of DP×TP; ``microbatches`` sets
    the pipeline's microbatch count (must divide 35 × batch/dp — the
    default 5 always does). ``grad_accum > 1`` averages gradients over
    that many data batches per parameter update (effective batch =
    ``batch_size × grad_accum`` at the memory of one batch; DP×TP path
    only — the GPipe path already microbatches).

    Multi-host: after ``parallel.multihost.initialize()`` this same
    function runs unmodified on every host of a pod slice — the mesh is
    global, each host decodes only its own rows of every (seeded,
    identical) shuffled batch, ONE SPMD step spans the pod, and orbax
    checkpointing coordinates the distributed save. ``batch_size`` is
    the GLOBAL batch. Requires a shared data/checkpoint filesystem.

    ``metrics_file`` appends one JSON line per logged step
    (``{"step", "loss", "lr_progress", "s_per_step"}``; validation
    rounds add ``{"step", "val_silog"}``) so runs are plottable and
    comparable after the fact — the reference has no training at all,
    and log-scraping is not an interface. Primary-only on pods; the
    file appends across resumes (the step field orders everything).
    """
    precision = precision or Precision.bf16()
    # warm restarts (resume after preemption — the pod norm) re-read the
    # compiled train step from the persistent cache instead of re-paying
    # the full-dims XLA compile in every process
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if pp > 1:
        if tp > 1:
            raise ValueError("pp and tp cannot be combined (pick one of "
                             "the ViT sharding modes)")
        if grad_accum > 1:
            raise ValueError("grad_accum applies to the DPxTP step; the "
                             "GPipe path already microbatches (use "
                             "--microbatches)")
        from ..parallel.pipeline import make_pp_mesh

        n_dev = len(jax.devices())
        if pp > n_dev:
            raise ValueError(f"pp={pp} needs at least {pp} devices, have "
                             f"{n_dev}")
        # dp=0 would build an empty mesh and die later with an opaque
        # ZeroDivisionError; max(..., 1) keeps pp == n_dev meaning dp=1
        mesh = make_pp_mesh(dp=dp or max(n_dev // pp, 1), pp=pp)
    else:
        mesh = make_mesh(dp=dp, tp=tp)
    from ..parallel.mesh import round_batch_to_dp

    batch_size = round_batch_to_dp(batch_size, mesh)

    dataset = DepthDataset(data_root, cfg.img_size, seed=seed)
    val_pairs = dataset.pairs[:holdout]
    dataset.pairs = dataset.pairs[holdout:]
    steps_per_epoch = len(dataset) // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"{len(dataset)} training pairs (after holdout={holdout}) is fewer "
            f"than batch_size={batch_size}: no full batch to train on"
        )
    total_steps = steps_per_epoch * epochs

    params = load_checkpoint(cfg)
    if params is None:
        log.warning("no model checkpoint (%s); training from random init", cfg.checkpoint_uri)
        params = init_depth_pro(jax.random.PRNGKey(seed), cfg)
    if pp > 1:
        from ..parallel.pipeline import make_pp_train_step

        state, step_fn = make_pp_train_step(
            params, cfg, mesh, microbatches=microbatches, lr=lr,
            precision=precision, warmup_steps=warmup_steps,
            total_steps=total_steps, clip_norm=clip_norm,
        )
    else:
        state, step_fn = make_sharded_train_step(
            params, cfg, mesh, lr=lr, precision=precision, tensor_parallel=tp > 1,
            warmup_steps=warmup_steps, total_steps=total_steps, clip_norm=clip_norm,
            grad_accum=grad_accum,
        )
    if checkpoint_dir:
        restored = restore_train_state(checkpoint_dir, state)
        if restored is not None:
            state = restored
            log.info("resumed from %s at step %d", checkpoint_dir, int(state.step))

    data_sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        from ..parallel import multihost as mh

        rows = mh.local_rows(data_sh, (batch_size, 1, 1, 1))
        batch_kw = dict(
            local_rows=rows,
            assemble=lambda a: mh.global_batch(data_sh, a, batch_size))
        log.info("multi-host fit: host %d/%d decodes %d/%d batch rows",
                 jax.process_index(), jax.process_count(), len(rows),
                 batch_size)
    else:
        batch_kw = dict(sharding=data_sh)
    start = int(state.step)
    losses: list[float] = []
    last_val_step = -1
    t0 = time.perf_counter()

    def emit_metrics(record: dict) -> None:
        # append-only JSONL; primary-only so pod hosts don't interleave
        if metrics_file is None or jax.process_index() != 0:
            return
        try:
            with open(metrics_file, "a") as f:
                json.dump(record, f)
                f.write("\n")
        except OSError as exc:
            log.warning("could not append %s: %s", metrics_file, exc)
    # resume: skip already-trained batches without decoding them — the
    # shuffle permutations are still consumed, so the stream position
    # matches the saved step deterministically
    for images, depth in dataset.batches(batch_size, epochs=epochs,
                                         skip=start, **batch_kw):
        state, loss = step_fn(state, images, depth)
        losses.append(float(loss))
        step = int(state.step)
        if step % log_every == 0:
            dt = (time.perf_counter() - t0) / max(len(losses), 1)
            mean_loss = float(np.mean(losses[-log_every:]))
            log.info("step %d/%d loss %.4f (%.2f s/step)", step, total_steps,
                     mean_loss, dt)
            emit_metrics({"step": step, "loss": mean_loss,
                          "lr_progress": step / max(total_steps, 1),
                          "s_per_step": round(dt, 4)})
        if checkpoint_dir and step % save_every == 0:
            save_train_state(checkpoint_dir, state)
            if val_pairs:
                v = _validate(state.params, val_pairs, cfg, precision,
                              batch_size, mesh)
                log.info("step %d val_silog %.4f", step, v)
                emit_metrics({"step": step, "val_silog": v})
                last_val_step = step
    if checkpoint_dir:
        save_train_state(checkpoint_dir, state)
    # skip the final validation when the last checkpoint round already
    # validated this exact step (short runs doubled the row/log)
    if val_pairs and last_val_step != int(state.step):
        v = _validate(state.params, val_pairs, cfg, precision, batch_size, mesh)
        log.info("final val_silog %.4f", v)
        emit_metrics({"step": int(state.step), "val_silog": v})
    return state


@_functools.lru_cache(maxsize=4)
def _jitted_loss(cfg, precision, attn_impl, mesh=None):
    from .step import loss_fn

    # returns (silog, any_valid_pixel): the validity flag is computed
    # IN-PROGRAM so _validate's exclude-empty-batch decision never turns
    # into host-side control flow that can diverge across a pod (a
    # transient decode failure on ONE host zero-substitutes that host's
    # copy only; skipping the call there while the others execute it
    # desyncs the collective program — the exact hazard zero_substitute
    # exists to prevent)
    def val_loss(params, images, depth):
        return (loss_fn(params, images, depth, cfg=cfg, precision=precision,
                        attn_impl=attn_impl),
                jnp.any(depth > 0))

    # cached so repeated validation rounds reuse one compiled program
    # (Precision and DepthProConfig are frozen/hashable dataclasses).
    # Multi-host: host-local val batches cannot mix with mesh-global
    # params in one program — pin the inputs replicated over the global
    # mesh (every host feeds the identical val pairs, so the implied
    # same-value-on-all-hosts contract holds).
    kw = {}
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        kw = dict(in_shardings=(None, rep, rep))
    return jax.jit(val_loss, **kw)


def _validate(params, pairs, cfg, precision, batch_size, mesh=None) -> float:
    # unsharded host batches: validation batches may not divide dp.
    # Multi-device params force the XLA attention path, mirroring
    # make_sharded_train_step (pallas_call is not GSPMD-partitionable —
    # a Pallas-compiled validation program would fail on mesh-resident
    # params at the FIRST checkpoint, hours into a run)
    attn_impl = "xla" if mesh is not None and mesh.devices.size > 1 else None
    jitted = _jitted_loss(cfg, precision, attn_impl, mesh)
    ds = DepthDataset.__new__(DepthDataset)
    ds.image_size = cfg.img_size
    ds.pairs = pairs
    ds.rng = np.random.default_rng(0)
    # zero_substitute keeps batch composition deterministic, but a batch
    # with NO valid pixels (every pair unreadable) returns an exact-0.0
    # silog — averaging that in would drag val_silog optimistically
    # toward 0, so such batches are excluded from the mean. The validity
    # flag comes back FROM the jitted program (see _jitted_loss): every
    # host executes the identical call sequence, so a decode failure on
    # one pod host can never skip a collective invocation there
    vals = []
    for images, depth in ds.batches(batch_size, epochs=1,
                                    drop_remainder=False,
                                    zero_substitute=True):
        v, ok = jitted(params, images, depth)
        if bool(ok):
            vals.append(float(v))
    return float(np.mean(vals)) if vals else float("nan")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Fine-tune Depth Pro (TPU, DPxTP)")
    ap.add_argument("--data_root", required=True,
                    help="directory of image + <stem>_depth.npy pairs")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup_steps", type=int, default=100)
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel degree (GPipe over the ViT "
                         "depth; exclusive with --tp)")
    ap.add_argument("--microbatches", type=int, default=5,
                    help="GPipe microbatch count (pp > 1)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="average gradients over this many data batches "
                         "per parameter update (effective batch = "
                         "batch_size x grad_accum; memory of one batch)")
    ap.add_argument("--checkpoint_dir", default=None)
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--holdout", type=int, default=0)
    ap.add_argument("--metrics_file", default=None,
                    help="append one JSON line per logged step "
                         "(loss/val_silog/s_per_step) for post-hoc "
                         "plotting; primary-only on pods")
    ap.add_argument("--log_every", type=int, default=10,
                    help="steps between loss log lines / metrics rows")
    ap.add_argument("--tiny", action="store_true",
                    help="miniature model config (smoke tests / CI)")
    from ..models.depth_pro import MODEL_PRESETS as _MP
    ap.add_argument("--model", choices=list(_MP), default="large",
                    help="model family member to train "
                         "(models/depth_pro.py::model_preset)")
    from ..parallel.multihost import add_multihost_args, initialize_from_args
    add_multihost_args(ap)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    initialize_from_args(args)  # before any device use (no-op single-host)
    from ..models.depth_pro import model_preset

    cfg = model_preset("tiny" if args.tiny else args.model)
    fit(args.data_root, cfg, batch_size=args.batch_size, epochs=args.epochs,
        lr=args.lr, warmup_steps=args.warmup_steps, tp=args.tp,
        checkpoint_dir=args.checkpoint_dir, save_every=args.save_every,
        holdout=args.holdout, pp=args.pp, microbatches=args.microbatches,
        metrics_file=args.metrics_file, log_every=args.log_every,
        grad_accum=args.grad_accum)


if __name__ == "__main__":  # pragma: no cover
    main()
