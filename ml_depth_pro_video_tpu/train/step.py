"""Fine-tuning step for Depth Pro on TPU meshes.

The reference ships no training code (SURVEY.md: inference only); this
module adds the capability TPU-first: a jit/pjit-able train step with a
scale-invariant log-depth loss, optax AdamW, and DP(+TP) sharding via
GSPMD annotations. Used by ``__graft_entry__.dryrun_multichip`` to
validate the multi-chip path end-to-end.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core.precision import Precision
from ..models.depth_pro import DepthProConfig, forward
from ..parallel.mesh import batch_sharding
from ..parallel.sharding import shard_params


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def silog_loss(pred_inv_depth: jnp.ndarray, target_depth: jnp.ndarray,
               eps: float = 1e-6, lam: float = 0.85) -> jnp.ndarray:
    """Scale-invariant log loss (Eigen et al.) on depth derived from the
    predicted canonical inverse depth.

    Invalid target pixels — holes stored as 0/negative or NaN, ubiquitous
    in real depth maps — are masked out; without the mask a single hole
    contributes log(eps)^2 ≈ 190 to the loss (or NaNs the gradients)."""
    pred_depth = 1.0 / jnp.clip(pred_inv_depth, eps, 1e4)
    valid = jnp.isfinite(target_depth) & (target_depth > 0)
    target = jnp.where(valid, target_depth, 1.0)
    g = jnp.where(valid, jnp.log(jnp.clip(pred_depth, eps)) - jnp.log(target), 0.0)
    n = jnp.maximum(valid.sum(), 1)
    mean_g2 = jnp.sum(jnp.square(g)) / n
    mean_g = jnp.sum(g) / n
    return mean_g2 - lam * jnp.square(mean_g)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   warmup_steps: int = 0, total_steps: int | None = None,
                   clip_norm: float | None = 1.0,
                   grad_accum: int = 1) -> optax.GradientTransformation:
    """AdamW with optional global-norm clipping and a linear-warmup +
    cosine-decay schedule (``total_steps`` enables the schedule;
    without it the LR is constant).

    ``grad_accum > 1`` wraps the whole chain in ``optax.MultiSteps``:
    gradients average over k data batches before one parameter update —
    the standard way to reach a large effective batch on few chips
    (effective batch = batch_size × grad_accum). ``warmup_steps`` /
    ``total_steps`` stay in DATA batches; the schedule converts to
    applied-update counts internally."""
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if total_steps is not None:
        # the schedule advances once per APPLIED update, not per data
        # batch — convert (ceil, so any requested warmup survives
        # accumulation). The explicit warmup_steps is HONORED: 0 means
        # no warmup (plain cosine decay from the peak — forcing a
        # minimum of 1 wasted the first update at lr=0), and a warmup
        # that would swallow the whole run is truncated LOUDLY instead
        # of silently capped.
        import logging

        total_updates = max(total_steps // grad_accum, 1)
        warmup_updates = -(-max(warmup_steps, 0) // grad_accum)
        if warmup_updates >= total_updates:
            # floor 0, not 1: a 1-update run with any warmup would
            # evaluate its only update at schedule step 0 = lr 0.0
            # (params bit-identical to init); the warmup-free cosine
            # branch below handles warmup_updates == 0 at peak LR
            warmup_updates = max(total_updates - 1, 0)
            logging.getLogger(__name__).warning(
                "warmup_steps=%d covers the whole %d-update run; "
                "truncating warmup to %d updates so the schedule "
                "reaches (and decays from) the requested peak LR",
                warmup_steps, total_updates, warmup_updates)
        if warmup_updates == 0:
            lr = optax.cosine_decay_schedule(init_value=lr,
                                             decay_steps=total_updates)
        else:
            lr = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr,
                warmup_steps=warmup_updates,
                decay_steps=max(total_updates, warmup_updates + 1),
            )
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if clip_norm is not None:
        # clip the ACCUMULATED (averaged) gradient, not each microbatch:
        # inside MultiSteps the chain runs once per applied update
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def loss_fn(params, images, target_depth, cfg: DepthProConfig, precision: Precision,
            attn_impl: str | None = None):
    # rematerialize ViT blocks in the backward pass (1536px activations
    # don't fit otherwise); FOV head isn't part of the depth loss.
    # attn_impl doubles as the resblock routing: "xla" means "this is a
    # GSPMD program — no Mosaic kernels anywhere"
    canonical, _ = forward(params, images, cfg, precision,
                           attn_impl=attn_impl, compute_fov=False, remat=True,
                           conv_impl=attn_impl)
    return silog_loss(canonical[..., 0].astype(jnp.float32), target_depth)


def train_step(state: TrainState, images, target_depth, cfg: DepthProConfig,
               optimizer, precision: Precision = Precision.bf16(),
               attn_impl: str | None = None):
    """One SGD step. Donate ``state`` when jitting for in-place updates."""
    loss, grads = jax.value_and_grad(loss_fn)(state.params, images, target_depth,
                                              cfg, precision, attn_impl)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


def make_sharded_train_step(params, cfg: DepthProConfig, mesh, lr: float = 1e-4,
                            precision: Precision = Precision.bf16(),
                            tensor_parallel: bool = True,
                            warmup_steps: int = 0, total_steps: int | None = None,
                            clip_norm: float | None = 1.0,
                            grad_accum: int = 1):
    """Build (state, jitted step) with params TP-sharded and the batch
    DP-sharded over ``mesh``. Gradients reduce over dp automatically via
    GSPMD; TP all-reduces ride the tp axis. ``grad_accum`` averages
    gradients over that many data batches per parameter update
    (optax.MultiSteps; ``state.step`` still counts data batches)."""
    tp = mesh.shape.get("tp", 1)
    if tensor_parallel and tp > 1 and cfg.vit.num_heads % tp:
        # the head-contiguous qkv packing hands each tp shard WHOLE
        # heads (parallel/sharding.py); a non-divisor silently degrades
        # to gather-heavy GSPMD instead
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.vit.num_heads} "
            f"(e.g. the 'small' preset has 6 heads: use tp in (2, 3, 6))")
    optimizer = make_optimizer(lr, warmup_steps=warmup_steps,
                               total_steps=total_steps, clip_norm=clip_norm,
                               grad_accum=grad_accum)
    params = shard_params(params, mesh, tensor_parallel)
    # optimizer moments inherit the param shardings through init
    opt_state = optimizer.init(params)
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    data_sh = batch_sharding(mesh)

    # a Mosaic pallas_call is not GSPMD-auto-partitionable (the same
    # reason parallel/spmd.py wraps inference in shard_map) — force the
    # XLA attention AND resblock paths whenever this plain-jit step
    # actually spans multiple devices (loss_fn forwards attn_impl as
    # conv_impl too)
    attn_impl = "xla" if mesh.devices.size > 1 else None
    step = jax.jit(
        functools.partial(train_step, cfg=cfg, optimizer=optimizer,
                          precision=precision, attn_impl=attn_impl),
        in_shardings=(None, data_sh, data_sh),
        donate_argnums=(0,),
    )
    return state, step
