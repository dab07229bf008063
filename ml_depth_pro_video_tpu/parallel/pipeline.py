"""GPipe-style PIPELINE parallelism (pp) for the ViT trunk.

The other sharding modes cover throughput (dp — parallel/spmd.py),
intra-layer scaling (tp — parallel/sharding.py) and single-frame
latency (sp — parallel/latency.py). This module adds the fourth
classic axis: the 24 stacked ViT blocks are sharded ALONG DEPTH over a
``pp`` mesh axis — each device holds ``depth/pp`` blocks (a real
per-chip parameter + optimizer-moment memory saving for training) and
microbatches stream through the stages via ``jax.lax.ppermute``
neighbor hops on ICI. No all-reduce ever touches the trunk weights.

Schedule — classic GPipe (Huang et al. 2019), expressed as a
``lax.scan`` over ``T = M + pp - 1`` ticks inside one ``shard_map``:
at tick ``t`` stage ``s`` runs microbatch ``t - s`` through its local
blocks; stage 0 injects microbatch ``t`` while ``t < M``, stage
``pp-1`` banks a finished microbatch from tick ``pp-1`` on, and the
DPT hook captures (reference forward hooks on blocks {5, 11},
`/root/reference/src/depth_pro/network/encoder.py:132-144`) are banked
by whichever stage owns that block. One ``(mb, S, D)`` ppermute per
tick is the only cross-stage traffic. Trunk bubble fraction =
``(pp-1) / (M + pp-1)``.

Honest scope notes:
- The non-ViT parts (patch embed, image ViT, decoder, head, loss) run
  REPLICATED across pp — their compute is ~1/3 of the frame and the
  pipeline would gain nothing by sharding convs along depth. Each such
  param's gradient is nonzero on exactly one stage (its consumption is
  stage-masked), so a ``psum`` over pp reconstitutes it; the trunk
  block gradients stay sharded, exactly like the params.
- Exact path only: the ToMe merge tier changes the token count
  mid-trunk, which would re-shape the pipeline state — merge + pp is
  rejected at build time.
- dp composes: the mesh is ``(dp, pp)``; the batch is sharded over dp
  and each dp replica runs its own pipeline. Gradients psum over dp as
  usual.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.precision import Precision
from ..models.depth_pro import DepthProConfig, forward
from ..models.vit import ViTConfig, _block, layer_norm, patchify


def make_pp_mesh(dp: int = 1, pp: int = 2, devices=None) -> Mesh:
    """A (dp, pp) mesh; pp is the pipeline-stage axis."""
    devices = devices if devices is not None else jax.devices()
    if dp * pp > len(devices):
        raise ValueError(f"mesh {dp}x{pp} needs {dp * pp} devices, "
                         f"have {len(devices)}")
    grid = np.asarray(devices[: dp * pp]).reshape(dp, pp)
    return Mesh(grid, ("dp", "pp"))


def pipeline_blocks(tokens: jnp.ndarray, blocks_local: dict, cfg: ViTConfig,
                    *, pp: int, microbatches: int,
                    capture_blocks=(), attn_impl: str | None = None,
                    remat: bool = False, axis: str = "pp"):
    """Run the block trunk as a GPipe pipeline. MUST be called inside a
    ``shard_map`` over ``axis`` with ``blocks_local`` holding this
    stage's slice (leading axis ``depth // pp``) of the stacked params.

    tokens: (N, S, D) full (replicated) token batch; N % microbatches
    == 0. Returns ``(out (N, S, D), [captures (N, S, D)])``, both
    psum-broadcast so every stage holds the full result.
    """
    n, s, d = tokens.shape
    m_count = microbatches
    assert n % m_count == 0, f"microbatches {m_count} must divide batch {n}"
    mb = n // m_count
    l_local = blocks_local["ln1_g"].shape[0]
    p_idx = jax.lax.axis_index(axis)

    # static stage/offset of each capture (global block idx -> shard)
    caps = [(c // l_local, c % l_local) for c in capture_blocks]
    for c in capture_blocks:
        assert 0 <= c < pp * l_local, f"capture block {c} out of range"

    block = _block
    if remat:
        block = jax.checkpoint(_block, static_argnums=(2, 3))

    def run_local(x):
        def body(carry, bp):
            y = block(carry, bp, cfg, attn_impl, None)
            return y, y

        y, ys = jax.lax.scan(body, x, blocks_local)
        return y, ys  # ys: (l_local, mb, s, d) per-block outputs

    xs = tokens.reshape(m_count, mb, s, d)
    state0 = jnp.zeros((mb, s, d), tokens.dtype)
    out0 = jnp.zeros((m_count, mb, s, d), tokens.dtype)
    caps0 = [jnp.zeros((m_count, mb, s, d), tokens.dtype) for _ in caps]
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def tick(carry, t):
        state, out_buf, cap_bufs = carry
        # stage 0 swallows a fresh microbatch while any remain; during
        # the drain ticks it chews on (ignored) stale state
        inject = xs[jnp.clip(t, 0, m_count - 1)]
        state = jnp.where((p_idx == 0) & (t < m_count), inject, state)
        y, ys = run_local(state)
        m_here = t - p_idx  # which microbatch this stage just advanced
        valid = (m_here >= 0) & (m_here < m_count)
        idx = jnp.clip(m_here, 0, m_count - 1)
        cap_bufs = [
            buf.at[idx].set(jnp.where((p_idx == cs) & valid, ys[cl], buf[idx]))
            for buf, (cs, cl) in zip(cap_bufs, caps)
        ]
        out_buf = out_buf.at[idx].set(
            jnp.where((p_idx == pp - 1) & valid, y, out_buf[idx]))
        state = jax.lax.ppermute(y, axis, perm)
        return (state, out_buf, cap_bufs), None

    (_, out_buf, cap_bufs), _ = jax.lax.scan(
        tick, (state0, out0, caps0), jnp.arange(m_count + pp - 1))

    # bank buffers live on one stage each (zeros elsewhere): one psum
    # broadcasts them everywhere; cotangents route back to the owning
    # stage through the zeros
    out = jax.lax.psum(out_buf, axis).reshape(n, s, d)
    captures = [jax.lax.psum(b, axis).reshape(n, s, d) for b in cap_bufs]
    return out, captures


def pp_vit_apply(params: dict, x: jnp.ndarray, cfg: ViTConfig,
                 precision: Precision, *, pp: int, microbatches: int,
                 capture_blocks=(), attn_impl: str | None = None,
                 remat: bool = False):
    """``models.vit.vit_apply`` with the trunk pipelined (shard_map-local;
    ``params['blocks']`` leaves carry this stage's depth slice). The
    embed/final-norm epilogue runs replicated — consumed downstream
    through stage-masked banks, so gradients land on one stage only."""
    cdt = precision.compute_dtype
    b = x.shape[0]
    tokens = patchify(x.astype(cdt), cfg.patch_size)
    tokens = jnp.dot(tokens, params["patch_embed"]["w"].astype(cdt),
                     preferred_element_type=cdt)
    tokens = tokens + params["patch_embed"]["b"].astype(cdt)
    cls = jnp.broadcast_to(params["cls_token"].astype(cdt), (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embed"].astype(cdt)

    tokens, captures = pipeline_blocks(
        tokens, params["blocks"], cfg, pp=pp, microbatches=microbatches,
        capture_blocks=capture_blocks, attn_impl=attn_impl, remat=remat)
    tokens = layer_norm(tokens, params["norm"]["g"], params["norm"]["b"],
                        cfg.layer_norm_eps)
    return tokens, captures


def _param_specs(params: dict) -> dict:
    """PartitionSpec tree: patch-ViT stacked blocks sharded over pp on
    the depth axis, everything else replicated."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["encoder"]["patch_vit"]["blocks"] = jax.tree.map(
        lambda _: P("pp"), params["encoder"]["patch_vit"]["blocks"])
    return specs


def shard_pp_params(params: dict, mesh: Mesh) -> dict:
    """Place params: trunk blocks split over pp, rest replicated."""
    return jax.tree.map(
        lambda p, spec: jax.device_put(p, NamedSharding(mesh, spec)),
        params, _param_specs(params))


def make_pp_train_step(params: dict, cfg: DepthProConfig, mesh: Mesh,
                       microbatches: int = 5, lr: float = 1e-4,
                       precision: Precision = Precision.bf16(),
                       warmup_steps: int = 0, total_steps: int | None = None,
                       clip_norm: float | None = 1.0, optimizer=None):
    """Build ``(state, jitted step)`` with the patch-ViT trunk
    pipeline-parallel over ``mesh``'s pp axis and the batch sharded over
    dp. Step signature matches ``train.step.make_sharded_train_step``:
    ``step(state, images, depth) -> (state, loss)``.

    The global batch must be divisible by dp, and 35 * (batch/dp) by
    ``microbatches``; ``cfg.vit.depth`` by the pp size. Token merging is
    incompatible with the fixed pipeline state shape. ``optimizer``
    overrides the default AdamW chain (then lr/warmup/clip are ignored;
    the gradient-parity test uses plain SGD so Adam's per-element
    normalization cannot mask scaling errors)."""
    from ..train.step import TrainState, make_optimizer

    if cfg.token_merge_ratio > 0:
        raise ValueError("pipeline parallelism requires the exact path "
                         "(token_merge_ratio == 0)")
    pp = mesh.shape["pp"]
    if cfg.vit.depth % pp:
        raise ValueError(f"ViT depth {cfg.vit.depth} not divisible by pp={pp}")

    if optimizer is None:
        optimizer = make_optimizer(lr, warmup_steps=warmup_steps,
                                   total_steps=total_steps, clip_norm=clip_norm)
    specs = _param_specs(params)
    if any(isinstance(l, jax.ShapeDtypeStruct) for l in jax.tree.leaves(params)):
        # ABSTRACT mode (AOT compile certification): attach the pp
        # shardings to the avals and eval_shape the optimizer state —
        # the returned step can be .lower()ed/compiled but not run.
        # Stateless optimizers (sgd) keep opt_state array-free; stateful
        # ones would need concrete init for correct moment shardings.
        params = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(
                a.shape, a.dtype, sharding=NamedSharding(mesh, s)),
            params, specs)
        opt_state = jax.eval_shape(optimizer.init, params)
        step0 = jax.ShapeDtypeStruct((), jnp.int32)
    else:
        params = shard_pp_params(params, mesh)
        opt_state = optimizer.init(params)  # moments inherit the shardings
        step0 = jnp.zeros((), jnp.int32)
    state = TrainState(params, opt_state, step0)

    def global_silog(pred_inv_depth, target_depth, eps=1e-6, lam=0.85):
        """``train.step.silog_loss`` with the batch-mean reductions
        psum'd over dp — per-shard silog then averaging would square
        per-shard means instead of the global mean (the lam term is not
        linear in the batch split), so the per-shard loss must reduce
        globally to reproduce the single-device value exactly."""
        pred_depth = 1.0 / jnp.clip(pred_inv_depth, eps, 1e4)
        valid = jnp.isfinite(target_depth) & (target_depth > 0)
        target = jnp.where(valid, target_depth, 1.0)
        g = jnp.where(valid,
                      jnp.log(jnp.clip(pred_depth, eps)) - jnp.log(target), 0.0)
        n = jnp.maximum(jax.lax.psum(valid.sum(), "dp"), 1)
        mean_g2 = jax.lax.psum(jnp.sum(jnp.square(g)), "dp") / n
        mean_g = jax.lax.psum(jnp.sum(g), "dp") / n
        return mean_g2 - lam * jnp.square(mean_g)

    def local_loss(p, images, depth):
        def patch_vit_fn(vp, pyramid):
            t, caps = pp_vit_apply(
                vp, pyramid, cfg.vit, precision, pp=pp,
                microbatches=microbatches,
                capture_blocks=cfg.hook_block_ids, remat=True)
            return t, tuple(caps)

        canonical, _ = forward(p, images, cfg, precision, compute_fov=False,
                               remat=True, patch_vit_fn=patch_vit_fn)
        loss = global_silog(canonical[..., 0].astype(jnp.float32), depth)
        # PARTIAL per-device loss: summed over every device it equals
        # the global loss exactly once (the last stage of each dp
        # column, divided by dp). Differentiating a psum-REPLICATED
        # scalar instead would seed one cotangent per device under
        # check_vma=False and scale every gradient by dp*pp (measured:
        # exactly 4x on a 2x2 mesh). Masking all but the last stage
        # also pins each replicated param's gradient to exactly one
        # stage per dp column, so the psums below are exact totals.
        part = jnp.where(jax.lax.axis_index("pp") == pp - 1, loss, 0.0)
        return part / mesh.shape["dp"]

    def local_grad(p, images, depth):
        part, grads = jax.value_and_grad(local_loss)(p, images, depth)
        # the loss is already globally normalized (1/n_total inside), so
        # totals are plain psums; trunk-block grads are stage-local
        # (sharded like the params) and reduce over dp only
        grads = jax.tree.map(
            lambda g, s: jax.lax.psum(g, "dp" if s == P("pp") else ("dp", "pp")),
            grads, specs)
        return part.reshape(1), grads

    grad_fn = shard_map(
        local_grad, mesh=mesh,
        in_specs=(specs, P("dp"), P("dp")),
        out_specs=(P(("dp", "pp")), specs),
        check_vma=False,
    )

    def step(state: TrainState, images, depth):
        parts, grads = grad_fn(state.params, images, depth)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, opt_state, state.step + 1), jnp.sum(parts)

    return state, jax.jit(step, donate_argnums=(0,))
