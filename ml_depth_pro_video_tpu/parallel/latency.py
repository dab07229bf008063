"""Single-frame LATENCY parallelism over the mesh.

Data parallelism (parallel/spmd.py) scales throughput — frames per
second across a pod — but a single frame still takes one chip's full
forward (~165 ms). This module scales the other axis: ONE frame's
latency, by splitting the model's own work across every chip:

- the dominant cost, the 35-patch pyramid ViT
  (`/root/reference/src/depth_pro/network/encoder.py:266`), is
  embarrassingly parallel over the patch axis: ``shard_map`` runs
  each chip's patch slice through the full scan-of-blocks (the Pallas
  attention kernel is not GSPMD-partitionable, so shard_map is the
  idiomatic wrapper), and one all-gather over ICI returns the token
  grids (3 x ~47 MB at full scale, sub-millisecond on v5e ICI);
- the decoder / head convs are spatially sharded along image rows via
  GSPMD sharding constraints — XLA inserts the halo exchanges for the
  3x3 convs automatically;
- the tiny image/FOV ViTs (1 patch each) stay replicated.

On a v5e-8 this is PROJECTED (not yet measured on real 8-chip
hardware) to turn the ~105 ms patch-ViT into ~15 ms + gather and the
~45 ms decoder into ~8 ms + halos, bounding single-stream latency at
roughly the replicated remainder — the video pipeline can then hit
camera rate on ONE stream instead of needing 8 parallel streams.
What IS certified without 8 chips: `__graft_entry__.dryrun_multichip`
AOT-compiles the production-dims (ViT-L, 1536²) sp program on an
8-device mesh and audits its HLO — only the 3 intended token
all-gathers appear; everything else moves via collective-permute
(halo exchange), no accidental weight or activation regathers.

**Padding waste**: the 35-patch axis must pad up to a multiple of the
mesh size — on 8 devices that is 40 slots, i.e. 12.5% of the patch-ViT
compute is spent on zero patches (the log notes the fraction at trace
time). 5- or 7-device meshes divide 35 exactly (zero pad); on a full
v5e-8 the 8-way split is still faster in wall-clock than a 7-way split
with one idle chip (35/8 -> 5 patches per chip vs 5 with 7 chips),
so the default remains "use every device".
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.precision import Precision
from ..models.depth_pro import DepthProConfig, infer_fn
from ..models.vit import vit_apply


def make_sp_mesh(devices=None) -> Mesh:
    """A flat 1-axis mesh over all devices for latency sharding."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("sp",))


def _sharded_patch_vit(mesh: Mesh, cfg: DepthProConfig, precision: Precision,
                       attn_impl: str | None):
    """Build patch_vit_fn: pad the patch axis to the mesh size, run each
    chip's slice through the backbone, all-gather the token grids."""
    n = mesh.shape["sp"]

    def body(vp, xs):
        # merge args forwarded so --speed fast composes with latency
        # parallelism (merging is per patch slice, shard-local)
        t, (h0, h1) = vit_apply(vp, xs, cfg.vit, precision,
                                capture_blocks=cfg.hook_block_ids,
                                attn_impl=attn_impl,
                                merge_ratio=cfg.token_merge_ratio,
                                merge_block=cfg.token_merge_block)
        return t, h0, h1

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("sp")),
        out_specs=(P("sp"), P("sp"), P("sp")),
        check_vma=False,
    )

    def patch_vit_fn(vp, pyramid):
        nb = pyramid.shape[0]
        pad = (-nb) % n
        if pad:
            # trace-time (once per compile): be honest about the padded
            # slots — e.g. 35 patches on 8 devices pad to 40 = 12.5%
            # wasted patch-ViT compute (5/7-device meshes divide exactly)
            logging.getLogger(__name__).info(
                "latency mode: %d patches pad to %d on %d devices "
                "(%.1f%% padded patch-ViT compute)",
                nb, nb + pad, n, 100.0 * pad / (nb + pad))
        xp = jnp.pad(pyramid, ((0, pad),) + ((0, 0),) * (pyramid.ndim - 1))
        t, h0, h1 = sharded(vp, xp)
        # replicate the gathered tokens for the (cheap) merge that follows
        rep = NamedSharding(mesh, P())
        t = jax.lax.with_sharding_constraint(t[:nb], rep)
        h0 = jax.lax.with_sharding_constraint(h0[:nb], rep)
        h1 = jax.lax.with_sharding_constraint(h1[:nb], rep)
        return t, (h0, h1)

    return patch_vit_fn


def make_latency_infer(cfg: DepthProConfig, mesh: Mesh | None = None,
                       precision: Precision = Precision.fp32(),
                       attn_impl: str | None = None,
                       derive_missing: bool = False,
                       interpolation_mode: str = "bilinear",
                       preprocess=None):
    """Jitted forward with the model itself sharded over the mesh.
    Signature: ``fn(params, x, f_px) -> {"depth", "focallength_px"}``
    with x (B, H, W, 3) and f_px (B,) or None.

    The contract IS ``models.depth_pro.infer_fn`` — this only injects
    the two latency hooks (the shard_map patch ViT and the row-sharding
    constraint), so any future infer() change applies here for free."""
    mesh = mesh if mesh is not None else make_sp_mesh()
    patch_vit_fn = _sharded_patch_vit(mesh, cfg, precision, attn_impl)
    row_sharded = NamedSharding(mesh, P(None, "sp"))

    def constrain(t):
        # spatially shard the conv trunk along image rows: GSPMD
        # partitions the 3x3 convs with automatic halo exchange
        return jax.lax.with_sharding_constraint(t, row_sharded)

    def fn(params, x, f_px=None):
        # ``preprocess`` (e.g. the runner's uint8 normalization) runs
        # INSIDE the jitted program so it fuses instead of adding an
        # eager dispatch + fp32 frame copy on the latency path
        if preprocess is not None:
            x = preprocess(x)
        return infer_fn(params, x, f_px, cfg, precision, attn_impl,
                        interpolation_mode=interpolation_mode,
                        derive_missing=derive_missing,
                        patch_vit_fn=patch_vit_fn, constrain=constrain)

    return jax.jit(fn)
