"""Ahead-of-time export of the compiled inference program.

The reference re-builds its torch model and re-traces on every process
start (`/root/reference/src/depth_pro/depth_pro.py:49-151` via each
script's `create_model_and_transforms` call). On TPU the equivalent
cost is the first jit of the 1536² ViT-L program: ~20-40 s of XLA
compile per fresh process. ``jax.export`` serializes the LOWERED
StableHLO — including the Pallas Mosaic kernels as custom calls — so a
production server deserializes and runs without re-tracing the Python
model at all, and the artifact pins platform, shapes, dtypes and the
exact program that was validated.

Contract: the exported callable is exactly the video runner's hot
inference program — ``fn(params, frames_uint8) -> {"depth",
"focallength_px", ...}`` at a FIXED (batch, H, W, 3) uint8 input with
on-device normalization (`video/runner.py::_infer`), params FOLDED
(``fold_head_params``). Weights are an argument, not baked in: one
artifact serves any checkpoint with the same architecture.

Platform notes: the program is exported for the platform it was traced
on (the attention/resblock impls auto-select per platform at trace
time) — export on the machine class you deploy. Shapes are static; the
serving layer already canonicalizes every request to one resolution
(`serve/server.py::_Batcher`), so one artifact covers production.

Numerics: deserialization re-COMPILES the StableHLO. On TPU the result
is BIT-IDENTICAL to the in-process jit (scripts/tpu_export_check.out:
max rel diff 0.0e+00 on the real chip); on CPU fusion-level rounding
may differ by ~3e-6 relative. Do not compare against EAGER execution —
op-by-op dispatch on TPU rounds differently from any fused program
(measured 2e-2 apart at random init through the 1/clamp pole).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ..core.precision import Precision, resolve_precision
from ..models.depth_pro import (
    DepthProConfig,
    fold_head_params,
    infer_fn,
    init_depth_pro,
)

LOGGER = logging.getLogger(__name__)


def _runner_fn(cfg: DepthProConfig, precision: Precision):
    """The runner's single-device batch program: uint8 frames in,
    normalization on-device (`video/runner.py::_infer`, f_px derived)."""

    def fn(p, x):
        return infer_fn(p, x.astype(jnp.float32) / 127.5 - 1.0, None, cfg,
                        precision)

    return fn


def _abstract_params(cfg: DepthProConfig, quantize: bool = False):
    """Abstract (shape/dtype only) FOLDED param tree — export never
    needs real weights. ``quantize`` produces the same tree the runner
    preps (`video/runner.py` quantizes then folds; here the fold runs
    first — equivalent because the two transforms touch disjoint
    subtrees: the fold the head convs, quantization the ViT matmuls)."""

    shapes = jax.eval_shape(
        lambda: fold_head_params(init_depth_pro(jax.random.PRNGKey(0), cfg)))
    shapes = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), shapes)
    if quantize:
        # quantize commutes with the head fold (disjoint subtrees: the
        # fold touches the head convs, quantization the ViT matmuls)
        from .quantize import quantize_vit_weights_abstract

        shapes = quantize_vit_weights_abstract(shapes)
    return shapes


def export_infer(cfg: DepthProConfig, precision="bf16", batch_size: int = 1,
                 path: str | None = None, quantize: bool = False,
                 mesh=None):
    """Export the inference program for ``batch_size`` uint8 frames at
    the model's native resolution. Returns the ``jax.export.Exported``;
    writes the serialized artifact to ``path`` when given.
    ``quantize`` exports the int8-weight variant of the program (the
    param argument then takes the `ckpt/quantize.py` tree).

    ``mesh``: export the DATA-PARALLEL multi-chip program instead — the
    exact shard_map the video runner uses on a pod host
    (`parallel/spmd.py::make_dp_infer`: params replicated, batch split
    over ``dp``). The artifact then pins the device count; serve it
    through a runner built with an equally-sized dp mesh. This is what
    makes AOT deployment pod-grade: the 8-chip host — the deployment the
    framework targets — starts with zero XLA compile, not just the
    single-chip case."""
    from jax import export as jex

    precision = resolve_precision(precision)
    p_abs = _abstract_params(cfg, quantize=quantize)
    if mesh is None:
        fn = jax.jit(_runner_fn(cfg, precision))
        x = jax.ShapeDtypeStruct((batch_size, cfg.img_size, cfg.img_size, 3),
                                 jnp.uint8)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_sharding
        from ..parallel.spmd import make_dp_infer

        dp = mesh.shape["dp"]
        if batch_size % dp:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of the mesh's "
                f"dp={dp} (each chip takes batch/dp frames)")
        fn = make_dp_infer(_runner_fn(cfg, precision), mesh)
        rep = NamedSharding(mesh, P())
        p_abs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep),
            p_abs)
        x = jax.ShapeDtypeStruct((batch_size, cfg.img_size, cfg.img_size, 3),
                                 jnp.uint8, sharding=batch_sharding(mesh))
    # Mosaic kernels lower to the "tpu_custom_call" target, which export
    # refuses without an explicit opt-in (it cannot verify stability
    # guarantees of arbitrary custom calls; Mosaic's is fine on the
    # matching libtpu)
    exported = jex.export(
        fn, disabled_checks=[jex.DisabledSafetyCheck.custom_call("tpu_custom_call")],
    )(p_abs, x)
    if path is not None:
        data = exported.serialize()
        with open(path, "wb") as f:
            f.write(data)
        # sidecar manifest: the artifact itself carries no model-config
        # identity, and serving a program exported for a different
        # merge ratio / precision / size would be a SILENT quality bug —
        # the runner cross-checks this at load time
        import json

        with open(path + ".json", "w") as f:
            json.dump({
                "img_size": cfg.img_size,
                "batch_size": batch_size,
                # family identity: a 'base' artifact at the same img_size
                # as 'large' would otherwise only fail at call time with
                # an opaque pytree/aval error
                "vit_embed_dim": cfg.vit.embed_dim,
                "vit_depth": cfg.vit.depth,
                "compute_dtype": jnp.dtype(precision.compute_dtype).name,
                "token_merge_ratio": cfg.token_merge_ratio,
                "token_merge_block": cfg.token_merge_block,
                "quantized": quantize,
                "platforms": list(exported.platforms),
                # multi-chip artifacts pin the device count (1 = the
                # single-chip program); the loader cross-checks it
                # against the serving mesh
                "nr_devices": exported.nr_devices,
            }, f, indent=1)
        LOGGER.info("exported %s (%d bytes, platforms=%s, batch=%d, %dpx)",
                    path, len(data), exported.platforms, batch_size,
                    cfg.img_size)
    return exported


def load_exported(path: str, cfg: DepthProConfig | None = None,
                  precision=None, quantize: bool | None = None,
                  n_devices: int | None = None):
    """Deserialize an artifact; returns the ``Exported`` (use
    ``.call(params, frames_uint8)``). Raises on platform mismatch at
    call time, not load time. ``n_devices``: assert the artifact was
    exported for exactly that many devices (1 = single-chip; a dp-mesh
    runner passes its mesh size) — a mismatched artifact would die at
    call time with an opaque device-assignment error.

    When ``cfg``/``precision``/``quantize`` are given and a sidecar
    manifest exists (written by ``export_infer``), mismatched model
    identity raises — an artifact exported for a different merge ratio,
    precision, resolution or weight format would otherwise serve
    silently wrong programs."""
    import json
    import os

    from jax import export as jex

    manifest_path = path + ".json"
    if cfg is not None and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        want = {"img_size": cfg.img_size,
                "token_merge_ratio": cfg.token_merge_ratio,
                "token_merge_block": cfg.token_merge_block}
        # model-family identity keys postdate the first artifacts: treat
        # an absent key as matching (old manifests), a present one strictly
        for k, v in (("vit_embed_dim", cfg.vit.embed_dim),
                     ("vit_depth", cfg.vit.depth)):
            m.setdefault(k, v)
            want[k] = v
        if precision is not None:
            want["compute_dtype"] = jnp.dtype(
                resolve_precision(precision).compute_dtype).name
        if quantize is not None:
            # older manifests predate the key; treat absent as False
            want["quantized"] = bool(quantize)
            m.setdefault("quantized", False)
        bad = {k: (m.get(k), v) for k, v in want.items() if m.get(k) != v}
        if bad:
            raise ValueError(
                f"exported artifact {path} does not match the model config: "
                + ", ".join(f"{k}: artifact={a!r} vs wanted={w!r}"
                            for k, (a, w) in bad.items()))
    elif cfg is not None:
        LOGGER.warning("no manifest %s — cannot verify the artifact matches "
                       "the model config", manifest_path)

    with open(path, "rb") as f:
        exported = jex.deserialize(bytearray(f.read()))
    if n_devices is not None and exported.nr_devices != n_devices:
        raise ValueError(
            f"exported artifact {path} was exported for "
            f"{exported.nr_devices} device(s) but the runner serves "
            f"{n_devices} — re-export with "
            + (f"--dp {n_devices}" if n_devices > 1 else "no --dp"))
    if quantize is not None:
        # weight-format check straight from the artifact, so it holds
        # even without the sidecar manifest: a quantized param tree
        # carries int8 leaves (the frame input is uint8, never int8).
        # Without this, a mismatched artifact loads cleanly and dies at
        # the first call with an opaque pytree/aval error.
        has_int8 = any(jnp.dtype(a.dtype) == jnp.int8
                       for a in exported.in_avals)
        if has_int8 != bool(quantize):
            raise ValueError(
                f"exported artifact {path} takes "
                f"{'an int8-quantized' if has_int8 else 'a full-precision'} "
                f"param tree but the runner is configured with "
                f"quantize={bool(quantize)} — export with "
                f"{'--quantize' if quantize else 'no --quantize'} or drop "
                f"the mismatched flag")
    return exported


def main(argv=None) -> None:  # pragma: no cover - thin CLI, tested via lib
    import argparse

    from ..models.depth_pro import DEFAULT_MONODEPTH_CONFIG, tiny_config

    ap = argparse.ArgumentParser(
        description="AOT-export the compiled depth inference program "
                    "(skip the per-process XLA compile in production)")
    ap.add_argument("-o", "--output", required=True, help="artifact path")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--precision", choices=["bf16", "fp32"], default="bf16")
    ap.add_argument("--speed", default="exact",
                    help="speed preset baked into the exported program")
    ap.add_argument("--quantize", action="store_true",
                    help="export the int8-weight program variant "
                         "(serve it with a quantize_vit_weights param "
                         "tree — 4x smaller ViT weight footprint)")
    ap.add_argument("--dp", type=int, default=0,
                    help="export the N-device data-parallel program "
                         "(shard_map over a dp mesh — the pod-host "
                         "serving path; 0 = single-device)")
    ap.add_argument("--tiny", action="store_true",
                    help="miniature config (smoke tests)")
    from ..models.depth_pro import MODEL_PRESETS as _MP
    ap.add_argument("--model", choices=list(_MP), default="large",
                    help="model family member to export")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from ..models.depth_pro import model_preset

    cfg = tiny_config() if args.tiny else model_preset(args.model)
    if args.speed != "exact":
        from ..models.depth_pro import apply_speed

        cfg = apply_speed(cfg, args.speed)
    mesh = None
    if args.dp:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
    exported = export_infer(cfg, args.precision, args.batch_size, args.output,
                            quantize=args.quantize, mesh=mesh)
    print(f"exported platforms={exported.platforms} "
          f"in={[str(a) for a in exported.in_avals[-1:]]} -> {args.output}")


if __name__ == "__main__":  # pragma: no cover
    main()
