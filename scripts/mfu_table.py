"""Exact FLOP accounting for the MFU close-out table (VERDICT r4 #5).

Compiles the production programs on the CPU backend and reads XLA's
cost analysis — platform-independent FLOP counts for exactly the
programs the chip runs. Combined with the measured ms from the TPU
probes (tpu_infer_breakdown / tpu_block_anatomy / tpu_decoder_profile)
this pins the docs/PERFORMANCE.md table's denominators.

CPU-only; run anywhere: python scripts/mfu_table.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def flops(fn, *args):
    c = __import__("jax").jit(fn).lower(*args).compile()
    for a in c.cost_analysis() if isinstance(c.cost_analysis(), list) \
            else [c.cost_analysis()]:
        if a and "flops" in a:
            return a["flops"]
    return float("nan")


def main():
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.models import vit as V
    from ml_depth_pro_video_tpu.models.depth_pro import (
        DEFAULT_MONODEPTH_CONFIG,
        decoder_apply,
        forward,
        infer_fn,
        init_depth_pro,
    )

    cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
    prec = Precision.bf16()
    params = jax.eval_shape(lambda: init_depth_pro(jax.random.PRNGKey(0), cfg))

    def abstract(tree):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)

    p = abstract(params)
    b = 1  # per-frame accounting
    x = jax.ShapeDtypeStruct((b, cfg.img_size, cfg.img_size, 3), jnp.float32)

    tf = 1e12
    full = flops(lambda pp, xx: infer_fn(pp, xx, None, cfg, prec)["depth"], p, x)
    fwd = flops(lambda pp, xx: forward(pp, xx, cfg, prec,
                                       compute_fov=False)[0], p, x)
    print(f"infer_fn (full contract, b=1): {full/tf:.2f} TF/frame")
    print(f"canonical forward (no FOV):    {fwd/tf:.2f} TF/frame")

    # CAVEAT: XLA's cost analysis counts a lax.scan/while BODY ONCE, so
    # every number above undercounts the 24-block ViT scans by 23 bodies
    # (and the FOV trunk likewise). Correct with a single-block count.
    vp = p["encoder"]["patch_vit"]
    xv = jax.ShapeDtypeStruct((35, 384, 384, 3), jnp.float32)
    vit_counted = flops(lambda pp, xx: V.vit_apply(
        pp, xx, cfg.vit, prec, capture_blocks=cfg.hook_block_ids)[0], vp, xv)

    bp1 = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype),
                       p["encoder"]["patch_vit"]["blocks"])
    ntok = (cfg.vit.img_size // cfg.vit.patch_size) ** 2 + 1
    xb = jax.ShapeDtypeStruct((35, ntok, cfg.vit.embed_dim), jnp.float32)
    blk = flops(lambda bb, xx: V._block(xx, bb, cfg.vit, None), bp1, xb)
    vit = vit_counted + (cfg.vit.depth - 1) * blk
    print(f"patch ViT single block (35x):  {blk/tf:.3f} TF")
    print(f"patch ViT trunk corrected:     {vit/tf:.2f} TF/frame "
          f"(counted {vit_counted/tf:.2f} + {cfg.vit.depth - 1}x block)")

    # attention-dot share, analytic: scores + PV = 2 * 2 * S^2 * d per
    # block over 35 patches
    s, d = ntok, cfg.vit.embed_dim
    dots = 35 * cfg.vit.depth * (2 * s * s * d + 2 * s * s * d)
    print(f"  of which attention dots:     {dots/tf:.2f} TF (analytic)")

    # FOV trunk correction (one 384^2 patch through its own scan)
    fov_blk = blk / 35.0
    full_corrected = full + (cfg.vit.depth - 1) * blk \
        + (cfg.vit.depth - 1) * fov_blk
    print(f"infer_fn corrected:            {full_corrected/tf:.2f} TF/frame")

    # decoder at the production feature maps (shapes derived from the
    # real encoder, not hand-maintained)
    from ml_depth_pro_video_tpu.models.depth_pro import encoder_apply

    enc_shapes = jax.eval_shape(
        lambda pp, xx: encoder_apply(pp, xx, cfg, prec), p["encoder"], x)
    fs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in enc_shapes]
    print("encoder outputs:", [tuple(a.shape) for a in fs])
    dec = flops(lambda pp, *ff: decoder_apply(pp, list(ff))[0],
                p["decoder"], *fs)
    print(f"decoder (all levels):          {dec/tf:.2f} TF/frame")


if __name__ == "__main__":
    main()
