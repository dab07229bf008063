"""Weights-day end-to-end parity check (BASELINE.md north star).

No checkpoint exists in this environment (zero egress), so this script
is checked in ready-to-run for the day ``checkpoints/depth_pro.pt``
exists:

    python scripts/weights_day_e2e.py [--ckpt checkpoints/depth_pro.pt]

It then:
 1. converts the reference torch checkpoint to the TPU npz layout
    (ckpt/convert.py — key paths validated against the real reference
    module tree in tests/test_reference_parity.py);
 2. runs data/example.jpg through the JAX model in fp32 parity mode
    (EXIF f_px if present, FOV-derived otherwise);
 3. compares against a stored reference output
    ``checkpoints/example_depth_ref.npz`` ({"depth", "focallength_px"},
    produced by running the reference torch model once) with the
    <=1e-3 relative-error contract — or, if the reference output is
    absent, saves ours as the regression anchor for future runs;
 4. (``--full``) signs off every deployment tier against the fp32
    result on the real weights: bf16 production mode, the ToMe
    ``--speed balanced``/``fast`` merge tiers (the deviation table that
    docs/PERFORMANCE.md could only bound with a trained proxy until
    now), int8 weight-only quantization, and the AOT-exported artifact
    roundtrip. Prints one deviation line per tier; nothing beyond the
    1e-3 contract of stage 3 is asserted — the tier table is the
    sign-off evidence to paste into docs/PERFORMANCE.md.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/depth_pro.pt")
    ap.add_argument("--image", default="/root/reference/data/example.jpg")
    ap.add_argument("--ref-out", default="checkpoints/example_depth_ref.npz")
    ap.add_argument("--rtol", type=float, default=1e-3)
    ap.add_argument("--full", action="store_true",
                    help="also report every deployment tier's deviation "
                         "vs fp32 (bf16, merge tiers, int8, exported)")
    ap.add_argument("--selftest", action="store_true",
                    help="no weights needed: run the whole flow (incl. "
                         "--full tiers) at the tiny config on random "
                         "init — proves the script itself works TODAY "
                         "so weights day is just a rerun")
    args = ap.parse_args()

    if not args.selftest and not os.path.exists(args.ckpt):
        print(f"SKIP: no checkpoint at {args.ckpt} (weights not available here)")
        return 0

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.io.image import load_rgb
    from ml_depth_pro_video_tpu.models.depth_pro import (
        DEFAULT_MONODEPTH_CONFIG, infer_fn,
    )

    if args.selftest:
        from ml_depth_pro_video_tpu.models.depth_pro import (
            init_depth_pro, tiny_config,
        )

        import dataclasses as _dc

        # merge after block 1 (of the tiny 2) so the ToMe tiers actually
        # exercise the merged path; ratio 0 keeps this inert otherwise
        cfg = _dc.replace(tiny_config(), token_merge_block=1)
        params = init_depth_pro(jax.random.PRNGKey(0), cfg)
        args.full = True
        args.ref_out = os.path.join("/tmp", "weights_day_selftest_ref.npz")
        if os.path.exists(args.ref_out):
            os.remove(args.ref_out)
        rng = np.random.default_rng(0)
        img = (rng.random((160, 200, 3)) * 255).astype(np.uint8)
        f_px = None
        print("SELFTEST: tiny config, random init, synthetic image")
    else:
        from ml_depth_pro_video_tpu.ckpt.convert import convert_checkpoint, load_params

        cfg = DEFAULT_MONODEPTH_CONFIG
        npz = os.path.splitext(args.ckpt)[0] + "_tpu.npz"
        if not os.path.exists(npz):
            print(f"converting {args.ckpt} -> {npz}")
            convert_checkpoint(args.ckpt, npz)
        params = jax.tree.map(jnp.asarray, load_params(npz))
        img, _, f_px = load_rgb(args.image)

    x = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = infer_fn(
        params, jnp.asarray(x)[None],
        None if f_px is None else jnp.asarray([f_px], jnp.float32),
        cfg, Precision.fp32(),
    )
    depth = np.asarray(out["depth"][0])
    fl = float(np.asarray(out["focallength_px"][0]))
    print(f"depth: shape={depth.shape} range=[{depth.min():.3f}, {depth.max():.3f}] "
          f"f_px={fl:.2f}")
    assert np.isfinite(depth).all()

    if os.path.exists(args.ref_out):
        ref = np.load(args.ref_out)
        rel = np.abs(depth - ref["depth"]) / np.maximum(np.abs(ref["depth"]), 1e-6)
        print(f"vs reference output: max rel err {rel.max():.2e}, "
              f"f_px delta {abs(fl - float(ref['focallength_px'])):.3f}")
        assert rel.max() <= args.rtol, f"parity FAILED: {rel.max():.2e} > {args.rtol}"
        assert abs(fl - float(ref["focallength_px"])) <= args.rtol * max(fl, 1.0)
        print("PARITY OK (<=1e-3)")
    else:
        np.savez(args.ref_out, depth=depth, focallength_px=fl)
        print(f"no stored reference output; saved ours to {args.ref_out} "
              "(regression anchor). To anchor to the reference itself, run "
              "/root/reference once and store its depth/f_px under this name.")

    if args.full:
        import dataclasses

        from ml_depth_pro_video_tpu.models.depth_pro import fold_head_params

        inv_ref = 1.0 / np.clip(depth, 1e-4, 1e4)
        fp = None if f_px is None else jnp.asarray([f_px], jnp.float32)
        xb = jnp.asarray(x)[None]

        def tier(name, d):
            inv = 1.0 / np.clip(np.asarray(d), 1e-4, 1e4)
            rel = np.abs(inv - inv_ref) / (np.abs(inv_ref).max() + 1e-9)
            print(f"tier {name:<22} inv-depth dev vs fp32: "
                  f"mean {rel.mean():.5f}  p95 {np.percentile(rel, 95):.5f}  "
                  f"max {rel.max():.5f}")

        cfgq = cfg
        out_bf16 = infer_fn(params, xb, fp, cfgq, Precision.bf16())
        tier("bf16 (production)", out_bf16["depth"][0])

        from ml_depth_pro_video_tpu.models.depth_pro import SPEED_PRESETS

        for speed in ("balanced", "fast"):
            ratio = SPEED_PRESETS[speed]
            name = f"merge {ratio:.2f} ({speed})"
            mc = dataclasses.replace(cfgq, token_merge_ratio=ratio)
            out_m = infer_fn(params, xb, fp, mc, Precision.bf16())
            tier(name, out_m["depth"][0])

        from ml_depth_pro_video_tpu.ckpt.quantize import quantize_vit_weights

        qp = jax.tree.map(jnp.asarray, quantize_vit_weights(params))
        out_q = infer_fn(qp, xb, fp, cfgq, Precision.bf16())
        tier("int8 weight-only", out_q["depth"][0])

        from ml_depth_pro_video_tpu.ckpt.export import export_infer

        # exported-artifact roundtrip at the canonical resolution (the
        # runner's uint8 program; bit-exact on TPU per
        # scripts/tpu_export_check.out)
        exported = export_infer(cfgq, "bf16", batch_size=1)
        fold = fold_head_params(params)
        size = cfgq.img_size
        u8 = np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
        from PIL import Image as _Image

        u8c = np.asarray(_Image.fromarray(u8).resize((size, size),
                                                     _Image.BILINEAR))
        out_e = exported.call(fold, jnp.asarray(u8c)[None])
        de = np.asarray(out_e["depth"][0], np.float32)
        de = np.asarray(_Image.fromarray(de).resize(
            (depth.shape[1], depth.shape[0]), _Image.BILINEAR))
        tier("exported artifact*", de)
        print("  (*canonical-resolution uint8 program resized back — "
              "compares the serving path end to end, not "
              "pixelwise-identical preprocessing)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
