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
    absent, saves ours as the regression anchor for future runs.
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
    args = ap.parse_args()

    if not os.path.exists(args.ckpt):
        print(f"SKIP: no checkpoint at {args.ckpt} (weights not available here)")
        return 0

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.ckpt.convert import convert_checkpoint, load_params
    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.io.image import load_rgb
    from ml_depth_pro_video_tpu.models.depth_pro import (
        DEFAULT_MONODEPTH_CONFIG, infer_fn,
    )

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
        DEFAULT_MONODEPTH_CONFIG, Precision.fp32(),
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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
