"""Batch depth-map generation for video frames.

Capability parity with `/root/reference/generate_depth_maps.py:15-251`:
single image or directory batch, colormap PNG or 16-bit normalized
grayscale output, optional downscale with focal-length rescale. The
reference reloads the model per image (`:76-79`); here one resident
compiled model streams every frame (``torch.compile`` `:83-88` is
subsumed by jit).
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np


def colorize_depth(depth: np.ndarray, colormap: str = "turbo",
                   invert: bool = False) -> np.ndarray:
    """Depth map -> normalized color or grayscale visualization.

    Reference semantics (`generate_depth_maps.py:29-44,136-139`): plain
    min-max normalization of METRIC depth (near = low value), nan-robust
    with clipping; no inversion. ``invert=True`` remains available for
    inverse-depth-style display."""
    d = np.asarray(depth, dtype=np.float64)
    finite = np.isfinite(d)
    if not finite.any():
        d = np.zeros_like(d)
        lo, hi = 0.0, 1.0
    else:
        lo, hi = d[finite].min(), d[finite].max()
        d = np.nan_to_num(d, nan=lo, posinf=hi, neginf=lo)
    normed = np.clip((d - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
    if invert:
        normed = 1.0 - normed
    if colormap in ("gray16", "grayscale16"):
        return (normed * 65535).astype(np.uint16)
    if colormap in ("gray", "grayscale"):
        return (normed * 255).astype(np.uint8)
    import matplotlib

    cm = matplotlib.colormaps[colormap]
    return (cm(normed)[..., :3] * 255).astype(np.uint8)


def save_depth_image(path: str, arr: np.ndarray) -> None:
    from PIL import Image

    # uint16 arrays map to 16-bit grayscale ("I;16") natively; passing
    # mode= explicitly is deprecated in Pillow (removal Oct 2026)
    Image.fromarray(arr).save(path)


def generate_depth_maps(
    input_path: str,
    output_dir: str,
    colormap: str = "turbo",
    downscale_factor: float = 1.0,
    half_precision: bool = True,
    batch_size: int = 1,
    save_npz: bool = False,
    pattern: str = "*.png",
    runner=None,
    speed: str = "exact",
) -> list[str]:
    """Run depth over a file or directory; returns written paths."""
    from ..video.runner import DepthVideoRunner

    if os.path.isdir(input_path):
        paths = sorted(glob.glob(os.path.join(input_path, pattern)))
    else:
        paths = [input_path]
    if not paths:
        raise FileNotFoundError(f"no inputs under {input_path}")
    os.makedirs(output_dir, exist_ok=True)

    runner = runner or DepthVideoRunner(
        precision="bf16" if half_precision else "fp32",
        batch_size=batch_size,
        downscale_factor=downscale_factor,
        speed=speed,
    )

    written = []
    t0 = time.time()
    # per-image fault isolation (reference `generate_depth_maps.py:147-151,
    # 202-203`): one bad frame must not lose the rest of the batch
    for i, result in enumerate(runner.depth_stream(paths)):
        stem = os.path.splitext(os.path.basename(result["key"]))[0]
        try:
            out = os.path.join(output_dir, f"{stem}_depth.png")
            save_depth_image(out, colorize_depth(result["depth"], colormap))
            written.append(out)
            if save_npz:
                np.savez_compressed(os.path.join(output_dir, f"{stem}_depth.npz"),
                                    depth=result["depth"],
                                    focallength_px=result["focallength_px"])
            print(f"[{i+1}/{len(paths)}] {stem} ({(time.time()-t0)/(i+1):.2f}s/frame avg)")
        except Exception as exc:  # noqa: BLE001
            print(f"Error processing {stem}: {exc}")
    print(f"Successfully wrote {len(written)}/{len(paths)} depth maps")
    return written


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Batch depth maps (TPU-native)")
    ap.add_argument("input", help="image file or frames directory")
    ap.add_argument("-o", "--output_dir", required=True)
    ap.add_argument("--colormap", default="turbo",
                    choices=["turbo", "viridis", "magma", "plasma", "inferno",
                             "gray", "grayscale", "gray16", "grayscale16"])
    ap.add_argument("--downscale_factor", type=float, default=1.0)
    ap.add_argument("--half_precision", action="store_true", default=True,
                    help="bf16 compute (the DEFAULT here, unlike the fp32 "
                         "reference — framework speed-mode convention)")
    ap.add_argument("--full_precision", dest="half_precision", action="store_false",
                    help="fp32 compute (the reference's default)")
    ap.add_argument("--batch_size", type=int, default=1)
    from ..models.depth_pro import SPEED_PRESETS as _SP
    ap.add_argument("--speed", choices=sorted(_SP), default="exact",
                    help="ToMe token-merge approximation tiers "
                         "(balanced=0.25, fast=0.5 merge ratio)")
    ap.add_argument("--save_npz", action="store_true")
    ap.add_argument("--pattern", default="*.png")
    args = ap.parse_args(argv)
    generate_depth_maps(args.input, args.output_dir, colormap=args.colormap, speed=args.speed,
                        downscale_factor=args.downscale_factor,
                        half_precision=args.half_precision,
                        batch_size=args.batch_size, save_npz=args.save_npz,
                        pattern=args.pattern)


if __name__ == "__main__":  # pragma: no cover
    main()
