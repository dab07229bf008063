"""``depth-pro-run``: single-image / directory depth inference CLI.

Behavior parity with `/root/reference/src/depth_pro/cli/run.py:23-154`:
per-image loop over a file or directory, EXIF focal length when
available, ``.npz`` METRIC depth (key ``depth``, `:95`) + turbo
JPEG colormapped on inverse depth with the reference's [1/250, 1/0.1]
display clamps (`:80-84`), outputs mirroring the input's relative
subdirectories (`:88-92`), ``-v`` logging. The torch device pick
(cuda>mps>cpu, `:23-30`) becomes the JAX default device (TPU when
present).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

LOGGER = logging.getLogger(__name__)
IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".heic", ".webp"}


def colorize(values: np.ndarray, cmap: str = "turbo") -> np.ndarray:
    """Normalized values -> uint8 RGB via a matplotlib colormap."""
    import matplotlib

    cm = matplotlib.colormaps[cmap]
    return (cm(values)[..., :3] * 255).astype(np.uint8)


def run(args) -> None:
    from PIL import Image

    from ..models.depth_pro import model_preset
    from ..video.runner import DepthVideoRunner

    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    image_path = Path(args.image_path)
    if image_path.is_dir():
        paths = sorted(
            p for p in image_path.rglob("*") if p.suffix.lower() in IMAGE_EXTS
        )
    else:
        paths = [image_path]
    if not paths:
        raise SystemExit(f"No images found at {image_path}")

    runner = DepthVideoRunner(
        cfg=model_preset(getattr(args, "model", "large")),
        precision="bf16" if args.half else "fp32",
        batch_size=args.batch_size,
        speed=args.speed,
        exported_path=getattr(args, "exported", None),
    )

    # live side-by-side display (reference cli/run.py:99-113); requires
    # an interactive matplotlib backend — degrades to headless politely
    fig = ax_rgb = ax_disp = None
    if not args.skip_display:
        try:
            import matplotlib.pyplot as plt

            plt.ion()
            fig, (ax_rgb, ax_disp) = plt.subplots(1, 2)
            fig.canvas.manager.set_window_title("Depth Pro")
        except Exception as exc:  # noqa: BLE001 - headless hosts
            LOGGER.warning("no interactive display (%s); continuing headless", exc)
            args.skip_display = True

    # root against which directory outputs mirror the input tree
    # (reference: image_path.relative_to(relative_path).parent, :88-92)
    rel_root = image_path if image_path.is_dir() else image_path.parent

    # the runner extracts the EXIF focal length per image itself
    for result in runner.depth_stream(str(p) for p in paths):
        src = Path(result["key"])
        depth = result["depth"]
        # reference display normalization clamps (:80-84)
        inv = 1.0 / np.clip(depth, 1e-9, None)
        hi = min(float(inv.max()), 1 / 0.1)
        lo = max(1 / 250, float(inv.min()))
        normed = np.clip((inv - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
        LOGGER.info("%s: f_px=%.1f", src.name, result["focallength_px"])
        if not args.skip_display:
            ax_rgb.imshow(result["image"])
            ax_disp.imshow(normed, cmap="turbo")
            fig.canvas.draw()
            fig.canvas.flush_events()
        if args.output_path is not None:
            base = Path(args.output_path) / src.relative_to(rel_root).parent / src.stem
            base.parent.mkdir(parents=True, exist_ok=True)
            np.savez_compressed(str(base) + ".npz", depth=depth)
            Image.fromarray(colorize(normed)).save(str(base) + ".jpg", quality=90)
            print(f"wrote {base}.npz / .jpg")
        else:
            print(f"{src.name}: depth [{depth.min():.2f}, {depth.max():.2f}] m, "
                  f"f_px={result['focallength_px']:.1f}")

    if not args.skip_display:
        import matplotlib.pyplot as plt

        plt.show(block=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Depth Pro inference (TPU-native)")
    ap.add_argument("-i", "--image-path", dest="image_path", required=True,
                    help="image file or directory")
    ap.add_argument("-o", "--output-path", dest="output_path", default=None)
    ap.add_argument("--half", action="store_true", default=True,
                    help="bfloat16 compute (default)")
    ap.add_argument("--fp32", dest="half", action="store_false")
    ap.add_argument("--batch-size", type=int, default=1)
    from ..models.depth_pro import SPEED_PRESETS as _SP
    ap.add_argument("--speed", choices=sorted(_SP), default="exact",
                    help="ToMe token-merge approximation tiers "
                         "(balanced=0.25, fast=0.5 merge ratio)")
    from ..models.depth_pro import MODEL_PRESETS as _MP
    ap.add_argument("--model", choices=list(_MP), default="large",
                    help="model family member (base/small need a "
                         "trained/distilled checkpoint — depth-pro-distill)")
    ap.add_argument("--exported", default=None,
                    help="AOT artifact from depth-pro-export: skip the "
                         "~20-40 s startup compile (batches at the "
                         "artifact's exact shape; others jit-compile "
                         "with a warning)")
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--skip-display", action="store_true", default=False,
                    help="do not open the live matplotlib view")
    run(ap.parse_args(argv))


if __name__ == "__main__":  # pragma: no cover
    main()
