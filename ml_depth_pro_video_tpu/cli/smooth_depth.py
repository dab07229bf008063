"""Post-pass temporal smoothing of saved depth-map sequences.

The streaming paths smooth inline (`--temporal_smooth` on
`depth-pro-maps` / `depth-pro-video`), but a POD run cannot: frames
interleave across hosts, so no single stream sees playback order
(`video/runner.py::depth_stream_multihost` raises and points here).
The workflow is: the pod writes per-frame metric ``.npz`` maps
(`depth-pro-maps --save_npz` / `depth-pro-run`), then one host runs

  depth-pro-smooth maps_dir/ --output_dir smoothed/

over the assembled sequence. The filter is `video/temporal.py`
(inverse-depth scale+shift alignment + motion-gated EMA — identical to
the inline path), applied in frame-number order (lexicographic where
names carry no number, matching the video pipeline's ordering,
`video/pipeline.py::frame_number`).

The reference has no temporal story at all — every frame is
independent (`/root/reference/pointcloud_pipeline.py:473-890`).
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys


def _ordered(paths: list[str]) -> list[str]:
    """Frame-number-aware playback order: numeric where names embed a
    frame number (frame_2 before frame_10), lexicographic otherwise."""
    from ..video.pipeline import frame_number

    def k(p: str):
        n = frame_number(os.path.basename(p))
        return (0, n, p) if n is not None else (1, 0, p)

    return sorted(paths, key=k)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="Temporal smoothing post-pass over saved depth maps "
                    "(the multi-host/pod complement of --temporal_smooth)")
    ap.add_argument("input", help="directory of .npz/.npy depth maps")
    ap.add_argument("-o", "--output_dir", default=None,
                    help="write smoothed maps here (same basenames); "
                         "default: rewrite each file IN PLACE")
    ap.add_argument("--pattern", default="*.npz",
                    help="glob under the input directory (default *.npz; "
                         "use '*_depth.npz' for depth-pro-maps output)")
    ap.add_argument("--alpha", type=float, default=0.8,
                    help="EMA history weight on static pixels "
                         "(0.8 ≈ 5-frame memory)")
    ap.add_argument("--tau", type=float, default=0.05,
                    help="relative inverse-depth change above which a "
                         "pixel counts as real motion and passes through")
    ap.add_argument("--no_align", action="store_true",
                    help="skip the per-frame global scale+shift fit")
    ap.add_argument("--key", default="depth",
                    help="npz array name holding the depth map")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if not os.path.isdir(args.input):
        sys.exit(f"not a directory: {args.input}")
    paths = _ordered(glob.glob(os.path.join(args.input, args.pattern)))
    if not paths:
        sys.exit(f"no {args.pattern} files under {args.input}")

    from ..video.temporal import smooth_depth_files

    n = smooth_depth_files(paths, output_dir=args.output_dir,
                           alpha=args.alpha, tau=args.tau,
                           align=not args.no_align, key=args.key)
    dest = args.output_dir or f"{args.input} (in place)"
    logging.getLogger(__name__).info("smoothed %d depth maps -> %s", n, dest)


if __name__ == "__main__":  # pragma: no cover
    main()
