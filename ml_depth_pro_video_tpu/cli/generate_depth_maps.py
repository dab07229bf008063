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
                   invert: bool = False, vmin: float | None = None,
                   vmax: float | None = None) -> np.ndarray:
    """Depth map -> normalized color or grayscale visualization.

    Reference semantics (`generate_depth_maps.py:29-44,136-139`): plain
    min-max normalization of METRIC depth (near = low value), nan-robust
    with clipping; no inversion. ``invert=True`` remains available for
    inverse-depth-style display. ``vmin``/``vmax`` pin the normalization
    range (video streams need a stable range across frames — per-frame
    min-max flickers the colors even when the depth itself is steady)."""
    d = np.asarray(depth, dtype=np.float64)
    finite = np.isfinite(d)
    if not finite.any():
        d = np.zeros_like(d)
        lo, hi = 0.0, 1.0
    else:
        lo = d[finite].min() if vmin is None else float(vmin)
        hi = d[finite].max() if vmax is None else float(vmax)
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
    model: str = "large",
    exported_path: str | None = None,
    packed_fetch: bool = False,
) -> list[str]:
    """Run depth over a file or directory; returns written paths.

    Multi-host (pod slices): after ``parallel.multihost.initialize()``
    run the SAME command on every host — the frame list shards over the
    pod's chips, ONE SPMD program spans all of them, and each host
    writes only its own frames' outputs (shared or per-host output
    filesystems both work; file names carry the frame stem either way).
    """
    import jax

    from ..video.runner import DepthVideoRunner

    pod = jax.process_count() > 1
    if os.path.isdir(input_path):
        paths = sorted(glob.glob(os.path.join(input_path, pattern)))
    else:
        paths = [input_path]
    if pod:
        # every host must batch the PRIMARY's list — a stale shared-FS
        # glob on one host would silently desync the pod's row split
        # (and the empty-input error below must fire on all hosts or
        # none, else the others hang in the collective)
        from ..parallel import multihost as mh

        paths = mh.broadcast_json(paths)
    if not paths:
        raise FileNotFoundError(f"no inputs under {input_path}")
    os.makedirs(output_dir, exist_ok=True)

    from ..models.depth_pro import model_preset
    if pod and exported_path is not None:
        raise ValueError("--exported serves the single-device path; "
                         "pod runs jit their mesh program")
    if pod and packed_fetch:
        raise ValueError("--packed_fetch is single-host only (pod hosts "
                         "fetch only their local rows)")
    if runner is None:
        mesh = None
        if pod:
            from ..parallel.mesh import make_mesh

            # one dp mesh over ALL hosts' chips; the runner rounds
            # batch_size up to a dp multiple itself
            mesh = make_mesh()
            batch_size = max(batch_size, jax.device_count())
        runner = DepthVideoRunner(
            cfg=model_preset(model),
            precision="bf16" if half_precision else "fp32",
            batch_size=batch_size,
            downscale_factor=downscale_factor,
            speed=speed,
            mesh=mesh,
            exported_path=exported_path,
            fetch_pack="u16" if packed_fetch else "none",
        )
    stream = (runner.depth_stream_multihost(paths) if pod
              else runner.depth_stream(paths))
    n_expect = len(paths)
    if pod:
        # this host yields only its rows of each batch; size the
        # progress denominator to them
        from ..parallel import multihost as mh
        from ..parallel.mesh import batch_sharding

        n_expect = mh.local_item_count(batch_sharding(runner.mesh),
                                       runner.batch_size, len(paths))

    written = []
    t0 = time.time()
    # per-image fault isolation (reference `generate_depth_maps.py:147-151,
    # 202-203`): one bad frame must not lose the rest of the batch
    for i, result in enumerate(stream):
        stem = os.path.splitext(os.path.basename(result["key"]))[0]
        try:
            out = os.path.join(output_dir, f"{stem}_depth.png")
            save_depth_image(out, colorize_depth(result["depth"], colormap))
            written.append(out)
            if save_npz:
                np.savez_compressed(os.path.join(output_dir, f"{stem}_depth.npz"),
                                    depth=result["depth"],
                                    focallength_px=result["focallength_px"])
            print(f"[{i+1}/{n_expect}] {stem} ({(time.time()-t0)/(i+1):.2f}s/frame avg)")
        except Exception as exc:  # noqa: BLE001
            print(f"Error processing {stem}: {exc}")
    if pod:
        print(f"[host {jax.process_index()}/{jax.process_count()}] wrote "
              f"{len(written)} of this host's rows ({len(paths)} frames total)")
    else:
        print(f"Successfully wrote {len(written)}/{len(paths)} depth maps")
    return written


VIDEO_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}


class _RangeTracker:
    """EMA-stabilized (lo, hi) normalization range over a depth stream.

    Per-frame min-max (the reference's still-image behavior) makes the
    colormap breathe as the scene's depth extent changes frame to
    frame. ``momentum`` blends each frame's range into a running one
    (0 = per-frame, reference behavior); an explicit ``fixed`` range
    disables tracking entirely. The range only ever moves toward the
    observed extremes at the smoothed rate, so a single outlier frame
    cannot blow out the whole video's contrast."""

    def __init__(self, momentum: float = 0.9,
                 fixed: tuple[float, float] | None = None):
        self.momentum = float(momentum)
        self.fixed = fixed
        self.lo = self.hi = None

    def update(self, depth: np.ndarray) -> tuple[float, float]:
        if self.fixed is not None:
            return self.fixed
        finite = np.isfinite(depth)
        if not finite.any():
            return (self.lo, self.hi) if self.lo is not None else (0.0, 1.0)
        lo, hi = float(depth[finite].min()), float(depth[finite].max())
        if self.lo is None:
            self.lo, self.hi = lo, hi
        else:
            m = self.momentum
            self.lo = m * self.lo + (1.0 - m) * lo
            self.hi = m * self.hi + (1.0 - m) * hi
        return self.lo, self.hi


def generate_depth_video(
    input_path: str,
    output_path: str,
    colormap: str = "turbo",
    downscale_factor: float = 1.0,
    half_precision: bool = True,
    batch_size: int = 1,
    speed: str = "exact",
    temporal_smooth: float = 0.0,
    side_by_side: bool = False,
    depth_range: tuple[float, float] | None = None,
    range_momentum: float = 0.9,
    fps: float | None = None,
    start: int = 0,
    end: int | None = None,
    stride: int = 1,
    pattern: str = "*.png",
    runner=None,
    model: str = "large",
    packed_fetch: bool = False,
) -> int:
    """Video file (or frame directory) -> colormapped depth VIDEO.

    One command for the full video-depth story the reference spreads
    over two scripts and a frame directory
    (`/root/reference/generate_depth_maps.py:153-206` writes per-frame
    PNGs that something else must re-encode): frames stream from the
    decoder through the resident batched model into a streaming encoder
    — no intermediate files, O(1) host memory. Colors use an
    EMA-stabilized normalization range (``depth_range`` pins it);
    ``side_by_side`` writes [RGB | depth]; ``temporal_smooth`` engages
    the flicker filter (video/temporal.py). Returns frames written.
    """
    from ..video.runner import DepthVideoRunner
    from ..video.writer import VideoSink

    if colormap in ("gray16", "grayscale16"):
        raise ValueError("16-bit grayscale is for PNG output; video "
                         "frames are 8-bit (use --colormap gray)")

    if os.path.isdir(input_path):
        paths = sorted(glob.glob(os.path.join(input_path, pattern)))
        if not paths:
            raise FileNotFoundError(f"no {pattern} frames under {input_path}")
        # end is INCLUSIVE, matching video_frames' frame-index semantics
        items = paths[start:None if end is None else end + 1:stride]
        n_est, src_fps = len(items), 30.0
    else:
        from ..video.decode import video_frames, video_info

        info = video_info(input_path)
        src_fps = (info["fps"] or 30.0) / max(stride, 1)
        n_est = None  # CAP_PROP_FRAME_COUNT is an estimate; don't trust it
        items = (frame for _, frame in video_frames(input_path, start=start,
                                                    end=end, stride=stride))

    from ..models.depth_pro import model_preset

    runner = runner or DepthVideoRunner(
        cfg=model_preset(model),
        precision="bf16" if half_precision else "fp32",
        batch_size=batch_size,
        downscale_factor=downscale_factor,
        speed=speed,
        temporal_smooth=temporal_smooth,
        fetch_pack="u16" if packed_fetch else "none",
    )
    tracker = _RangeTracker(momentum=range_momentum, fixed=depth_range)
    t0 = time.time()
    with VideoSink(output_path, fps=fps or src_fps) as sink:
        for i, result in enumerate(runner.depth_stream(items)):
            lo, hi = tracker.update(result["depth"])
            frame = colorize_depth(result["depth"], colormap, vmin=lo, vmax=hi)
            if frame.ndim == 2:  # gray colormap -> 3-channel for video
                frame = np.repeat(frame[..., None], 3, axis=2)
            if side_by_side:
                frame = np.concatenate([result["image"], frame], axis=1)
            sink.append(frame)
            if (i + 1) % 25 == 0:
                tot = f"/{n_est}" if n_est else ""
                print(f"[{i+1}{tot}] {(time.time()-t0)/(i+1):.2f}s/frame avg")
    print(f"Wrote {sink.frames_written} depth frames -> {output_path}")
    return sink.frames_written


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Batch depth maps (TPU-native)")
    ap.add_argument("input", help="image file, frames directory, or (with "
                                  "--video_out) a video file")
    ap.add_argument("-o", "--output_dir",
                    help="PNG output directory (required unless --video_out)")
    ap.add_argument("--video_out", default=None, metavar="OUT.mp4",
                    help="encode a colormapped depth VIDEO instead of PNGs "
                         "(input may be a video file or a frames directory)")
    ap.add_argument("--side_by_side", action="store_true",
                    help="with --video_out: write [RGB | depth] frames")
    ap.add_argument("--temporal_smooth", type=float, default=0.0,
                    help="with --video_out: EMA weight (0=off) for "
                         "flicker-free depth (video/temporal.py)")
    ap.add_argument("--depth_range", type=float, nargs=2, default=None,
                    metavar=("NEAR", "FAR"),
                    help="with --video_out: fix the colormap range in "
                         "meters (default: EMA-stabilized per-stream range)")
    ap.add_argument("--fps", type=float, default=None,
                    help="with --video_out: output fps (default: source "
                         "fps / stride, or 30 for frame directories)")
    ap.add_argument("--start", type=int, default=0,
                    help="first frame index (video/frames input)")
    ap.add_argument("--end", type=int, default=None,
                    help="last frame index, inclusive")
    ap.add_argument("--stride", type=int, default=1,
                    help="keep every Nth frame")
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
    ap.add_argument("--exported", default=None,
                    help="AOT artifact from depth-pro-export: skip the "
                         "~20-40 s startup compile (single-host PNG mode; "
                         "batches at the artifact's exact shape)")
    from ..models.depth_pro import MODEL_PRESETS as _MP
    ap.add_argument("--packed_fetch", action="store_true",
                    help="fetch depth as device-quantized log-u16 (half "
                         "the device->host bytes; <=~2.5e-4 relative "
                         "error - video/pack.py)")
    ap.add_argument("--model", choices=list(_MP), default="large",
                    help="model family member (base/small need a "
                         "trained/distilled checkpoint — depth-pro-distill)")
    from ..parallel.multihost import add_multihost_args, initialize_from_args
    add_multihost_args(ap)
    args = ap.parse_args(argv)
    # before any device use (no-op single-host); with a pod joined, the
    # frame directory shards over every host's chips and each host
    # writes its own rows' PNGs
    pod = initialize_from_args(args)
    if pod and args.video_out:
        ap.error("--video_out needs every frame in playback order on one "
                 "host; run it single-host (or write PNGs multi-host and "
                 "encode them afterwards)")
    is_video = os.path.splitext(args.input)[1].lower() in VIDEO_EXTS
    if args.video_out:
        generate_depth_video(
            args.input, args.video_out, colormap=args.colormap,
            downscale_factor=args.downscale_factor,
            half_precision=args.half_precision, batch_size=args.batch_size,
            speed=args.speed, temporal_smooth=args.temporal_smooth,
            side_by_side=args.side_by_side,
            depth_range=tuple(args.depth_range) if args.depth_range else None,
            fps=args.fps, start=args.start, end=args.end, stride=args.stride,
            pattern=args.pattern, model=args.model,
            packed_fetch=args.packed_fetch)
        return
    if is_video:
        ap.error(f"{args.input} is a video file — pass --video_out OUT.mp4, "
                 "or pre-extract frames (depth-pro-video --video decodes to "
                 "a frames directory)")
    if not args.output_dir:
        ap.error("-o/--output_dir is required (or use --video_out)")
    generate_depth_maps(args.input, args.output_dir, colormap=args.colormap, speed=args.speed,
                        downscale_factor=args.downscale_factor,
                        half_precision=args.half_precision,
                        batch_size=args.batch_size, save_npz=args.save_npz,
                        pattern=args.pattern, model=args.model,
                        exported_path=args.exported,
                        packed_fetch=args.packed_fetch)


if __name__ == "__main__":  # pragma: no cover
    main()
