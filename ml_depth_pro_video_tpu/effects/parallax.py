"""Depth-based 3D effects: parallax videos and red-cyan anaglyphs.

Capability parity with `/root/reference/OLD_SCRIPTS/depth_video_effect.py`
(named in the benchmark configs): circle/zoom/swing camera motions with
depth-weighted displacement ``d * (1 - depth_norm)`` and anaglyph
synthesis from +-separation shifted views.

TPU-first redesign: the per-frame ``cv2.remap`` loop becomes ONE jitted
program — a bilinear gather vmapped over all frames of the clip, so the
entire effect renders in a single device launch; the host only encodes
the video.

Two reference bugs are deliberately FIXED, not replicated (documented
per CLAUDE.md policy): `depth_video_effect.py:104,170-171` feed
TRANSPOSED coordinate maps to ``cv2.remap`` (garbage for non-square
frames), and `:107,180` write RGB arrays through BGR writers, swapping
the red/blue channels of every output video and anaglyph.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) image at fractional coords (torch/cv2 INTER_LINEAR
    semantics with border clamp). Corner lookups go through ONE flat
    linear-index gather each — measurably faster than 2-D advanced
    indexing on TPU (65 vs 90 ms/frame at 1536^2,
    scripts/tpu_warp_profile.out)."""
    h, w = image.shape[:2]
    flat = image.reshape(-1, image.shape[-1])
    x = jnp.clip(map_x, 0.0, w - 1.0)
    y = jnp.clip(map_y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = jnp.take(flat, y0 * w + x0, axis=0)
    v01 = jnp.take(flat, y0 * w + x1, axis=0)
    v10 = jnp.take(flat, y1 * w + x0, axis=0)
    v11 = jnp.take(flat, y1 * w + x1, axis=0)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@functools.partial(jax.jit, static_argnames=("motion_type",))
def _parallax_chunk(image, depth_norm, amplitude, ts, motion_type: str):
    """Render the frames at phases ``ts`` (one device launch per chunk)."""
    h, w = image.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    inv = 1.0 - depth_norm

    def one_frame(t):
        if motion_type == "circle":
            dx = amplitude * w * jnp.cos(t)
            dy = amplitude * h * jnp.sin(t)
            map_x = xs + dx * inv
            map_y = ys + dy * inv
        elif motion_type == "zoom":
            zoom = 1.0 + amplitude * jnp.sin(t)
            map_x = xs + (1 - zoom) * (xs - w / 2)
            map_y = ys + (1 - zoom) * (ys - h / 2)
        elif motion_type == "swing":
            dx = amplitude * w * jnp.sin(t)
            map_x = xs + dx * inv
            map_y = ys
        else:
            raise ValueError(f"Unknown motion type: {motion_type}")
        # clip + uint8 ON DEVICE: the host fetch then moves 4x less
        # data and skips a 250 MB/chunk clip+astype pass on one core
        return jnp.clip(bilinear_sample(image, map_x, map_y), 0, 255).astype(jnp.uint8)

    return jax.lax.map(one_frame, ts)


def parallax_frames(image: np.ndarray, depth: np.ndarray, duration: float = 5.0,
                    fps: int = 30, amplitude: float = 0.05,
                    motion_type: str = "circle") -> np.ndarray:
    """Render all parallax frames on-device; returns (T, H, W, 3) uint8.

    Frames render in fixed-size chunks streamed to the host (~256 MB of
    device output per launch; the last chunk is phase-padded so ONE
    compiled program covers the whole clip) — a long 4K clip would
    otherwise materialize tens of GB in one buffer and OOM the chip."""
    img = jnp.asarray(np.asarray(image, dtype=np.float32))
    d = np.asarray(depth, dtype=np.float32)
    depth_norm = jnp.asarray((d - d.min()) / max(d.max() - d.min(), 1e-9))
    h, w = image.shape[:2]
    total = int(duration * fps)
    phases = 2.0 * np.pi * np.arange(total, dtype=np.float32) / max(total, 1)
    # chunk output is uint8 on device; per-frame fp32 temps live only
    # inside the lax.map body
    chunk = max(1, min(total, int(256e6 // (h * w * 3))))
    out = np.empty((total, h, w, 3), np.uint8)
    pending = None  # one-deep pipeline: dispatch chunk i+1, then fetch i
    for i in range(0, total, chunk):
        sel = phases[i:i + chunk]
        ts = jnp.asarray(np.pad(sel, (0, chunk - len(sel))))
        fr = _parallax_chunk(img, depth_norm, float(amplitude), ts, motion_type)
        if pending is not None:
            j, m, prev = pending
            out[j:j + m] = np.asarray(prev[:m])
        pending = (i, len(sel), fr)
    if pending is not None:
        j, m, prev = pending
        out[j:j + m] = np.asarray(prev[:m])
    return out


@jax.jit
def _anaglyph(image, depth_norm, dx: jnp.ndarray):
    h, w = image.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    inv = 1.0 - depth_norm
    left = bilinear_sample(image, xs + dx * inv, ys)
    right = bilinear_sample(image, xs - dx * inv, ys)
    return jnp.stack([left[..., 0], right[..., 1], right[..., 2]], axis=-1)


def anaglyph_image(image: np.ndarray, depth: np.ndarray,
                   separation: float = 0.05) -> np.ndarray:
    """Red-cyan anaglyph; returns (H, W, 3) uint8 RGB."""
    img = jnp.asarray(np.asarray(image, dtype=np.float32))
    d = np.asarray(depth, dtype=np.float32)
    depth_norm = (d - d.min()) / max(d.max() - d.min(), 1e-9)
    dx = separation * image.shape[1]
    out = _anaglyph(img, jnp.asarray(depth_norm), jnp.float32(dx))
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def write_video(path: str, frames: np.ndarray, fps: int = 30) -> None:
    """Encode (T, H, W, 3) uint8 RGB frames to a video file on the host."""
    import logging
    import os

    try:
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
    except Exception as exc:  # noqa: BLE001 - fall back, but say why
        logging.getLogger(__name__).warning(
            "cv2 video encode failed (%s); falling back to imageio", exc)
        # a half-written cv2 file must not survive next to (or as) the
        # fallback's output
        if os.path.exists(path):
            try:
                os.remove(path)
            except OSError:
                pass
        import imageio

        imageio.mimsave(path, list(frames), fps=fps)


def create_parallax_effect(image_path: str, output_path: str, duration: float = 5.0,
                           fps: int = 30, amplitude: float = 0.05,
                           motion_type: str = "circle", resolution_scale: float = 1.0,
                           runner=None) -> None:
    """End-to-end: image -> depth -> parallax mp4."""
    from ..video.runner import DepthVideoRunner

    runner = runner or DepthVideoRunner()
    result = runner.infer_one(image_path)
    image, depth = result["image"], result["depth"]
    if resolution_scale != 1.0:
        from PIL import Image as PILImage

        h = int(image.shape[0] * resolution_scale)
        w = int(image.shape[1] * resolution_scale)
        image = np.asarray(PILImage.fromarray(image).resize((w, h)))
        depth = np.asarray(PILImage.fromarray(depth).resize((w, h), PILImage.BILINEAR))
    frames = parallax_frames(image, depth, duration, fps, amplitude, motion_type)
    write_video(output_path, frames, fps)


def create_3d_anaglyph(image_path: str, output_path: str,
                       separation: float = 0.05, runner=None) -> np.ndarray:
    from PIL import Image as PILImage

    from ..video.runner import DepthVideoRunner

    runner = runner or DepthVideoRunner()
    result = runner.infer_one(image_path)
    out = anaglyph_image(result["image"], result["depth"], separation)
    PILImage.fromarray(out).save(output_path)
    return out


def main(argv=None):  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(description="3D effects from depth (TPU-native)")
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--effect", default="parallax", choices=["parallax", "anaglyph"])
    ap.add_argument("--duration", type=float, default=5.0)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--amplitude", type=float, default=0.05)
    ap.add_argument("--motion", default="circle", choices=["circle", "zoom", "swing"])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--separation", type=float, default=0.05)
    args = ap.parse_args(argv)
    if args.effect == "parallax":
        create_parallax_effect(args.image_path, args.output_path, args.duration,
                               args.fps, args.amplitude, args.motion, args.scale)
    else:
        create_3d_anaglyph(args.image_path, args.output_path, args.separation)


if __name__ == "__main__":  # pragma: no cover
    main()
