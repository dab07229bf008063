"""Effects (parallax/anaglyph) and CLI tests."""

import os

import numpy as np
import pytest
from PIL import Image

from ml_depth_pro_video_tpu.effects.parallax import (
    anaglyph_image,
    bilinear_sample,
    parallax_frames,
    write_video,
)

import jax.numpy as jnp


def test_bilinear_sample_identity_and_interp():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
    ys, xs = np.meshgrid(np.arange(3, dtype=np.float32), np.arange(4, dtype=np.float32), indexing="ij")
    out = bilinear_sample(img, jnp.asarray(xs), jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    # halfway between pixels 0 and 1 -> 0.5
    mid = bilinear_sample(img, jnp.asarray([[0.5]]), jnp.asarray([[0.0]]))
    np.testing.assert_allclose(np.asarray(mid), [[[0.5]]])


def test_parallax_frames_shapes_and_motion():
    rng = np.random.default_rng(0)
    img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    depth = rng.uniform(1, 10, (24, 32))
    for motion in ("circle", "zoom", "swing"):
        frames = parallax_frames(img, depth, duration=0.2, fps=10, motion_type=motion)
        assert frames.shape == (2, 24, 32, 3)
        assert frames.dtype == np.uint8
    # frames must actually differ (motion applied)
    frames = parallax_frames(img, depth, duration=0.5, fps=10, amplitude=0.1)
    assert np.abs(frames[0].astype(int) - frames[2].astype(int)).max() > 0


def test_anaglyph_channels():
    rng = np.random.default_rng(1)
    img = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    depth = np.tile(np.linspace(1, 5, 20), (16, 1))
    out = anaglyph_image(img, depth, separation=0.1)
    assert out.shape == img.shape and out.dtype == np.uint8
    # red channel comes from the left-shifted view, so it differs from input
    assert (out[..., 0] != img[..., 0]).any()


def test_write_video(tmp_path):
    frames = np.zeros((4, 16, 16, 3), np.uint8)
    p = str(tmp_path / "clip.mp4")
    write_video(p, frames, fps=4)
    assert os.path.getsize(p) > 0


def test_generate_depth_maps_cli(tmp_path):
    from ml_depth_pro_video_tpu.cli.generate_depth_maps import (
        colorize_depth,
        generate_depth_maps,
    )
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    d16 = colorize_depth(np.linspace(1, 10, 12).reshape(3, 4), "gray16")
    assert d16.dtype == np.uint16 and d16.max() == 65535

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray((rng.random((96, 128, 3)) * 255).astype(np.uint8)).save(
            frames / f"f_{i}.png"
        )
    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    out = tmp_path / "depths"
    written = generate_depth_maps(str(frames), str(out), colormap="turbo",
                                  save_npz=True, runner=runner)
    assert len(written) == 2
    for w in written:
        assert os.path.exists(w)
    assert os.path.exists(out / "f_0_depth.npz")
    npz = np.load(out / "f_0_depth.npz")
    assert npz["depth"].shape == (96, 128)


def test_parallax_chunking_is_value_exact():
    """Regression (round-3 review fix): clips render in fixed-size
    chunks; chunk boundaries must not change any pixel."""
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.effects import parallax as par

    rng = np.random.default_rng(0)
    img = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    depth = (1 + rng.random((40, 48))).astype(np.float32)

    whole = par.parallax_frames(img, depth, duration=0.6, fps=10)  # 6 frames

    img_j = jnp.asarray(img.astype(np.float32))
    d = depth
    dn = jnp.asarray((d - d.min()) / max(d.max() - d.min(), 1e-9))
    phases = 2.0 * np.pi * np.arange(6, dtype=np.float32) / 6
    out = np.empty_like(whole)
    chunk = 4  # forces a padded tail chunk
    for i in range(0, 6, chunk):
        sel = phases[i:i + chunk]
        ts = jnp.asarray(np.pad(sel, (0, chunk - len(sel))))
        fr = par._parallax_chunk(img_j, dn, 0.05, ts, "circle")
        out[i:i + len(sel)] = np.clip(np.asarray(fr[:len(sel)]), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, whole)
