"""Video -> depth-video path: streaming sink, range tracker, CLI driver."""

import os

import numpy as np
import pytest
from PIL import Image

from ml_depth_pro_video_tpu.cli.generate_depth_maps import (
    _RangeTracker,
    generate_depth_video,
)
from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.video.decode import video_info
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner
from ml_depth_pro_video_tpu.video.writer import VideoSink


@pytest.fixture(scope="module")
def runner():
    return DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)


def _synthetic_frames(n, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    # slide a bright square so frames differ
    frames = []
    for i in range(n):
        f = base.copy()
        x = 4 + 3 * i
        f[10:20, x:x + 10] = 255
        frames.append(f)
    return np.stack(frames)


def test_video_sink_roundtrip(tmp_path):
    p = str(tmp_path / "clip.mp4")
    frames = _synthetic_frames(5)
    with VideoSink(p, fps=8) as sink:
        for f in frames:
            sink.append(f)
    assert sink.frames_written == 5
    info = video_info(p)
    assert info["frames"] == 5
    assert (info["height"], info["width"]) == frames.shape[1:3]


def test_video_sink_rejects_size_change(tmp_path):
    with VideoSink(str(tmp_path / "clip.mp4"), fps=8) as sink:
        sink.append(np.zeros((32, 48, 3), np.uint8))
        with pytest.raises(ValueError, match="frame size"):
            sink.append(np.zeros((48, 32, 3), np.uint8))


def test_range_tracker_fixed_and_ema():
    fixed = _RangeTracker(fixed=(1.0, 5.0))
    assert fixed.update(np.array([0.0, 99.0])) == (1.0, 5.0)

    perframe = _RangeTracker(momentum=0.0)
    assert perframe.update(np.array([2.0, 4.0])) == (2.0, 4.0)
    assert perframe.update(np.array([1.0, 9.0])) == (1.0, 9.0)

    ema = _RangeTracker(momentum=0.9)
    ema.update(np.array([2.0, 4.0]))
    lo, hi = ema.update(np.array([1.0, 9.0]))
    # moves toward the new extremes at the smoothed rate only
    assert 1.0 < lo < 2.0 and 4.0 < hi < 9.0
    # an all-NaN frame keeps the previous range instead of crashing
    assert ema.update(np.full((4,), np.nan)) == (lo, hi)


def test_depth_video_from_video_file(tmp_path, runner):
    from ml_depth_pro_video_tpu.effects.parallax import write_video

    src = str(tmp_path / "src.mp4")
    write_video(src, _synthetic_frames(6), fps=6)
    out = str(tmp_path / "depth.mp4")
    n = generate_depth_video(src, out, runner=runner)
    assert n == 6
    info = video_info(out)
    assert info["frames"] == 6
    assert (info["height"], info["width"]) == (48, 64)
    assert abs(info["fps"] - 6.0) < 0.5  # source fps carried over


def test_depth_video_from_frames_dir_side_by_side(tmp_path, runner):
    d = tmp_path / "frames"
    d.mkdir()
    for i, f in enumerate(_synthetic_frames(5)):
        Image.fromarray(f).save(str(d / f"frame_{i:04d}.png"))
    out = str(tmp_path / "sbs.mp4")
    # end is inclusive, stride keeps frames 0, 2, 4
    n = generate_depth_video(str(d), out, runner=runner, side_by_side=True,
                             colormap="gray", end=4, stride=2, fps=4)
    assert n == 3
    info = video_info(out)
    assert info["frames"] == 3
    assert (info["height"], info["width"]) == (48, 128)  # [RGB | depth]


def test_depth_video_rejects_gray16(tmp_path, runner):
    with pytest.raises(ValueError, match="16-bit"):
        generate_depth_video("whatever.mp4", str(tmp_path / "o.mp4"),
                             colormap="gray16", runner=runner)


def test_cli_arg_validation(tmp_path):
    from ml_depth_pro_video_tpu.cli.generate_depth_maps import main

    # video input without --video_out must fail loudly (before any model
    # is built), as must PNG mode without an output dir
    with pytest.raises(SystemExit):
        main(["clip.mp4"])
    with pytest.raises(SystemExit):
        main([str(tmp_path)])
