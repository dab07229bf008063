"""End-to-end video pipeline test on CPU with the tiny model config:
frames dir -> ground.json -> floor plans -> resume."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.video.pipeline import (
    frame_number,
    process_images_to_floor_plans,
)
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"output_{i:04d}.png")
    return str(d)


@pytest.fixture(scope="module")
def tiny_runner():
    return DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)


def test_frame_number():
    assert frame_number("output_0243.png") == 243
    assert frame_number("nodigits.png") is None


def test_depth_stream_batches(tiny_runner, frames_dir):
    import glob

    paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    results = list(tiny_runner.depth_stream(paths))
    assert len(results) == 3
    for r, p in zip(results, paths):
        assert r["key"] == p
        assert r["depth"].shape == (120, 160)
        assert np.isfinite(r["depth"]).all()
        assert r["image"].shape == (120, 160, 3)


def test_pipeline_end_to_end_with_resume(tiny_runner, frames_dir, tmp_path):
    out = str(tmp_path / "out")
    completed = process_images_to_floor_plans(
        frames_dir, output_dir=out, num_workers=1, fit_shapes=False,
        visualize_3d=True, runner=tiny_runner, pattern="output_*.png",
    )
    assert len(completed) == 3
    assert os.path.exists(os.path.join(frames_dir, "ground.json"))
    assert os.path.exists(os.path.join(out, "processing_progress.json"))
    for i in range(3):
        assert os.path.exists(os.path.join(out, f"output_{i:04d}_clean_simple_view.png"))
        assert os.path.exists(os.path.join(out, f"output_{i:04d}_pcd_preview.png"))
    progress = json.load(open(os.path.join(out, "processing_progress.json")))
    assert all(v["success"] for v in progress.values())

    # resume: everything already done -> early exit, progress unchanged
    completed2 = process_images_to_floor_plans(
        frames_dir, output_dir=out, resume=True, runner=tiny_runner,
    )
    assert set(completed2) == set(progress)


def test_pipeline_frame_range(tiny_runner, frames_dir, tmp_path):
    out = str(tmp_path / "range_out")
    completed = process_images_to_floor_plans(
        frames_dir, output_dir=out, start_frame=1, end_frame=1,
        num_workers=2, fit_shapes=False, runner=tiny_runner,
    )
    assert list(completed) == ["output_0001.png"]


def test_pipeline_device_geometry(tiny_runner, frames_dir, tmp_path):
    """--geometry device: the floorplan is produced by the on-chip
    program (geom/device_floorplan.py); outputs land at the same paths
    with the same progress schema, and the guard rejects modes needing
    the host cloud."""
    out = str(tmp_path / "device_out")
    completed = process_images_to_floor_plans(
        frames_dir, output_dir=out, num_workers=2, fit_shapes=False,
        geometry="device", runner=tiny_runner, force_reprocess=True,
    )
    assert len(completed) == 3
    for i in range(3):
        p = os.path.join(out, f"output_{i:04d}_clean_simple_view.png")
        assert os.path.exists(p)
        img = np.asarray(Image.open(p))
        assert img.ndim == 3 and img.shape[2] == 3

    with pytest.raises(ValueError, match="fit_shapes"):
        process_images_to_floor_plans(
            frames_dir, output_dir=out, fit_shapes=True, geometry="device",
            runner=tiny_runner, force_reprocess=True)
    with pytest.raises(ValueError, match="geometry"):
        process_images_to_floor_plans(
            frames_dir, output_dir=out, geometry="gpu",
            runner=tiny_runner, force_reprocess=True)


def test_fast_floorplan_renderer(tiny_runner, frames_dir, tmp_path):
    import time

    from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud

    out = str(tmp_path / "fast_out")
    completed = process_images_to_floor_plans(
        frames_dir, output_dir=out, num_workers=1, fit_shapes=False,
        renderer="fast", runner=tiny_runner, force_reprocess=True,
    )
    assert len(completed) == 3
    for i in range(3):
        assert os.path.exists(os.path.join(out, f"output_{i:04d}_clean_simple_view.png"))
    # direct: deterministic image with fixed limits
    rng = np.random.default_rng(0)
    cloud = PointCloud(rng.normal(0, 1, (5000, 3)) + [0, 1, 5], rng.uniform(size=(5000, 3)))
    img = fast_floorplan_image(cloud, x_limits=(-3, 3), z_limits=(2, 8), width=256)
    assert img.shape[1] == 256 and img.dtype == np.uint8
    assert (img < 230).any()


def test_runner_retries_transient_device_error(tiny_runner, monkeypatch):
    """Fault injection: the first device call raises a transient runtime
    error; the runner retries and succeeds."""
    import jax

    monkeypatch.setattr("time.sleep", lambda *_: None)  # fast retry

    class FlakyOnce:
        def __init__(self, fn):
            self.fn = fn
            self.fired = False

        def __call__(self, *a, **k):
            if not self.fired:
                self.fired = True
                raise jax.errors.JaxRuntimeError("injected transient failure")
            return self.fn(*a, **k)

    saved_cache = tiny_runner._jit
    tiny_runner._jit = {}
    orig_jit = jax.jit
    monkeypatch.setattr(jax, "jit", lambda fn, **kw: FlakyOnce(orig_jit(fn, **kw)))
    try:
        rng = np.random.default_rng(0)
        frame = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        result = tiny_runner.infer_one(frame)
        assert np.isfinite(result["depth"]).all()
    finally:
        tiny_runner._jit = saved_cache


def test_video_decode_roundtrip(tmp_path, tiny_runner):
    """mp4 -> frame stream -> depth (direct video-file input)."""
    from ml_depth_pro_video_tpu.effects.parallax import write_video
    from ml_depth_pro_video_tpu.video.decode import extract_frames, video_frames, video_info

    rng = np.random.default_rng(0)
    frames = (rng.random((6, 64, 80, 3)) * 255).astype(np.uint8)
    vid = str(tmp_path / "clip.mp4")
    write_video(vid, frames, fps=6)

    info = video_info(vid)
    assert info["frames"] == 6 and info["width"] == 80

    decoded = list(video_frames(vid, stride=2))
    assert len(decoded) == 3
    names = [n for n, _ in decoded]
    assert names[0].endswith("000000") and names[1].endswith("000002")
    assert decoded[0][1].shape == (64, 80, 3)

    # straight into the runner
    results = list(tiny_runner.depth_stream(f for _, f in decoded))
    assert len(results) == 3
    assert all(np.isfinite(r["depth"]).all() for r in results)

    out_dir = str(tmp_path / "frames")
    written = extract_frames(vid, out_dir, stride=3)
    assert len(written) == 2 and os.path.exists(written[0])

    # completed decode writes the marker with the true frame count so a
    # resume run can tell a finished extraction from a truncated one
    from ml_depth_pro_video_tpu.video.decode import DECODE_COMPLETE_MARKER

    marker = os.path.join(out_dir, DECODE_COMPLETE_MARKER)
    assert os.path.exists(marker)
    with open(marker) as f:
        assert int(f.read().strip()) == 2


def test_runner_downscale_rescales_fpx(frames_dir):
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    half = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                            downscale_factor=0.5)
    import glob

    path = sorted(glob.glob(os.path.join(frames_dir, "*.png")))[0]
    r = half.infer_one((path, 400.0))  # explicit f_px rescaled by 0.5
    assert r["depth"].shape == (60, 80)
    assert abs(r["focallength_px"] - 200.0) < 1e-3


@pytest.mark.slow
def test_mixed_fpx_batch_keeps_given_focals(tiny_runner):
    """A batch mixing EXIF and EXIF-less frames must use the provided
    f_px for the frames that have one (FOV derivation only fills the
    gaps) — one frame without EXIF no longer changes the others'
    results (reference contract: `depth_pro.py:272-276` per image)."""
    rng = np.random.default_rng(5)
    fa = (rng.random((96, 96, 3)) * 255).astype(np.uint8)
    fb = (rng.random((96, 96, 3)) * 255).astype(np.uint8)

    mixed = list(tiny_runner.depth_stream([(fa, 500.0), fb]))
    solo_a = tiny_runner.infer_one((fa, 500.0))
    solo_b = tiny_runner.infer_one(fb)  # f_px derived from FOV head

    assert mixed[0]["focallength_px"] == pytest.approx(500.0)
    np.testing.assert_allclose(mixed[0]["depth"], solo_a["depth"], rtol=1e-5)
    assert mixed[1]["focallength_px"] == pytest.approx(
        solo_b["focallength_px"], rel=1e-5)
    np.testing.assert_allclose(mixed[1]["depth"], solo_b["depth"], rtol=1e-5)


def test_runner_accepts_unit_float_images():
    """[0,1] float frames (plt.imread-style) must be rescaled, not
    clipped to an all-black uint8 image (regression)."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=1)
    rng = np.random.default_rng(0)
    floats = rng.random((8, 8, 3)).astype(np.float32)
    _, img, _ = runner._load_one(floats)
    assert img.dtype == np.uint8
    np.testing.assert_allclose(img, (floats * 255).clip(0, 255).astype(np.uint8))
    # plain [0,255] floats still pass through unscaled
    _, img2, _ = runner._load_one(floats * 255)
    np.testing.assert_allclose(img2, (floats * 255).clip(0, 255).astype(np.uint8))


def test_dp_batch_size_rounds_up_to_mesh():
    """--parallel dp with batch_size not divisible by dp would crash the
    P('dp') sharding; the runner rounds it up (regression)."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(tp=1)  # 8 fake devices -> dp=8
    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=3, mesh=mesh, parallel="dp")
    assert runner.batch_size == 8


@pytest.mark.slow
def test_depth_stream_mixed_resolutions_batched():
    """A resolution change mid-stream flushes the partial batch instead
    of crashing np.stack (regression; docstring contract)."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    rng = np.random.default_rng(0)
    frames = [
        (rng.random((64, 48, 3)) * 255).astype(np.uint8),
        (rng.random((64, 48, 3)) * 255).astype(np.uint8),
        (rng.random((40, 32, 3)) * 255).astype(np.uint8),
    ]
    results = list(runner.depth_stream(frames))
    assert len(results) == 3
    assert results[0]["depth"].shape == (64, 48)
    assert results[2]["depth"].shape == (40, 32)


@pytest.mark.slow
def test_depth_stream_pipeline_depths_equivalent():
    """pipeline_depth only changes host/device overlap, never results
    or ordering: depths 1/2/3 over 9 frames (full, partial, and
    resolution-change batches) yield identical streams."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    rng = np.random.default_rng(1)
    frames = [(rng.random((64, 48, 3)) * 255).astype(np.uint8) for _ in range(7)]
    frames.insert(4, (rng.random((40, 32, 3)) * 255).astype(np.uint8))
    frames.append((rng.random((40, 32, 3)) * 255).astype(np.uint8))

    outs = {}
    for depth in (1, 2, 3):
        runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                                  batch_size=2, pipeline_depth=depth)
        outs[depth] = list(runner.depth_stream(frames))
        assert len(outs[depth]) == len(frames)
        for r, f in zip(outs[depth], frames):
            assert r["depth"].shape == f.shape[:2]
    for depth in (2, 3):
        for a, b in zip(outs[1], outs[depth]):
            np.testing.assert_array_equal(a["depth"], b["depth"])


def test_resume_retries_failed_frames(tmp_path, monkeypatch, tiny_runner):
    """Only SUCCESSFUL frames land in processing_progress.json
    (reference schema) — a failed frame is retried on --resume instead
    of being skipped forever (regression)."""
    import json

    import ml_depth_pro_video_tpu.video.pipeline as pl

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        from PIL import Image

        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            frames_dir / f"output_{i:04d}.png")

    calls = {"n": 0}

    def fake_process(result, *a, **k):
        calls["n"] += 1
        ok = "0001" not in result["key"]  # frame 1 fails
        return ok, 0.0

    monkeypatch.setattr(pl, "process_single_frame", fake_process)
    out_dir = str(tmp_path / "plans")
    pl.process_images_to_floor_plans(
        str(frames_dir), output_dir=out_dir, num_workers=1,
        runner=tiny_runner, fit_shapes=False, renderer="fast")
    with open(f"{out_dir}/processing_progress.json") as f:
        progress = json.load(f)
    assert "output_0001.png" not in progress  # failure NOT recorded
    assert len(progress) == 2 and all(v["success"] for v in progress.values())

    calls["n"] = 0
    pl.process_images_to_floor_plans(
        str(frames_dir), output_dir=out_dir, num_workers=1,
        runner=tiny_runner, fit_shapes=False, renderer="fast", resume=True)
    assert calls["n"] == 1  # only the failed frame is reprocessed


@pytest.mark.slow
def test_parallel_decode_loader_order_and_fault_isolation(frames_dir, tmp_path):
    """decode_workers > 1: results keep input order, corrupt frames are
    skipped (not fatal), and outputs equal the serial loader's."""
    import glob

    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    bad = str(tmp_path / "corrupt.png")
    open(bad, "wb").write(b"not a png")
    items = paths[:1] + [bad] + paths[1:]

    par = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                           batch_size=2, decode_workers=4)
    assert par.decode_workers == 4
    out_p = list(par.depth_stream(items))
    assert [r["key"] for r in out_p] == paths  # order kept, corrupt skipped

    ser = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                           batch_size=2, decode_workers=1)
    ser.params = par.params
    out_s = list(ser.depth_stream(items))
    for a, b in zip(out_p, out_s):
        np.testing.assert_allclose(a["depth"], b["depth"], rtol=1e-6, atol=1e-6)


def test_runner_speed_fast_sets_merge_ratio():
    from ml_depth_pro_video_tpu.models.depth_pro import SPEED_PRESETS, tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32", speed="fast")
    assert r.cfg.token_merge_ratio == SPEED_PRESETS["fast"] > 0
    rb = DepthVideoRunner(cfg=tiny_config(), precision="fp32", speed="balanced")
    assert rb.cfg.token_merge_ratio == SPEED_PRESETS["balanced"]
    assert 0 < SPEED_PRESETS["balanced"] < SPEED_PRESETS["fast"]
    r2 = DepthVideoRunner(cfg=tiny_config(), precision="fp32")
    assert r2.cfg.token_merge_ratio == 0.0
    import pytest

    with pytest.raises(ValueError):
        DepthVideoRunner(cfg=tiny_config(), speed="warp")


def test_apply_speed_warns_on_approximate_tiers(caplog):
    """Non-exact tiers log the proxy-validated-only notice (VERDICT r3:
    an approximate tier must be documented with a bound or demoted
    behind a warning — we do both)."""
    import logging

    from ml_depth_pro_video_tpu.models.depth_pro import apply_speed, tiny_config

    with caplog.at_level(logging.WARNING,
                         logger="ml_depth_pro_video_tpu.models.depth_pro"):
        apply_speed(tiny_config(), "fast")
    assert any("APPROXIMATE" in r.getMessage() for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="ml_depth_pro_video_tpu.models.depth_pro"):
        apply_speed(tiny_config(), "exact")
    assert not any("APPROXIMATE" in r.getMessage() for r in caplog.records)


def test_float_frame_with_downscale_not_dropped(tiny_runner):
    """Regression (round-3 review): float RGB frames + downscale_factor
    crashed PIL (uint8 conversion ran AFTER the resize) and the frame
    was silently dropped."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=1, downscale_factor=0.5)
    r.params = tiny_runner.params
    frame = np.random.default_rng(0).random((120, 160, 3)).astype(np.float32)
    out = list(r.depth_stream([frame]))
    assert len(out) == 1 and out[0]["depth"].shape == (60, 80)


def test_stream_iterator_failure_raises(tiny_runner):
    """Regression (round-3 review): an items-iterator exception ended
    the stream as if it completed normally; it must raise."""
    import pytest

    def bad_gen():
        yield np.zeros((64, 64, 3), np.uint8)
        raise IOError("container died")

    with pytest.raises(RuntimeError, match="frame source iterator failed"):
        list(tiny_runner.depth_stream(bad_gen()))


def test_extract_frames_clears_stale_marker(tmp_path):
    """Re-extraction removes the previous decode-complete marker BEFORE
    decoding: if the new run is interrupted, the old marker must not
    validate the now-mixed/truncated frame set on resume (review r4)."""
    from ml_depth_pro_video_tpu.effects.parallax import write_video
    from ml_depth_pro_video_tpu.video.decode import (
        DECODE_COMPLETE_MARKER,
        extract_frames,
    )

    rng = np.random.default_rng(0)
    frames = (rng.random((4, 32, 40, 3)) * 255).astype(np.uint8)
    vid = str(tmp_path / "clip.mp4")
    write_video(vid, frames, fps=4)
    out_dir = str(tmp_path / "frames")
    marker = os.path.join(out_dir, DECODE_COMPLETE_MARKER)

    extract_frames(vid, out_dir)
    assert os.path.exists(marker)

    # simulate an interrupted re-extraction: the marker must already be
    # gone by the time the first frame decodes
    import ml_depth_pro_video_tpu.video.decode as dec

    def boom(*a, **k):
        assert not os.path.exists(marker), "stale marker survived into decode"
        raise RuntimeError("interrupted")
        yield  # pragma: no cover - make it a generator

    orig = dec.video_frames
    dec.video_frames = boom
    try:
        with pytest.raises(RuntimeError):
            extract_frames(vid, out_dir)
    finally:
        dec.video_frames = orig
    assert not os.path.exists(marker)


@pytest.mark.slow
def test_process_decode_pool_matches_thread_pool(frames_dir):
    """decode_pool="process" (pre-forked spawn workers, VERDICT r4 #6)
    must yield the same ordered results as the thread pool, skip corrupt
    frames the same way, and leave ndarray items on the thread path."""
    import glob

    from ml_depth_pro_video_tpu.video.runner import _load_frame

    paths = sorted(glob.glob(os.path.join(frames_dir, "*.png")))
    bad = os.path.join(frames_dir, "corrupt.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    items = paths[:1] + [bad] + paths[1:]

    t_runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                                batch_size=2, decode_pool="thread",
                                decode_workers=2)
    p_runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                                batch_size=2, decode_pool="process",
                                decode_workers=2)
    p_runner.params = t_runner.params
    ref = list(t_runner.depth_stream(items))
    got = list(p_runner.depth_stream(items))
    assert [r["key"] for r in got] == [r["key"] for r in ref] == paths
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g["depth"], r["depth"])
    os.remove(bad)

    # module-level loader is what ships to the children; spot-check it
    key, img, f_px = _load_frame(paths[0])
    assert key == paths[0] and img.dtype == np.uint8 and f_px is None

    # constructor validation + auto resolution
    with pytest.raises(ValueError, match="decode_pool"):
        DepthVideoRunner(cfg=tiny_config(), decode_pool="forkbomb")
    auto = DepthVideoRunner(cfg=tiny_config(), decode_pool="auto",
                            decode_workers=1)
    assert auto.decode_pool == "thread"  # 1 worker never pays spawn cost
