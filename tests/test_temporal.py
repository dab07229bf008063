"""Temporal depth smoothing (video/temporal.py): noise reduction on
static scenes, motion pass-through (no ghosting), scale-flicker
removal, and the runner integration."""

import os

import numpy as np

from ml_depth_pro_video_tpu.video.temporal import TemporalSmoother


def _static_scene(h=32, w=40):
    rng = np.random.default_rng(0)
    base = 2.0 + rng.random((h, w)).astype(np.float32)
    return base


def test_static_scene_noise_is_attenuated():
    base = _static_scene()
    rng = np.random.default_rng(1)
    sm = TemporalSmoother(alpha=0.8, align=False)
    raw_err, smooth_err = [], []
    out = None
    for _ in range(30):
        noisy = base * (1.0 + 0.01 * rng.standard_normal(base.shape).astype(np.float32))
        out = sm.update(noisy)
        raw_err.append(np.abs(noisy - base).mean())
        smooth_err.append(np.abs(out - base).mean())
    # steady-state EMA variance reduction: var factor (1-a)/(1+a) = 1/9
    # -> ~3x std; require >2x on the mean abs error tail
    assert np.mean(smooth_err[-10:]) < np.mean(raw_err[-10:]) / 2.0


def test_motion_passes_through_without_ghosting():
    base = _static_scene()
    sm = TemporalSmoother(alpha=0.9, align=False)
    sm.update(base)
    moved = base.copy()
    moved[10:20, 10:20] = 0.8  # object jumps much closer (>tau change)
    out = sm.update(moved)
    # the moved region is the CURRENT frame's values exactly
    np.testing.assert_allclose(out[10:20, 10:20], 0.8, rtol=1e-5)
    # and the next frame blends against the RE-SEEDED state, not the old
    out2 = sm.update(moved)
    np.testing.assert_allclose(out2[10:20, 10:20], 0.8, rtol=1e-5)


def test_global_scale_flicker_is_removed():
    base = _static_scene()
    sm = TemporalSmoother(alpha=0.5, align=True)
    sm.update(base)
    # 3% global scale jitter: inverse depth scales by 1/1.03 -> inside
    # the 2*tau fit band; alignment should snap it back to the state
    out = sm.update(base * 1.03)
    assert np.abs(out - base).mean() < 0.01 * np.abs(
        base * 1.03 - base).mean() + 1e-4

    no_align = TemporalSmoother(alpha=0.5, align=False)
    no_align.update(base)
    out_na = no_align.update(base * 1.03)
    # without alignment the EMA only halves the jitter
    assert np.abs(out_na - base).mean() > 5 * np.abs(out - base).mean()


def test_scene_cut_is_not_aligned_away():
    base = _static_scene()
    sm = TemporalSmoother(alpha=0.8, align=True)
    sm.update(base)
    cut = 10.0 - base  # completely different scene
    out = sm.update(cut)
    # nothing static -> passes through (and re-seeds)
    np.testing.assert_allclose(out, cut, rtol=1e-4)


def test_resolution_change_reseeds():
    sm = TemporalSmoother(alpha=0.9)
    sm.update(np.full((8, 8), 2.0, np.float32))
    out = sm.update(np.full((16, 16), 5.0, np.float32))
    np.testing.assert_allclose(out, 5.0)


def test_smooth_depth_files_postpass(tmp_path):
    """smooth_depth_files (the pod post-pass): equals the streaming
    smoother frame for frame, preserves extra npz keys and dtypes,
    handles .npy, and honors output_dir vs in-place."""
    from ml_depth_pro_video_tpu.video.temporal import smooth_depth_files

    base = _static_scene()
    rng = np.random.default_rng(2)
    frames = [base * (1.0 + 0.02 * rng.standard_normal(base.shape)
                      .astype(np.float32)) for _ in range(6)]
    paths = []
    for i, d in enumerate(frames):
        p = tmp_path / f"frame_{i:04d}_depth.npz"
        np.savez_compressed(p, depth=d, focallength_px=np.float32(700.0))
        paths.append(str(p))

    out_dir = tmp_path / "smoothed"
    n = smooth_depth_files(paths, output_dir=str(out_dir), alpha=0.8,
                           tau=0.05, align=False, chunk=2)  # force
    # device-chunk boundaries mid-sequence: output must not depend on
    # where the batch splits fall
    assert n == 6
    ref = TemporalSmoother(alpha=0.8, tau=0.05, align=False)
    for p, d in zip(paths, frames):
        with np.load(out_dir / os.path.basename(p)) as z:
            np.testing.assert_allclose(z["depth"], ref.update(d), rtol=1e-6)
            assert z["depth"].dtype == np.float32
            assert float(z["focallength_px"]) == 700.0  # copied through

    # .npy + in-place rewrite
    npy = tmp_path / "seq"
    npy.mkdir()
    npy_paths = []
    for i, d in enumerate(frames[:3]):
        p = npy / f"{i}.npy"
        np.save(p, d)
        npy_paths.append(str(p))
    assert smooth_depth_files(npy_paths, output_dir=None, align=False) == 3
    ref = TemporalSmoother(alpha=0.8, tau=0.05, align=False)
    for p, d in zip(npy_paths, frames):
        np.testing.assert_allclose(np.load(p), ref.update(d), rtol=1e-6)

    import pytest

    with pytest.raises(KeyError, match="nope"):
        smooth_depth_files(paths[:1], output_dir=str(out_dir), key="nope")

    # temp files must NOT match depth-map globs: a crash mid-flush would
    # otherwise leave "X.npz.tmp.npz" behind for the rerun's *.npz glob
    # to double-feed into the EMA. Also: no stray files after a clean run.
    leftovers = {f.name for f in tmp_path.iterdir()} - (
        {os.path.basename(p) for p in paths} | {"smoothed", "seq"})
    assert not leftovers, leftovers
    assert not [f for f in out_dir.iterdir() if ".tmp" in f.name]


def test_smoothing_rejects_invalid_alpha(tmp_path):
    """alpha outside [0, 1) must raise EVERYWHERE (runner construction,
    the batched device filter, and the post-pass before it rewrites any
    file): alpha=1 freezes static pixels at the seed frame forever and
    alpha>1 extrapolates with a negative current-frame weight — both
    produce silently corrupt video."""
    import pytest

    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner
    from ml_depth_pro_video_tpu.video.temporal import (smooth_batch,
                                                       smooth_depth_files)

    for bad in (1.0, 1.2, -0.1):
        with pytest.raises(ValueError, match="temporal_smooth"):
            DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                             temporal_smooth=bad)
        with pytest.raises(ValueError, match="alpha"):
            smooth_batch(None, np.ones((1, 4, 4), np.float32), alpha=bad)

    p = tmp_path / "d.npy"
    np.save(p, np.ones((4, 4), np.float32))
    with pytest.raises(ValueError, match="alpha"):
        smooth_depth_files([str(p)], alpha=1.0)
    # the reject must fire BEFORE any rewrite: the file is untouched
    np.testing.assert_array_equal(np.load(p), np.ones((4, 4), np.float32))


def test_smooth_cli_orders_by_frame_number(tmp_path):
    """depth-pro-smooth sorts numerically (frame_2 before frame_10) and
    writes the smoothed sequence in that order."""
    from ml_depth_pro_video_tpu.cli.smooth_depth import main

    base = _static_scene(8, 8)
    # write OUT of lexicographic order: frame_10 < frame_2 as strings
    vals = {2: base, 10: base * 1.5, 11: base * 1.5}
    for i, d in vals.items():
        np.savez_compressed(tmp_path / f"frame_{i}_depth.npz",
                            depth=d.astype(np.float32))
    out = tmp_path / "out"
    main([str(tmp_path), "-o", str(out), "--alpha", "0.9", "--no_align"])
    ref = TemporalSmoother(alpha=0.9, align=False)
    for i in sorted(vals):  # numeric playback order
        with np.load(out / f"frame_{i}_depth.npz") as z:
            np.testing.assert_allclose(z["depth"], ref.update(vals[i]),
                                       rtol=1e-6)


def test_smooth_batch_equals_sequential_smoother():
    """smooth_batch (the runner's device-side lax.scan form) must equal
    TemporalSmoother frame for frame: seeding, batch padding (advance
    mask), state carry across batches, and resolution-change reseed."""
    from ml_depth_pro_video_tpu.video.temporal import smooth_batch

    rng = np.random.default_rng(4)
    base = _static_scene()
    frames = [base * (1.0 + 0.03 * rng.standard_normal(base.shape)
                      .astype(np.float32)) for _ in range(5)]

    ref = TemporalSmoother(alpha=0.7)
    want = [ref.update(d) for d in frames]

    state = None
    got = []
    # batches of 2 with a padded tail (n=1 < B=2: the pad row repeats
    # frame 4 and must NOT advance the state)
    for i in range(0, 5, 2):
        chunk = frames[i:i + 2]
        n = len(chunk)
        batch = np.stack(chunk + [chunk[-1]] * (2 - n))
        state, sm = smooth_batch(state, batch, n, alpha=0.7)
        got.extend(np.asarray(sm[j]) for j in range(n))
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)

    # resolution change: reseeds (first frame of the new shape passes
    # through), exactly like the host smoother
    small = np.full((8, 8), 5.0, np.float32)
    state, sm = smooth_batch(state, small[None], 1, alpha=0.7)
    np.testing.assert_allclose(np.asarray(sm[0]), small)


def test_runner_device_smoothing_matches_host_filter():
    """End-to-end: the runner's --temporal_smooth stream must equal the
    host TemporalSmoother applied to the UNSMOOTHED stream's depths —
    proving the device-side rewire changed where smoothing runs, not
    what it computes (including across batch boundaries and the padded
    tail batch: 5 frames, batch 2)."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    rng = np.random.default_rng(5)
    base = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    frames = [np.clip(base.astype(np.int16)
                      + rng.integers(-3, 4, base.shape), 0, 255)
              .astype(np.uint8) for _ in range(5)]

    raw = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    raw_depths = [r["depth"] for r in raw.depth_stream(frames)]
    ref = TemporalSmoother(alpha=0.8)
    want = [ref.update(d) for d in raw_depths]

    sm = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2,
                          temporal_smooth=0.8)
    got = [r["depth"] for r in sm.depth_stream(frames)]
    assert len(got) == 5
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_runner_smoothing_retry_does_not_double_advance(monkeypatch):
    """A transient fetch failure AFTER the smoothed depth was computed
    (the focal-length fetch raises) triggers the bounded retry, which
    re-dispatches and RE-SMOOTHS the batch. The EMA state must advance
    exactly once — committing it before all fetches succeed would
    double-advance on retry and silently over-smooth."""
    import time

    import jax

    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    rng = np.random.default_rng(6)
    base = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    frames = [np.clip(base.astype(np.int16)
                      + rng.integers(-3, 4, base.shape), 0, 255)
              .astype(np.uint8) for _ in range(4)]

    def want():
        clean = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                                 batch_size=2, temporal_smooth=0.8)
        return [r["depth"] for r in clean.depth_stream(frames)]

    expected = want()

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, temporal_smooth=0.8,
                              max_retries=2)

    class FlakyFetch:
        """Slices fine; raises the retryable error at host fetch."""

        def __init__(self, arr):
            self.arr = arr

        def __getitem__(self, k):
            return FlakyFetch(self.arr[k])

        def __array__(self, dtype=None, copy=None):
            raise jax.errors.JaxRuntimeError("transient fetch failure")

    real_infer = runner._infer
    calls = {"n": 0}

    def flaky_infer(batch, f_px, mixed=False):
        out = dict(real_infer(batch, f_px, mixed=mixed))
        calls["n"] += 1
        if calls["n"] == 1:  # first batch, first attempt only
            out["focallength_px"] = FlakyFetch(out["focallength_px"])
        return out

    monkeypatch.setattr(runner, "_infer", flaky_infer)
    monkeypatch.setattr(time, "sleep", lambda s: None)  # skip backoff
    got = [r["depth"] for r in runner.depth_stream(frames)]
    assert calls["n"] >= 3  # 2 batches + at least 1 re-dispatch
    assert len(got) == 4
    for w, g in zip(expected, got):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_runner_smoothing_survives_poisoned_state_chain(monkeypatch):
    """A failed device COMPUTATION (not just a fetch blip) poisons every
    array chained onto it — including the dispatch-time EMA state that
    LATER flights' smoothing already consumed. The retry must re-smooth
    from the last known-good collected state and HEAL the in-flight
    chain (and the live dispatch state), or one poisoned batch kills
    the whole stream at the next collect."""
    import time

    import jax

    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video import temporal
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    rng = np.random.default_rng(7)
    base = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    frames = [np.clip(base.astype(np.int16)
                      + rng.integers(-3, 4, base.shape), 0, 255)
              .astype(np.uint8) for _ in range(8)]

    def want():
        clean = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                                 batch_size=2, temporal_smooth=0.8)
        return [r["depth"] for r in clean.depth_stream(frames)]

    expected = want()

    class Poisoned:
        """Array whose producing computation failed: slicing chains the
        poison; any host fetch raises the stored runtime error."""

        def __init__(self, arr):
            self.arr = np.asarray(arr) if not hasattr(arr, "shape") else arr

        def __getitem__(self, k):
            return Poisoned(self.arr[k])

        @property
        def shape(self):
            return self.arr.shape

        def __array__(self, dtype=None, copy=None):
            raise jax.errors.JaxRuntimeError("poisoned computation")

    real_smooth = temporal.smooth_batch

    def chaining_smooth(state, depths, n=None, *, alpha, **kw):
        # a computation consuming a poisoned array is itself poisoned
        # (values still computed so the deterministic-recompute
        # equivalence can be asserted at the end)
        tainted = isinstance(state, Poisoned) or isinstance(depths, Poisoned)
        st = state.arr if isinstance(state, Poisoned) else state
        d = depths.arr if isinstance(depths, Poisoned) else depths
        new_st, out = real_smooth(st, d, n, alpha=alpha, **kw)
        if tainted:
            return Poisoned(new_st), Poisoned(out)
        return new_st, out

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, temporal_smooth=0.8,
                              max_retries=2)
    real_infer = runner._infer
    calls = {"n": 0}

    def flaky_infer(batch, f_px, mixed=False):
        out = dict(real_infer(batch, f_px, mixed=mixed))
        calls["n"] += 1
        if calls["n"] == 2:  # second batch's COMPUTATION fails
            out["depth"] = Poisoned(out["depth"])
        return out

    # route the runner's in-stream import through the chaining wrapper
    monkeypatch.setattr(temporal, "smooth_batch", chaining_smooth)
    monkeypatch.setattr(runner, "_infer", flaky_infer)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    got = [r["depth"] for r in runner.depth_stream(frames)]
    assert len(got) == 8
    # batch 2's collect retried once; batches 3+ must NOT have needed a
    # retry each (the heal re-threads their chain) — 4 batches + 1 retry
    assert calls["n"] == 5, calls["n"]
    for w, g in zip(expected, got):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_dp_mesh_smoothing_warns_once(caplog):
    """temporal_smooth on a dp mesh makes the EMA scan's sequential
    carry run over the SHARDED batch axis (per-batch all-gather) — the
    runner must say so and point at the depth-pro-smooth post-pass. A
    smoothing-free dp runner must stay quiet."""
    import logging

    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(tp=1)  # 8 fake CPU devices -> dp=8
    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=8, mesh=mesh,
                              temporal_smooth=0.8)
    frame = np.zeros((tiny_config().img_size, tiny_config().img_size, 3),
                     np.uint8)
    with caplog.at_level(logging.WARNING,
                         logger="ml_depth_pro_video_tpu.video.runner"):
        out = list(runner.depth_stream([frame] * 8))
    assert len(out) == 8
    assert any("depth-pro-smooth post-pass" in r.message
               for r in caplog.records)

    caplog.clear()
    quiet = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                             batch_size=8, mesh=mesh)
    with caplog.at_level(logging.WARNING,
                         logger="ml_depth_pro_video_tpu.video.runner"):
        out = list(quiet.depth_stream([frame] * 8))
    assert len(out) == 8
    assert not any("post-pass" in r.message for r in caplog.records)


def test_runner_temporal_smooth_stream():
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, temporal_smooth=0.8)
    rng = np.random.default_rng(0)
    frame = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    # identical frames: smoothed depth must converge (and stay finite)
    results = list(runner.depth_stream([frame] * 4))
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["depth"]).all()
    # same frame, same model -> depth identical; smoothing must be a
    # no-op on an already-static stream
    np.testing.assert_allclose(results[3]["depth"], results[0]["depth"],
                               rtol=1e-5, atol=1e-7)


def test_host_twin_equals_device_path():
    """TemporalSmoother(host=True) — the serving layer's per-session
    form (no XLA compile per client (shape, alpha, tau), no device
    dispatch) — must equal the jitted device path frame for frame,
    including the align fit, scene-cut identity, and reseeding."""
    rng = np.random.default_rng(7)
    base = _static_scene()
    frames = []
    for i in range(6):
        scale = 1.0 + 0.02 * rng.standard_normal()  # global flicker
        f = base * scale * (1.0 + 0.01 * rng.standard_normal(base.shape)
                            .astype(np.float32))
        frames.append(f.astype(np.float32))
    frames.append((base * 4.0).astype(np.float32))  # scene cut
    frames.append((base * 4.0).astype(np.float32))

    dev = TemporalSmoother(alpha=0.8, tau=0.05, align=True)
    host = TemporalSmoother(alpha=0.8, tau=0.05, align=True, host=True)
    for f in frames:
        np.testing.assert_allclose(host.update(f), dev.update(f),
                                   rtol=1e-5, atol=1e-6)

    # resolution change reseeds identically
    small = np.full((8, 8), 5.0, np.float32)
    np.testing.assert_allclose(host.update(small), dev.update(small))
