"""Temporal depth smoothing (video/temporal.py): noise reduction on
static scenes, motion pass-through (no ghosting), scale-flicker
removal, and the runner integration."""

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
