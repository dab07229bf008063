"""Eval module tests: vectorized NMS vs a direct run-walk oracle,
metric self-consistency contracts."""

import numpy as np

from ml_depth_pro_video_tpu.eval.boundary_metrics import (
    SI_boundary_F1,
    SI_boundary_Recall,
    boundary_f1,
    fgbg_depth,
    nms_horizontal,
    nms_vertical,
)
from ml_depth_pro_video_tpu.eval.depth_metrics import compute_all


def nms_horizontal_oracle(ratio, threshold):
    """Direct per-run loop implementing the reference semantics
    (`boundary_metrics.py:29-50`): first maximum of each horizontal run."""
    mask = np.zeros_like(ratio, dtype=bool)
    r, c = np.nonzero(ratio > threshold)
    i = 0
    while i < len(r):
        j = i
        while j + 1 < len(r) and r[j + 1] == r[j] and c[j + 1] == c[j] + 1:
            j += 1
        vals = [ratio[r[k], c[k]] for k in range(i, j + 1)]
        k = i + int(np.argmax(vals))
        mask[r[k], c[k]] = True
        i = j + 1
    return mask


def test_nms_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(20):
        ratio = rng.uniform(0.9, 1.3, (12, 15))
        got = nms_horizontal(ratio, 1.1)
        want = nms_horizontal_oracle(ratio, 1.1)
        np.testing.assert_array_equal(got, want)


def test_nms_tie_breaks_to_first_max():
    ratio = np.array([[2.0, 2.0, 2.0, 0.0, 2.0]])
    mask = nms_horizontal(ratio, 1.0)
    np.testing.assert_array_equal(mask, [[True, False, False, False, True]])


def test_nms_vertical_is_transpose():
    rng = np.random.default_rng(1)
    ratio = rng.uniform(0.9, 1.3, (9, 7))
    np.testing.assert_array_equal(nms_vertical(ratio, 1.1), nms_horizontal(ratio.T, 1.1).T)


def test_fgbg_depth_directions():
    d = np.array([[1.0, 3.0], [1.0, 1.0]])
    left, top, right, bottom = fgbg_depth(d, 1.5)
    assert right[0, 0] and not left[0, 0]  # right pixel 3x the left
    assert top[0, 1] and not bottom[0, 1]  # top pixel 3x the bottom


def test_perfect_prediction_F1_is_1():
    rng = np.random.default_rng(2)
    depth = rng.uniform(1, 10, (32, 32))
    assert SI_boundary_F1(depth, depth) == 1.0


def test_boundary_f1_degrades_with_noise():
    rng = np.random.default_rng(3)
    gt = np.ones((64, 64)) * 5
    gt[20:40, 20:40] = 1.0  # object closer than background
    good = SI_boundary_F1(gt, gt)
    noisy = SI_boundary_F1(rng.uniform(1, 10, gt.shape), gt)
    assert good > noisy


def test_recall_on_mask():
    depth = np.ones((32, 32)) * 5
    depth[10:20, 10:20] = 1.0
    mask = np.zeros((32, 32))
    mask[10:20, 10:20] = 1.0
    rec = SI_boundary_Recall(depth, mask)
    assert rec > 0.5


def test_boundary_f1_zero_when_no_edges():
    flat = np.ones((16, 16))
    edgy = np.ones((16, 16))
    edgy[:, 8:] = 10.0
    assert boundary_f1(flat, edgy, 1.1) == 0.0


def test_depth_metrics_identity():
    rng = np.random.default_rng(4)
    d = rng.uniform(1, 10, (16, 16))
    m = compute_all(d, d)
    assert m["abs_rel"] == 0 and m["rmse"] == 0 and m["delta1"] == 1.0
    worse = compute_all(d * 1.3, d)
    assert worse["abs_rel"] > 0.29 and worse["delta1"] < 1.0


def test_eval_depth_cli(tmp_path, capsys):
    """depth-pro-eval: directory pairing by stem, npz + npy formats,
    mean JSON line with dense + boundary metrics."""
    import json

    from ml_depth_pro_video_tpu.cli.eval_depth import main

    rng = np.random.default_rng(0)
    pred_dir = tmp_path / "pred"
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    for i in range(2):
        gt = rng.uniform(1, 10, (24, 24))
        np.savez_compressed(gt_dir / f"frame{i}.npz", depth=gt)
        # predictions named like depth-pro-maps output (stem + _depth)
        np.save(pred_dir / f"frame{i}_depth.npy", gt * (1.0 + 0.01 * i))
    main(["--pred", str(pred_dir), "--gt", str(gt_dir), "--per-image"])
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3  # 2 per-image + 1 mean
    assert lines[-1]["n_images"] == 2
    assert lines[0]["abs_rel"] == 0.0  # identical pair
    assert 0.0 < lines[-1]["abs_rel"] < 0.01
    assert "SI_boundary_F1" in lines[-1]


def test_temporal_stability_metrics():
    """eval/temporal_metrics.py: flicker drops after smoothing, scale
    jitter is measured in log space, motion is excluded via the gate."""
    from ml_depth_pro_video_tpu.eval.temporal_metrics import (
        pairwise_flicker,
        temporal_stability,
    )
    from ml_depth_pro_video_tpu.video.temporal import TemporalSmoother

    rng = np.random.default_rng(0)
    base = 2.0 + rng.random((32, 40)).astype(np.float32)
    noisy = [base * (1.0 + 0.01 * rng.standard_normal(base.shape)
                     .astype(np.float32)) for _ in range(12)]

    raw = temporal_stability(noisy)
    assert raw["pairs"] == 11 and raw["frames"] == 12
    # ~1% depth noise -> ~1.4% mean abs pairwise inverse-depth change
    assert 0.005 < raw["flicker_mean"] < 0.03
    assert raw["static_fraction"] > 0.95

    sm = TemporalSmoother(alpha=0.8, align=False)
    smoothed = [sm.update(d) for d in noisy]
    out = temporal_stability(smoothed)
    assert out["flicker_mean"] < raw["flicker_mean"] / 2

    # global scale jitter: alternating 3% scale = log(1.03) per pair
    # (inverse depth scales by 1/1.03; |log| is symmetric). Depth scale
    # change is ~30x the gate tau -> everything counts as motion, so
    # use pairwise_flicker's scale term directly
    p = pairwise_flicker(base, base * 1.03)
    np.testing.assert_allclose(p["scale_jitter"], np.log(1.03), rtol=1e-3)

    # real motion is NOT flicker: a block jumping closer leaves the
    # static-set flicker at zero and shrinks static_fraction
    moved = base.copy()
    moved[8:16, 8:16] = 0.5
    p = pairwise_flicker(base, moved)
    assert p["flicker_mean"] == 0.0  # identical static pixels
    assert 0.9 < p["static_fraction"] < 1.0

    # degenerate sequences return zeros, not NaNs
    empty = temporal_stability([])
    assert empty["pairs"] == 0 and empty["flicker_mean"] == 0.0


def test_eval_cli_temporal_mode(tmp_path, capsys):
    import json

    from ml_depth_pro_video_tpu.cli.eval_depth import main

    rng = np.random.default_rng(1)
    base = 2.0 + rng.random((16, 16)).astype(np.float32)
    for i in (2, 10, 11):  # non-lexicographic frame numbers
        np.savez_compressed(tmp_path / f"frame_{i}_depth.npz",
                            depth=base * (1 + 0.01 * rng.standard_normal(
                                base.shape).astype(np.float32)))
    main(["--pred", str(tmp_path), "--temporal"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["frames"] == 3 and out["pairs"] == 2
    assert out["flicker_mean"] > 0

    import pytest

    with pytest.raises(SystemExit, match="must be a directory"):
        main(["--pred", str(tmp_path / "nope"), "--temporal"])


def test_eval_cli_temporal_dedups_colormap_twins(tmp_path, capsys):
    """depth-pro-maps writes a colormapped {stem}_depth.png NEXT TO each
    {stem}_depth.npz — running --temporal on such a directory must keep
    ONE file per frame stem (the metric npz), not crash on the RGB png
    or double-count frames (duplicate adjacent frames contribute zero
    flicker, silently biasing the stability stats)."""
    import json

    from PIL import Image

    from ml_depth_pro_video_tpu.cli.eval_depth import main

    rng = np.random.default_rng(2)
    base = 2.0 + rng.random((16, 16)).astype(np.float32)
    for i in range(3):
        np.savez_compressed(tmp_path / f"frame_{i}_depth.npz",
                            depth=base * (1 + 0.01 * rng.standard_normal(
                                base.shape).astype(np.float32)))
        # the colormapped RGB twin the batcher writes alongside
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8),
                        "RGB").save(tmp_path / f"frame_{i}_depth.png")
    main(["--pred", str(tmp_path), "--temporal"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["frames"] == 3 and out["pairs"] == 2

    # explicit --pattern narrows to exactly the matching files
    main(["--pred", str(tmp_path), "--temporal", "--pattern", "*_depth.npz"])
    out = json.loads(capsys.readouterr().out.strip())
    assert out["frames"] == 3 and out["pairs"] == 2
