"""Device frames→floorplan tier vs the exact host chain
(geom/device_floorplan.py; VERDICT r4 #2 — the centerpiece pipeline's
host geometry moved on device).

Contract being verified (module docstring): unproject/normalize/adjust
are the SAME math (fp32 vs float64), the stray filter only ever KEEPS
extra points (superset), the shadow filter matches the host rule except
even-median ties, and the final raster agrees to a few percent of
pixels with colors identical where both splat."""

import numpy as np
import pytest

import jax

from ml_depth_pro_video_tpu.geom.clean import (
    clean_shadows,
    radius_neighbor_counts,
    remove_stray_points,
)
from ml_depth_pro_video_tpu.geom.device_floorplan import (
    DeviceFloorplanConfig,
    make_device_floorplan,
)
from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image
from ml_depth_pro_video_tpu.geom.ground import (
    grid_ground_adjustment,
    normalize_to_ground,
)
from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud
from ml_depth_pro_video_tpu.geom.unproject import depth_to_3d
from ml_depth_pro_video_tpu.utils.synthetic import make_scene_boxes
from ml_depth_pro_video_tpu.video.pipeline import compute_ground_from_frame

SIZE = 160


@pytest.fixture(scope="module")
def scene():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(3)
    img, depth = make_scene_boxes(rng, SIZE)
    # the blur reproduces monocular depth-edge smear (shadow streaks) so
    # the cleanup stages have real work — sharp raycast depth has none
    depth = gaussian_filter(depth, sigma=1.5).astype(np.float32)
    f_px = SIZE * 0.9
    ground = compute_ground_from_frame(depth, f_px)

    cloud = depth_to_3d(depth, f_px, image=img)
    pts = grid_ground_adjustment(normalize_to_ground(cloud.points, ground))
    adjusted = PointCloud(pts, cloud.colors)
    return {"img": img, "depth": depth, "f_px": f_px, "ground": ground,
            "cloud": cloud, "adjusted": adjusted}


def _limits(pts, height_threshold=0.1):
    m = pts[:, 1] >= height_threshold
    x, z = -pts[m, 0], pts[m, 2]
    return ((float(x.min()), float(x.max())),
            (float(z.min()), float(z.max())))


def _run_device(scene, **cfg_kw):
    xl, zl = _limits(scene["adjusted"].points)
    cfg = DeviceFloorplanConfig(height=SIZE, width=SIZE, x_limits=xl,
                                z_limits=zl, raster_width=192, **cfg_kw)
    fn = make_device_floorplan(cfg, scene["ground"], debug=True)
    out = fn(scene["depth"], scene["img"], np.float32(scene["f_px"]))
    return cfg, {k: np.asarray(v) for k, v in out.items()}


def test_normalized_coords_exact(scene):
    _, out = _run_device(scene)
    valid = out["valid"]
    assert valid.sum() == len(scene["cloud"].points)
    dev = np.stack([out["x"][valid], out["y"][valid], out["z"][valid]], -1)
    # fp32 device vs float64 host through rotate + two exact percentiles
    np.testing.assert_allclose(dev, scene["adjusted"].points, atol=2e-5)


def test_stray_filter_is_a_superset(scene):
    _, out = _run_device(scene)
    valid = out["valid"]
    counts = radius_neighbor_counts(scene["adjusted"].points, 0.1)
    host_keep = counts + 1 >= 20
    dev_keep = out["keep_stray"][valid]
    # never drops a point the exact rule keeps...
    assert not (host_keep & ~dev_keep).any()
    # ...and the voxel over-count stays bounded. At this 160² test
    # density the typical neighbor count sits NEAR the 20-point
    # threshold (counts scale with resolution²), so block-counting
    # crosses it often — production 1536² frames measure ~7% extra
    # (scripts/tpu_device_floorplan.out); here we only pin the order of
    # magnitude and the superset property above, which is the hard
    # guarantee
    extra = (~host_keep & dev_keep).sum() / max(valid.sum(), 1)
    assert extra < 0.35, extra


def test_shadow_filter_matches_host_rule(scene):
    # disable the stray stage on BOTH sides (nb_points=1 keeps all) so
    # the shadow comparison sees identical inputs
    _, out = _run_device(scene, stray_nb_points=1)
    valid = out["valid"]
    assert out["keep_stray"][valid].all()

    host_out = clean_shadows(scene["adjusted"])
    # membership via row matching: clean_shadows preserves order
    host_keep = np.zeros(len(scene["adjusted"]), bool)
    kept_set = {tuple(p) for p in np.round(host_out.points, 6)}
    for i, p in enumerate(np.round(scene["adjusted"].points, 6)):
        host_keep[i] = tuple(p) in kept_set
    dev_keep = out["keep"][valid]
    # identical up to even-median ties (host resolves them exactly);
    # ties are rare — bound the disagreement hard
    mismatch = (host_keep != dev_keep).mean()
    assert mismatch < 0.02, mismatch


def test_raster_close_to_host_chain(scene):
    cfg, out = _run_device(scene)
    cleaned = clean_shadows(remove_stray_points(scene["adjusted"]))
    host = fast_floorplan_image(
        cleaned, None, height_threshold=cfg.height_threshold,
        x_limits=cfg.x_limits, z_limits=cfg.z_limits,
        width=cfg.raster_width).astype(np.float32) / 255.0
    dev = out["raster"]
    assert host.shape == dev.shape

    bg_h = np.abs(host - 0.94).max(-1) < 0.02
    bg_d = np.abs(dev - 0.94).max(-1) < 0.02
    # structure the host draws, the device must draw (superset filters):
    # host-occupied pixels missing on the device are dilation ties only
    assert (~bg_h & bg_d).mean() < 0.02
    # and the stray over-keep adds bounded extra splat (the tiny test
    # density inflates the over-keep — see test_stray_filter_is_a_superset;
    # production frames measured ~3-4% differing pixels)
    assert (bg_h != bg_d).mean() < 0.15
    both = ~bg_h & ~bg_d
    # where both splat, colors must be the same points (uint8 quantized)
    color_err = np.abs(host - dev).max(-1)[both]
    assert np.percentile(color_err, 95) < 0.02


def test_batched_via_vmap(scene):
    """The production path runs a frame batch; vmap must compose."""
    xl, zl = _limits(scene["adjusted"].points)
    cfg = DeviceFloorplanConfig(height=SIZE, width=SIZE, x_limits=xl,
                                z_limits=zl, raster_width=128)
    fn = make_device_floorplan(cfg, scene["ground"])
    depth_b = np.stack([scene["depth"]] * 2)
    img_b = np.stack([scene["img"]] * 2)
    f_b = np.full((2,), scene["f_px"], np.float32)
    out = jax.vmap(fn)(depth_b, img_b, f_b)
    r = np.asarray(out["raster"])
    assert r.shape[0] == 2
    np.testing.assert_array_equal(r[0], r[1])
    single = np.asarray(fn(scene["depth"], scene["img"],
                           np.float32(scene["f_px"]))["raster"])
    np.testing.assert_allclose(r[0], single, atol=1e-6)


def test_subsample_tier(scene):
    """subsample=2 quarters the program's work; per-pixel geometry stays
    exact and the raster stays structurally consistent with the full
    run (production-density agreement is measured on-chip —
    scripts/tpu_device_floorplan3.out)."""
    xl, zl = _limits(scene["adjusted"].points)
    outs = {}
    for s in (1, 2):
        cfg = DeviceFloorplanConfig(height=SIZE, width=SIZE, x_limits=xl,
                                    z_limits=zl, raster_width=128,
                                    subsample=s)
        fn = make_device_floorplan(cfg, scene["ground"], debug=True)
        outs[s] = {k: np.asarray(v) for k, v in fn(
            scene["depth"], scene["img"], np.float32(scene["f_px"])).items()}
    # exact per-pixel geometry: stride-2 coords are a subset of stride-1
    n1 = outs[1]["x"].shape[0]
    side = int(np.sqrt(n1))
    pick = (np.arange(side)[:, None] % 2 == 0) & (np.arange(side)[None, :] % 2 == 0)
    np.testing.assert_allclose(outs[2]["x"], outs[1]["x"].reshape(side, side)[::2, ::2].ravel(),
                               atol=1e-6)
    # rasters agree structurally (tiny-scene bound; sparse splat at /4
    # density costs some coverage)
    bg1 = np.abs(outs[1]["raster"] - 0.94).max(-1) < 0.02
    bg2 = np.abs(outs[2]["raster"] - 0.94).max(-1) < 0.02
    assert (bg1 == bg2).mean() > 0.80, (bg1 == bg2).mean()
