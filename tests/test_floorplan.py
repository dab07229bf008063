"""Standalone floorplan module tests on a synthetic room scene."""

import os

import numpy as np
import pytest

from ml_depth_pro_video_tpu.geom.floorplan import (
    Polygon2D,
    create_density_grid,
    create_direct_floorplan,
    create_height_slices,
    detect_floor_plane,
    normalize_points_to_floor,
    pointcloud_to_floorplan,
)
from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud, write_ply


def room_scene(seed=0, n_floor=6000, n_wall=3000):
    """Flat floor + one wall + one box, slight tilt."""
    rng = np.random.default_rng(seed)
    floor = np.column_stack([
        rng.uniform(0, 6, n_floor), rng.normal(0, 0.01, n_floor), rng.uniform(0, 6, n_floor)
    ])
    wall = np.column_stack([
        rng.uniform(0, 6, n_wall), rng.uniform(0, 2.4, n_wall), np.full(n_wall, 6.0) + rng.normal(0, 0.01, n_wall)
    ])
    box = np.column_stack([
        rng.uniform(2, 3, 1500), rng.uniform(0, 1.0, 1500), rng.uniform(2, 3, 1500)
    ])
    pts = np.vstack([floor, wall, box])
    a = np.radians(3.0)
    R = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    return pts @ R.T


def test_polygon2d_area():
    sq = Polygon2D(np.array([[0, 0], [2, 0], [2, 3], [0, 3]], float))
    assert sq.area == 6.0
    assert sq.centroid.tolist() == [1.0, 1.5]


def test_detect_floor_plane_recovers_tilt():
    pts = room_scene()
    cloud = PointCloud(pts)
    (a, b, c, d), inliers = detect_floor_plane(cloud, distance_threshold=0.03, seed=1)
    normal = np.array([a, b, c]) * (1 if b > 0 else -1)
    ang = np.degrees(np.arccos(np.clip(normal[1], -1, 1)))
    assert ang < 6.0
    assert len(inliers) > 3000
    flat = normalize_points_to_floor(pts, (a, b, c, d))
    floor_y = flat[inliers, 1]
    assert abs(np.median(floor_y)) < 0.05


def test_height_slices():
    pts = room_scene()
    slices = create_height_slices(pts, None, num_slices=5)
    assert len(slices) == 5
    total = sum(len(s["points"]) for s in slices)
    assert total > 1000
    single = create_height_slices(pts, None, height_threshold=1.3)
    assert len(single) == 1


def test_density_grid():
    pts2d = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]])
    grid, origin, res = create_density_grid(pts2d, 0.5, padding=0.0)
    assert grid.sum() == 3
    assert grid.max() == 2


def test_full_floorplan_pipeline(tmp_path):
    pts = room_scene()
    ply = str(tmp_path / "room.ply")
    write_ply(ply, PointCloud(pts, np.full_like(pts, 0.5)))
    outs = pointcloud_to_floorplan(ply, str(tmp_path), num_slices=3)
    for key, path in outs.items():
        assert os.path.exists(path), key
        assert os.path.getsize(path) > 0, key
    data = open(outs["data"]).read()
    # reference txt format (output_0243_clean_floorplan.txt):
    # "height, num_points, x1, z1, x2, z2, ..." lines sorted by height
    assert "# Format: height, num_points, x1, z1, x2, z2, ...\n" in data
    rows = [line for line in data.splitlines() if line and not line.startswith("#")]
    assert rows
    heights = []
    for row in rows:
        fields = [float(v) for v in row.split(", ")]
        height, n = fields[0], int(fields[1])
        assert len(fields) == 2 + 2 * n
        heights.append(height)
    assert heights == sorted(heights)


def test_direct_floorplan_height_threshold(tmp_path):
    pts = room_scene()
    p = str(tmp_path / "direct.png")
    img = create_direct_floorplan(pts, p, height_threshold=1.3)
    assert img.shape[2] == 3
    assert os.path.exists(p)


def test_native_splat_matches_numpy():
    """The threaded C++ splat+dilation (native/splat.cpp) must produce
    PIXEL-IDENTICAL rasters to the numpy path — same truncating pixel
    map, same stable tallest-wins tie-break (exact-height ties go to
    the later point), same 8-offset dilation order."""
    import ml_depth_pro_video_tpu.geom.floorplan_viz as fv
    from ml_depth_pro_video_tpu.native import neighbors as native

    if not native.available():
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(7)
    n = 60000
    pts = np.column_stack([rng.uniform(-4, 4, n), rng.uniform(0, 3, n),
                           rng.uniform(1, 9, n)])
    # exact-height ties exercise the stable tie-break
    pts[: n // 4, 1] = np.round(pts[: n // 4, 1], 2)
    for cols in (rng.uniform(size=(n, 3)), None):
        cloud = PointCloud(pts, cols)
        a = fv.fast_floorplan_image(cloud, None, height_threshold=0.1,
                                    x_limits=(-4, 4), z_limits=(1, 9),
                                    width=512)
        saved = fv._native
        fv._native = None
        try:
            b = fv.fast_floorplan_image(cloud, None, height_threshold=0.1,
                                        x_limits=(-4, 4), z_limits=(1, 9),
                                        width=512)
        finally:
            fv._native = saved
        np.testing.assert_array_equal(a, b)

    # NaN heights without a threshold take the numpy path (numpy's
    # stable sort gives NaN the pixel win — not replicated in C++)
    bad = pts.copy()
    bad[5, 1] = np.nan
    img = fv.fast_floorplan_image(PointCloud(bad), None,
                                  x_limits=(-4, 4), z_limits=(1, 9),
                                  width=128)
    assert img.shape[1] == 128
