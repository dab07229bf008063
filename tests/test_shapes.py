"""Shape fitting + rendering tests."""

import numpy as np

from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud
from ml_depth_pro_video_tpu.geom.render import render_multi_view, render_pointcloud_image
from ml_depth_pro_video_tpu.geom.shapes import (
    export_shape_data,
    fit_circle,
    fit_shapes_to_clusters,
    min_area_rect,
    points_in_rect,
    rect_corners,
)

RNG = np.random.default_rng(3)


def test_min_area_rect_matches_cv2():
    import cv2

    for seed in range(5):
        rng = np.random.default_rng(seed)
        # random rotated rectangle point cloud
        w, h, ang = rng.uniform(1, 5), rng.uniform(1, 5), rng.uniform(0, 180)
        a = np.radians(ang)
        R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        pts = (rng.uniform(-0.5, 0.5, (400, 2)) * [w, h]) @ R.T + rng.uniform(-3, 3, 2)
        ours = min_area_rect(pts)
        cv = cv2.minAreaRect(pts.astype(np.float32))
        np.testing.assert_allclose(ours[2] * ours[3], cv[1][0] * cv[1][1], rtol=1e-4)
        np.testing.assert_allclose([ours[0], ours[1]], cv[0], atol=1e-3)


def test_rect_corners_and_containment():
    rect = (1.0, 2.0, 4.0, 2.0, 30.0)
    corners = rect_corners(rect)
    assert corners.shape == (4, 2)
    # corners are (just) inside with a tiny margin
    assert points_in_rect(corners, rect, margin=1e-9).all()
    assert not points_in_rect(np.array([[10.0, 10.0]]), rect).any()


def test_fit_circle_exact():
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    pts = np.column_stack([2 + 1.5 * np.cos(t), -1 + 1.5 * np.sin(t)])
    xc, yc, r = fit_circle(pts)
    np.testing.assert_allclose([xc, yc, r], [2, -1, 1.5], atol=1e-6)


def test_fit_shapes_separates_circle_and_rectangle():
    rng = np.random.default_rng(0)
    t = rng.uniform(0, 2 * np.pi, 600)
    # circle outline with small radial noise (hull area ~ circle area,
    # which is what the reference's circularity arbitration detects)
    rad = 1.0 + rng.normal(0, 0.03, 600)
    circle_pts = np.column_stack([5 + rad * np.cos(t), 5 + rad * np.sin(t)])
    rect_pts = rng.uniform(-0.5, 0.5, (600, 2)) * [3.0, 1.2] + [-4, -4]
    pts = np.vstack([circle_pts, rect_pts])
    rects, circles = fit_shapes_to_clusters(pts, eps=0.3, min_samples=5)
    assert len(circles) == 1
    assert len(rects) == 1
    np.testing.assert_allclose(circles[0][:2], [5, 5], atol=0.1)
    assert abs(rects[0][2] * rects[0][3] - 3.0 * 1.2) < 0.5


def test_export_shape_data_format(tmp_path):
    p = str(tmp_path / "shapes.txt")
    export_shape_data([(0, 0, 2, 3, 45.0)], [(1, 1, 0.5)], p)
    txt = open(p).read()
    assert "Rectangles: 1" in txt and "Circles: 1" in txt
    assert f"Total Area: {2*3 + np.pi*0.25:.2f}" in txt


def test_render_views():
    cloud = PointCloud(RNG.normal(0, 1, (5000, 3)), RNG.uniform(0, 1, (5000, 3)))
    img = render_pointcloud_image(cloud, "iso", width=320, height=240)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # some pixels must be drawn (not all background)
    assert (img < 250).any()
    grid = render_multi_view(cloud, width=320, height=240)
    assert grid.shape == (240, 320, 3)
