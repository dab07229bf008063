"""Shape fitting + rendering tests."""

import os

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


def test_viewer_outputs_all_files(tmp_path):
    """output_all_files writes all four artifacts like the reference
    viewer (`simple_pointcloud_viewer.py:681-846`): scatter PNG,
    _shapes.txt, _shapes.png (scale bar), _floor_plan.png (filled)."""
    from ml_depth_pro_video_tpu.geom.floorplan_viz import floorplan_visualization
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud

    rng = np.random.default_rng(0)
    # two dense boxes and one disc on the floor plane
    def box(cx, cz, w, d, n):
        p = rng.random((n, 2)) * [w, d] + [cx - w / 2, cz - d / 2]
        return np.column_stack([p[:, 0], np.full(n, 1.5), p[:, 1]])

    th = rng.random(400) * 2 * np.pi
    rr = np.sqrt(rng.random(400)) * 0.8
    disc = np.column_stack([4 + rr * np.cos(th), np.full(400, 1.5), 2 + rr * np.sin(th)])
    pts = np.concatenate([box(0, 0, 2, 1, 600), box(-3, 3, 1, 1, 400), disc])
    cloud = PointCloud(pts, None)

    out = str(tmp_path / "view.png")
    rects, circles = floorplan_visualization(
        cloud, out, height_threshold=1.0, fit_shapes=True, output_all_files=True,
    )
    assert len(rects) + len(circles) >= 2
    assert os.path.exists(str(tmp_path / "view.png"))
    assert os.path.exists(str(tmp_path / "view_shapes.txt"))
    assert os.path.exists(str(tmp_path / "view_shapes.png"))
    assert os.path.exists(str(tmp_path / "view_floor_plan.png"))


def test_shape_export_golden_format(tmp_path):
    """The _shapes.txt format must match the reference's checked-in
    golden artifact (`output_0243_clean_simple_view_shapes.txt`):
    header, counts, total area, and per-shape CSV lines."""
    from ml_depth_pro_video_tpu.geom.shapes import export_shape_data

    rects = [(-0.322, 11.256, 5.821, 9.540, 86.3), (1.0, 2.0, 0.5, 0.4, 10.0)]
    circles = [(4.0, 2.0, 0.8)]
    path = str(tmp_path / "shapes.txt")
    export_shape_data(rects, circles, path)
    lines = open(path).read().splitlines()

    assert lines[0] == "# Floor Plan Shape Data"
    assert lines[1] == "# Units: meters"
    assert f"Total Shapes: {len(rects) + len(circles)}" in lines
    assert f"Rectangles: {len(rects)}" in lines
    assert f"Circles: {len(circles)}" in lines
    total = sum(r[2] * r[3] for r in rects) + np.pi * 0.8 ** 2
    assert any(line == f"Total Area: {total:.2f} square meters" for line in lines)
    # per-rectangle line: ID, cx, cy, w, h, angle, area
    rect_line = [line for line in lines if line.startswith("1, ")][0]
    fields = [f.strip() for f in rect_line.split(",")]
    assert len(fields) == 7
    assert float(fields[3]) == 5.821 and float(fields[6]) == round(5.821 * 9.540, 3)


def test_fast_floorplan_with_shapes(tmp_path):
    """Showcase mode at video rate (VERDICT r2 next #3): the numpy
    rasterizer draws the fitted rectangle/circle overlays, numeric
    labels, and the 1 m scale bar itself, and still produces the golden
    artifacts via matplotlib only when output_all_files demands them.
    The fitted shapes must match the matplotlib path exactly (same
    deterministic DBSCAN + fits)."""
    from ml_depth_pro_video_tpu.geom.floorplan_viz import (
        fast_floorplan_visualization,
        floorplan_visualization,
    )
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud
    from PIL import Image

    rng = np.random.default_rng(0)

    def box(cx, cz, w, d, n):
        p = rng.random((n, 2)) * [w, d] + [cx - w / 2, cz - d / 2]
        return np.column_stack([p[:, 0], np.full(n, 1.5), p[:, 1]])

    th = rng.random(400) * 2 * np.pi
    rr = np.sqrt(rng.random(400)) * 0.8
    disc = np.column_stack([4 + rr * np.cos(th), np.full(400, 1.5), 2 + rr * np.sin(th)])
    pts = np.concatenate([box(0, 0, 2, 1, 600), box(-3, 3, 1, 1, 400), disc])
    cloud = PointCloud(pts, None)

    out = str(tmp_path / "fastview.png")
    rects, circles = fast_floorplan_visualization(
        cloud, out, height_threshold=1.0, fit_shapes=True, output_all_files=True,
    )
    assert len(rects) + len(circles) >= 2
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "fastview_shapes.txt"))
    assert os.path.exists(str(tmp_path / "fastview_shapes.png"))
    assert os.path.exists(str(tmp_path / "fastview_floor_plan.png"))

    img = np.asarray(Image.open(out)).astype(np.float32) / 255.0
    # the first rectangle's outline color must appear in the raster
    blue = np.array([0x42, 0x85, 0xF4], np.float32) / 255.0
    assert (np.abs(img - blue).sum(axis=-1) < 0.1).any()
    # the scale bar: a run of black pixels near the bottom-left
    h, w = img.shape[:2]
    band = img[int(h * 0.93):, : w // 2]
    assert (band.sum(axis=-1) < 0.2).any()

    # same shapes as the matplotlib path (shared deterministic fitting)
    out_m = str(tmp_path / "mview.png")
    rects_m, circles_m = floorplan_visualization(
        cloud, out_m, height_threshold=1.0, fit_shapes=True, output_all_files=False,
    )
    np.testing.assert_allclose(np.asarray(rects, float), np.asarray(rects_m, float))
    np.testing.assert_allclose(np.asarray(circles, float), np.asarray(circles_m, float))


def test_fast_floorplan_shapes_empty_cloud(tmp_path):
    """Empty/below-threshold clouds still emit the full artifact set."""
    from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_visualization
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud

    out = str(tmp_path / "empty.png")
    rects, circles = fast_floorplan_visualization(
        PointCloud(np.zeros((0, 3)), None), out,
        height_threshold=1.0, fit_shapes=True, output_all_files=True,
    )
    assert rects == [] and circles == []
    for name in ("empty.png", "empty_shapes.txt", "empty_shapes.png",
                 "empty_floor_plan.png"):
        assert os.path.exists(str(tmp_path / name)), name
