"""Geometry layer tests: unprojection, ground stack, cleaning, I/O,
native C++ kernels vs scipy."""

import numpy as np
import pytest

from ml_depth_pro_video_tpu.geom.clean import (
    clean_shadows,
    radius_neighbor_counts,
    remove_stray_points,
)
from ml_depth_pro_video_tpu.geom.ground import (
    apply_rotation_to_plane,
    fit_ground_plane,
    grid_ground_adjustment,
    load_ground_plane,
    normalize_to_ground,
    optimize_ground_plane,
    plane_distances,
    rotation_between,
    save_ground_plane,
)
from ml_depth_pro_video_tpu.geom.pointcloud import (
    PointCloud,
    read_ply,
    write_obj,
    write_ply,
)
from ml_depth_pro_video_tpu.geom.unproject import depth_to_3d

RNG = np.random.default_rng(42)


def make_scene(n_ground=4000, n_obj=800, tilt_deg=5.0, seed=0):
    """Synthetic scene: tilted ground plane + a box-shaped object."""
    rng = np.random.default_rng(seed)
    gx = rng.uniform(-5, 5, n_ground)
    gz = rng.uniform(2, 12, n_ground)
    gy = np.zeros(n_ground) + rng.normal(0, 0.01, n_ground)
    ground = np.column_stack([gx, gy, gz])
    ox = rng.uniform(-0.5, 0.5, n_obj)
    oz = rng.uniform(5, 6, n_obj)
    oy = rng.uniform(0, 1.8, n_obj)
    obj = np.column_stack([ox, oy, oz])
    pts = np.vstack([ground, obj])
    # tilt the whole scene by tilt_deg about X
    a = np.radians(tilt_deg)
    R = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    return pts @ R.T


def test_unprojection_pinhole_roundtrip():
    depth = np.full((10, 20), 4.0)
    pts, valid = depth_to_3d(depth, focallength_px=100.0)
    assert valid.all() and pts.shape == (200, 3)
    # center pixel maps close to the optical axis, x negated
    pts2 = pts.reshape(10, 20, 3)
    assert pts2[5, 10, 2] == 4.0
    # pixel right of center -> negative x; pixel below center -> negative y
    assert pts2[5, 11, 0] < pts2[5, 10, 0]
    assert pts2[6, 10, 1] < pts2[5, 10, 1]
    np.testing.assert_allclose(pts2[5, 0, 0], -(0 - 10) * 4.0 / 100.0)


def test_unprojection_with_colors_and_nan():
    depth = np.full((4, 4), 2.0)
    depth[0, 0] = np.nan
    depth[1, 1] = 0.0
    img = np.full((4, 4, 3), 128, np.uint8)
    cloud = depth_to_3d(depth, 50.0, image=img)
    assert len(cloud) == 14
    np.testing.assert_allclose(cloud.colors, 128 / 255.0)


def test_ground_fit_recovers_tilted_plane():
    pts = make_scene(tilt_deg=6.0)
    model = fit_ground_plane(pts, seed=0)
    # fitted normal should be ~6 deg from vertical
    ang = np.degrees(np.arccos(abs(model["normal"] @ np.array([0, 1, 0]))))
    assert 4.0 < ang < 8.0, ang
    # the lowering step leaves a +0.05 margin (reference semantics,
    # img_to_normalized_pointcloud.py:787), so check beyond that margin
    frac_below = (plane_distances(model["normal"], model["d"], pts) < -0.07).mean()
    assert frac_below < 0.01


def test_ground_fit_deterministic():
    pts = make_scene()
    m1 = fit_ground_plane(pts, seed=7)
    m2 = fit_ground_plane(pts, seed=7)
    np.testing.assert_array_equal(m1["normal"], m2["normal"])
    assert m1["d"] == m2["d"]


def test_optimize_ground_plane_improves_or_reverts():
    pts = make_scene(tilt_deg=5.0, seed=3)
    rough = fit_ground_plane(pts, seed=0)
    # perturb the model and let the optimizer recover
    bad = dict(rough)
    bad["normal"] = rough["normal"] + np.array([0.05, 0, 0.05])
    bad["normal"] /= np.linalg.norm(bad["normal"])
    opt = optimize_ground_plane(pts, bad)
    below_bad = (plane_distances(bad["normal"], bad["d"], pts) < 0).mean()
    below_opt = (plane_distances(opt["normal"], opt["d"], pts) < 0).mean()
    assert below_opt <= max(below_bad, 0.3)


def test_normalize_to_ground_flattens():
    pts = make_scene(tilt_deg=8.0, seed=1)
    model = fit_ground_plane(pts, seed=0)
    norm_pts = normalize_to_ground(pts, model)
    ground_y = np.percentile(norm_pts[:, 1], 5)
    assert abs(ground_y) < 0.05
    assert norm_pts[:, 1].min() >= -0.1 - 1e-9


def test_grid_adjustment_pulls_floating_cells_down():
    rng = np.random.default_rng(0)
    # cells floating 0.15 above ground (inside the reference's <0.2 m
    # ground-point window) get pulled down; y never goes below 0
    base = np.column_stack([rng.uniform(0, 1, 500), rng.normal(0.15, 0.01, 500), rng.uniform(0, 1, 500)])
    adj = grid_ground_adjustment(base, grid_size=2)
    assert np.percentile(adj[:, 1], 50) < 0.05
    assert adj[:, 1].min() >= 0.0


def test_ground_json_roundtrip(tmp_path):
    model = {"normal": np.array([0.1, 0.99, 0.0]), "d": -1.5, "origin": np.array([0.0, 1.5, 0.0])}
    save_ground_plane(model, str(tmp_path))
    loaded = load_ground_plane(str(tmp_path))
    np.testing.assert_allclose(loaded["normal"], model["normal"])
    assert loaded["d"] == model["d"]


def test_apply_rotation_to_plane():
    model = {"normal": np.array([0.0, 1.0, 0.0]), "d": 0.0, "origin": np.zeros(3)}
    rot = apply_rotation_to_plane(model, [10.0, 0.0, 0.0])
    ang = np.degrees(np.arccos(np.clip(rot["normal"] @ np.array([0, 1, 0]), -1, 1)))
    np.testing.assert_allclose(ang, 10.0, atol=1e-6)


def test_rotation_between_aligns():
    v = np.array([0.3, 0.9, -0.1])
    R = rotation_between(v, np.array([0.0, 1.0, 0.0]))
    out = R @ (v / np.linalg.norm(v))
    np.testing.assert_allclose(out, [0, 1, 0], atol=1e-12)


def test_stray_removal_drops_isolated_points():
    dense = RNG.normal(0, 0.02, (500, 3))
    stray = np.array([[5.0, 5.0, 5.0], [-4.0, 2.0, 9.0]])
    cloud = PointCloud(np.vstack([dense, stray]), np.ones((502, 3)) * 0.5)
    out = remove_stray_points(cloud, nb_points=20, radius=0.1)
    assert len(out) == 500
    assert np.abs(out.points).max() < 1.0


def test_clean_shadows_removes_vertical_streak():
    rng = np.random.default_rng(1)
    floor = np.column_stack([rng.uniform(-2, 2, 3000), rng.normal(0, 0.01, 3000), rng.uniform(2, 6, 3000)])
    streak = np.column_stack([
        np.full(60, 1.0) + rng.normal(0, 0.002, 60),
        np.linspace(0, 1.5, 60),
        np.full(60, 4.0) + rng.normal(0, 0.002, 60),
    ])
    cloud = PointCloud(np.vstack([floor, streak]))
    out = clean_shadows(cloud)
    # the streak cell should be dropped, the floor mostly kept
    assert len(out) < 3060
    kept_near_streak = np.sum(
        (np.abs(out.points[:, 0] - 1.0) < 0.02) & (out.points[:, 1] > 0.5)
    )
    assert kept_near_streak == 0


def test_ply_roundtrip(tmp_path):
    cloud = PointCloud(RNG.normal(size=(100, 3)), RNG.uniform(size=(100, 3)))
    p = str(tmp_path / "c.ply")
    write_ply(p, cloud)
    back = read_ply(p)
    np.testing.assert_allclose(back.points, cloud.points.astype(np.float32), rtol=1e-6)
    assert np.abs(back.colors - cloud.colors).max() < 1 / 255.0 + 1e-9
    # ascii variant
    p2 = str(tmp_path / "c2.ply")
    write_ply(p2, cloud, binary=False)
    back2 = read_ply(p2)
    np.testing.assert_allclose(back2.points, cloud.points.astype(np.float32), atol=1e-4)


def test_obj_writer(tmp_path):
    p = str(tmp_path / "m.obj")
    write_obj(p, np.eye(3), np.array([[0, 1, 2]]))
    txt = open(p).read()
    assert "v 1.000000 0.000000 0.000000" in txt
    assert "f 1 2 3" in txt


def test_native_matches_scipy():
    from ml_depth_pro_video_tpu.native import neighbors as nat

    pts = RNG.normal(0, 1.0, (2000, 3))
    from scipy.spatial import cKDTree

    ref = np.asarray(cKDTree(pts).query_ball_point(pts, r=0.3, return_length=True)) - 1
    if not nat.available():
        pytest.skip("native module unavailable")
    got = nat.radius_counts(pts, 0.3)
    np.testing.assert_array_equal(got, ref)
    # voxel downsample sanity
    out_p, out_c = nat.voxel_downsample(pts, np.ones_like(pts) * 0.5, 0.5)
    assert 0 < len(out_p) < len(pts)
    np.testing.assert_allclose(out_c, 0.5)
    # normals of a plane point up (towards camera at +Y)
    plane = np.column_stack([RNG.uniform(0, 1, 500), np.zeros(500), RNG.uniform(0, 1, 500)])
    nrm = nat.estimate_normals(plane, radius=0.2, camera=(0.0, 10.0, 0.0))
    assert (np.abs(nrm[:, 1]) > 0.99).mean() > 0.95
    assert (nrm[:, 1] > 0).all()


def test_native_radius_mask_matches_counts():
    from ml_depth_pro_video_tpu.native import neighbors as nat

    if not nat.available():
        pytest.skip("native module unavailable")
    pts = RNG.normal(0, 0.5, (3000, 3))
    counts = nat.radius_counts(pts, 0.2)
    for k in (1, 5, 20):
        mask = nat.radius_mask(pts, 0.2, k)
        np.testing.assert_array_equal(mask, counts >= k)


def test_native_normalized_cloud_matches_numpy_chain():
    """The fused C++ kernel (native/geometry.cpp) must reproduce the
    numpy chain depth_to_3d -> normalize_to_ground ->
    grid_ground_adjustment element-for-element."""
    from ml_depth_pro_video_tpu.geom.ground import (
        grid_ground_adjustment,
        normalize_to_ground,
    )
    from ml_depth_pro_video_tpu.geom.unproject import depth_to_3d
    from ml_depth_pro_video_tpu.native import neighbors as native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(3)
    h, w = 120, 160
    depth = (rng.random((h, w)) * 8 + 0.5).astype(np.float32)
    depth[rng.random((h, w)) < 0.03] = np.nan  # invalid holes
    depth[rng.random((h, w)) < 0.02] = 0.0
    image = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    f_px = 300.0

    n = np.array([0.08, 0.99, -0.06])
    n = n / np.linalg.norm(n)
    model = {"normal": n, "d": 1.7, "origin": np.zeros(3)}

    for max_depth, img in [(None, image), (6.0, None)]:
        cloud = depth_to_3d(depth, f_px, image=img, max_depth=max_depth)
        ref_pts = cloud.points if img is not None else cloud[0]
        if img is None:
            ref_pts = depth_to_3d(depth, f_px, max_depth=max_depth)[0]
        else:
            ref_pts = cloud.points
        ref = grid_ground_adjustment(normalize_to_ground(ref_pts, model))
        got_pts, got_cols = native.normalized_cloud(
            depth, f_px, model, image=img, max_depth=max_depth)
        assert got_pts.shape == ref.shape
        np.testing.assert_allclose(got_pts, ref, rtol=1e-12, atol=1e-12)
        if img is not None:
            np.testing.assert_allclose(got_cols, cloud.colors, atol=1e-12)

    # near-horizontal normal: identity path (no rotation)
    model2 = {"normal": np.array([0.0, 1.0, 0.005]), "d": 1.5, "origin": np.zeros(3)}
    pts0, _ = depth_to_3d(depth, f_px)
    ref = grid_ground_adjustment(normalize_to_ground(pts0, model2))
    got_pts, _ = native.normalized_cloud(depth, f_px, model2)
    np.testing.assert_allclose(got_pts, ref, rtol=1e-12, atol=1e-12)


def test_native_unproject_matches_numpy():
    """native unproject_valid == the numpy depth_to_3d path, element-
    exact (compaction order, colors, valid mask, max_depth)."""
    from ml_depth_pro_video_tpu.geom.unproject import depth_to_3d
    from ml_depth_pro_video_tpu.native import neighbors as native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(7)
    depth32 = (rng.random((80, 100)) * 9 + 0.5).astype(np.float32)
    depth32[rng.random((80, 100)) < 0.05] = np.nan
    depth32[rng.random((80, 100)) < 0.04] = 0.0
    image = (rng.random((80, 100, 3)) * 255).astype(np.uint8)

    # numpy reference from the float64 path (identical math)
    ref_pts, ref_valid = depth_to_3d(depth32.astype(np.float64), 250.0, max_depth=8.0)
    got_pts, got_valid, _ = native.unproject_valid(depth32, 250.0, max_depth=8.0)
    np.testing.assert_array_equal(got_valid, ref_valid)
    np.testing.assert_allclose(got_pts, ref_pts, rtol=0, atol=0)

    # public API dispatch (fp32 input -> native) incl. colors
    cloud = depth_to_3d(depth32, 250.0, image=image)
    ref_cloud = depth_to_3d(depth32.astype(np.float64), 250.0, image=image)
    np.testing.assert_allclose(cloud.points, ref_cloud.points)
    np.testing.assert_allclose(cloud.colors, ref_cloud.colors)


def test_rotation_between_antiparallel_is_proper_rotation():
    """Antiparallel vectors: the result must be a 180-degree ROTATION
    (det=+1), not the -I reflection that mirrors the cloud."""
    from ml_depth_pro_video_tpu.geom.ground import rotation_between

    for v in ([0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.577, 0.577, 0.577]):
        a = np.asarray(v)
        r = rotation_between(a, -a)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)
        np.testing.assert_allclose(r @ a, -a, atol=1e-12)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_radius_mask_flat_cloud_matches_exact_counts():
    """Regression: on thin/planar clouds the grid dims collapse and the
    9 stream windows of the native radius_mask overlapped, double-
    counting neighbors (12654/20000 false keeps measured). The mask must
    agree with the exact neighbor counts."""
    from ml_depth_pro_video_tpu.native import neighbors as native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(0)
    radius, min_count = 0.1, 19
    for extent in (0.05, 0.15, 10.0):  # nz=1, nz~2, and a 3-D control
        pts = rng.uniform(0, [4.0, 4.0, extent], (20000, 3))
        mask = native.radius_mask(pts, radius, min_count)
        counts = native.radius_counts(pts, radius)
        np.testing.assert_array_equal(mask, counts >= min_count,
                                      err_msg=f"extent={extent}")


def test_clean_shadows_duplicate_points_keep_cell():
    """Reference semantics (`pointcloud_cleaner.py:290-293`): a duplicate
    point pair makes the cell's angle median NaN, and NaN < threshold is
    False — the cell is always KEPT."""
    from ml_depth_pro_video_tpu.geom.clean import clean_shadows
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud

    # a tall, perfectly vertical column (normally dropped as a shadow)
    col = np.column_stack([np.zeros(30), np.linspace(0, 1.0, 30), np.zeros(30)])
    spread = np.random.default_rng(0).uniform(0, 5, (200, 3)) * [1, 0.02, 1]
    base = np.vstack([col, spread + [10, 0, 10]])

    dropped = clean_shadows(PointCloud(base.copy()))
    assert len(dropped) < len(base)  # the column goes

    dup = base.copy()
    dup[1] = dup[0]  # duplicate point inside the column's cell
    kept = clean_shadows(PointCloud(dup))
    assert len(kept) == len(dup)  # NaN-median verdict: cell kept


def test_ply_reader_hardening(tmp_path):
    """read_ply: empty colored clouds, near-black uchar colors (always
    byte-scaled, not value-guessed), mesh-style headers with face
    elements/property lists, and big-endian binaries."""
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud, read_ply, write_ply

    p = str(tmp_path / "t.ply")
    for binary in (True, False):
        write_ply(p, PointCloud(np.zeros((0, 3)), np.zeros((0, 3))), binary=binary)
        assert len(read_ply(p)) == 0

    write_ply(p, PointCloud(np.ones((3, 3)), np.full((3, 3), 1 / 255.0)))
    np.testing.assert_allclose(read_ply(p).colors, 1 / 255.0)

    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"element face 1\nproperty list uchar int vertex_indices\n"
                b"end_header\n")
        f.write(np.arange(6, dtype=np.float32).tobytes())
        f.write(b"\x03" + np.zeros(3, np.int32).tobytes())
    cloud = read_ply(p)
    assert cloud.points.shape == (2, 3) and cloud.points[1, 0] == 3.0

    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_big_endian 1.0\nelement vertex 1\n"
                b"property float x\nproperty float y\nproperty float z\nend_header\n")
        f.write(np.array([1.0, 2.0, 3.0], ">f4").tobytes())
    np.testing.assert_allclose(read_ply(p).points[0], [1.0, 2.0, 3.0])

    import pytest

    with pytest.raises(ValueError):
        PointCloud(np.zeros((4, 3)), np.zeros((4, 4)))  # RGBA misalignment


def test_render_zbuffer_keeps_near_points_over_far_splats():
    """Regression (round-3 review): splat-offset passes redraw every
    point, so a far point's later-pass splat overwrote near pixels.
    The z-buffer must keep the near point's color."""
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud
    from ml_depth_pro_video_tpu.geom.render import render_pointcloud_image

    pts = np.array([
        [0.0, 0.0, 0.0],       # near (red), lands on pixel (50, 50)
        [-1 / 90, 0.0, 5.0],   # far (blue), one pixel left: its +1 splat
                               # hits (50, 50) in a later pass
        [0.5, 0.0, 0.0], [-0.5, 0.0, 0.0],  # fix the span
    ])
    cols = np.array([[1, 0, 0], [0, 0, 1], [0, 0, 0], [0, 0, 0]], float)
    img = render_pointcloud_image(PointCloud(pts, cols), view="front",
                                  width=100, height=100, point_size=3,
                                  max_points=None)
    np.testing.assert_array_equal(img[50, 50], [255, 0, 0])


def test_read_ply_rejects_elements_before_vertex(tmp_path):
    """Regression (round-3 review): the ascii path silently loaded the
    preceding element's rows as vertex data."""
    import pytest

    from ml_depth_pro_video_tpu.geom.pointcloud import read_ply

    p = tmp_path / "bad.ply"
    p.write_text(
        "ply\nformat ascii 1.0\n"
        "element edge 2\nproperty int v1\nproperty int v2\n"
        "element vertex 1\nproperty float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1\n1 2\n0.0 0.0 0.0\n")
    with pytest.raises(ValueError, match="before 'vertex'"):
        read_ply(str(p))


def test_cleaner_cli_explicit_flags_beat_quality_preset(monkeypatch):
    """Regression (round-3 review): --quality silently clobbered
    explicitly passed --nb_points/--radius."""
    from ml_depth_pro_video_tpu.cli import pointcloud_cleaner as mod

    captured = {}
    monkeypatch.setattr(mod, "process_image_to_clean_pointcloud",
                        lambda *a, **kw: captured.update(kw))
    mod.main(["--image_path", "x.jpg", "--quality", "fast", "--nb_points", "5"])
    assert captured["nb_points"] == 5                       # explicit wins
    assert captured["radius"] == mod.QUALITY_PRESETS["fast"]["radius"]  # preset fills the rest


def test_clean_shadows_native_matches_numpy():
    """The threaded C++ shadow cleanup (native/shadows.cpp) must return
    IDENTICAL verdicts to the numpy path — same cells dropped, same
    duplicate-pair NaN rule, same even-median boundary handling."""
    from ml_depth_pro_video_tpu.geom.clean import (
        clean_shadows_numpy,
    )
    from ml_depth_pro_video_tpu.native import neighbors as native

    if not native.available():
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    # structured scene: floor plane + vertical streaks + noise clusters
    floor = np.column_stack([rng.uniform(-3, 3, 4000),
                             rng.uniform(0, 0.05, 4000),
                             rng.uniform(1, 7, 4000)])
    streaks = []
    for _ in range(12):
        cx, cz = rng.uniform(-2, 2), rng.uniform(2, 6)
        h = rng.uniform(0.3, 2.0)
        k = rng.integers(4, 30)
        streaks.append(np.column_stack([
            np.full(k, cx) + rng.normal(0, 0.002, k),
            np.sort(rng.uniform(0, h, k)),
            np.full(k, cz) + rng.normal(0, 0.002, k)]))
    pts = np.concatenate([floor] + streaks)
    # exact duplicates exercise the NaN-median keep rule
    pts = np.concatenate([pts, pts[::97]])
    cloud = PointCloud(pts)

    ref = clean_shadows_numpy(cloud)
    mask = native.clean_shadows_mask(pts, 0.1, 75.0, 3)
    got = cloud.select(mask)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got.points, ref.points)


def test_clean_shadows_wide_angle_threshold():
    """max_shadow_angle > 90: the sign-aware squared test must still
    mean 'median pair angle < t' (the naive squared form silently kept
    every cell), and native must agree with numpy."""
    from ml_depth_pro_video_tpu.geom.clean import clean_shadows_numpy
    from ml_depth_pro_video_tpu.native import neighbors as native

    # consecutive-in-y pairs always have dy >= 0, so in-cell angles are
    # <= 90 degrees: a qualifying ~80-degree leaning streak is kept at
    # t=75 (80 > 75) but MUST drop at t=120 — the naive squared test
    # required angle < 60 there and silently kept it
    k = 16
    t_steps = np.arange(k, dtype=np.float64)
    streak = np.column_stack([
        t_steps * 0.07,            # horizontal run
        t_steps * 0.0125 + 1.0,    # rise: pair angle ~80 deg
        np.full(k, 3.0)])
    # far ghost points stretch the extent so the density-derived cell
    # is large enough to hold the whole streak in ONE cell
    ghosts = np.array([[-10.0, 0.0, -10.0], [10.0, 0.0, 10.0]])
    pts = np.concatenate([streak, ghosts])
    kept_75 = clean_shadows_numpy(PointCloud(pts.copy()), 0.1, 75.0, 3)
    dropped_120 = clean_shadows_numpy(PointCloud(pts.copy()), 0.1, 120.0, 3)
    assert len(kept_75) == k + 2
    # the density grid is 2x2 here: the (-10,-10) ghost shares the
    # streak's (0,0) cell and drops with it; only the (10,10) ghost
    # survives
    assert len(dropped_120) == 1

    if native.available():
        m75 = native.clean_shadows_mask(pts, 0.1, 75.0, 3)
        m120 = native.clean_shadows_mask(pts, 0.1, 120.0, 3)
        assert m75.all()
        assert m120.sum() == 1 and m120[-1]
