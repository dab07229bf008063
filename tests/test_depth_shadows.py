"""Depth-space shadow removal tests."""

import numpy as np

from ml_depth_pro_video_tpu.geom.depth_shadows import (
    find_depth_shadows,
    force_horizontal_ground,
    ground_depth_along_rays,
    remove_depth_shadows,
)


def scene_depth(h=80, w=100, f=100.0):
    """Camera above a flat ground plane y=-1 looking forward + a thin
    floating shadow streak."""
    ys, xs = np.indices((h, w))
    dir_y = -(ys - h / 2.0) / f
    # ground plane y = -1: depth z where z*dir_y = -1 (lower half of image);
    # far depth capped so the horizon isn't the dominant discontinuity
    with np.errstate(divide="ignore"):
        z = np.where(dir_y < 0, 1.0 / -dir_y, 10.0)
    z = np.clip(z, 0.5, 10.0)
    return z


def test_find_depth_shadows_flags_discontinuity():
    depth = scene_depth()
    shadowed = depth.copy()
    shadowed[30:34, 40:44] = 2.0  # small isolated blob with sharp edges
    mask = find_depth_shadows(shadowed, threshold_factor=0.2, min_region_size=200)
    assert mask[31, 41]
    # bulk of smooth ground not flagged
    assert mask[70:75, 10:90].mean() < 0.2


def test_force_horizontal_ground():
    model = {"normal": np.array([0.3, 0.9, 0.0]), "d": -1.0,
             "origin": np.array([0.0, 1.0, 0.0])}
    out = force_horizontal_ground(model, max_angle=5.0)
    ang = np.degrees(np.arccos(np.clip(out["normal"] @ np.array([0, 1, 0.0]), -1, 1)))
    assert ang <= 5.0 + 1e-6
    flat = force_horizontal_ground(model, completely_flat=True)
    np.testing.assert_allclose(flat["normal"], [0, 1, 0])


def test_ground_depth_along_rays_matches_plane():
    # plane y = -2 -> normal [0,1,0], d = 2
    model = {"normal": np.array([0.0, 1.0, 0.0]), "d": 2.0, "origin": np.zeros(3)}
    z = ground_depth_along_rays((40, 40), 50.0, model)
    # pick a pixel in the lower half (ray pointing down)
    v, u = 35, 20
    dir_y = -(v - 20.0) / 50.0
    expected = -2.0 / dir_y
    np.testing.assert_allclose(z[v, u], expected)
    # upper-half rays never hit the plane
    assert np.isnan(z[5, 20])


def test_remove_depth_shadows_fills_with_ground():
    depth = scene_depth()
    shadowed = depth.copy()
    shadowed[60:63, 40:70] = 1.0  # artificial near streak over the ground
    model = {"normal": np.array([0.0, 1.0, 0.0]), "d": 1.0, "origin": np.zeros(3)}
    out, mask, gm = remove_depth_shadows(
        shadowed, f_px=100.0, ground_model=model,
        threshold_factor=0.3, min_region_size=400,
    )
    assert mask[61, 50]
    # filled value is the ground depth, not the streak depth
    assert out[61, 50] > 2.0
