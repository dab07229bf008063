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


def test_remove_depth_shadows_never_emits_nan_and_keeps_off_ground():
    """Reference semantics (`mesh_from_depth.py:1866-1960`): no NaNs,
    fills clamp to >= 0.1 m, above-horizon shadows keep original depth,
    interpolate_ground=False returns the depth unchanged."""
    depth = scene_depth()
    shadowed = depth.copy()
    shadowed[60:63, 40:70] = 1.0          # below-horizon streak
    shadowed[5:8, 40:70] = 1.0            # above-horizon streak (sky-side)
    model = {"normal": np.array([0.0, 1.0, 0.0]), "d": 1.0, "origin": np.zeros(3)}
    out, mask, _ = remove_depth_shadows(
        shadowed, f_px=100.0, ground_model=model,
        threshold_factor=0.3, min_region_size=400,
    )
    assert np.isfinite(out).all()
    assert (out >= 0.1).all()
    if mask[6, 50]:  # above-horizon shadow: ray misses the plane -> untouched
        assert out[6, 50] == shadowed[6, 50]

    same, _, _ = remove_depth_shadows(
        shadowed, f_px=100.0, ground_model=model, interpolate_ground=False,
        threshold_factor=0.3, min_region_size=400,
    )
    np.testing.assert_array_equal(same, shadowed)


def test_force_horizontal_ground_exact_angle():
    """The clamp rotates the normal to EXACTLY max_angle from vertical
    (a lerp-and-normalize undershoots)."""
    from ml_depth_pro_video_tpu.geom.depth_shadows import force_horizontal_ground

    n = np.array([np.sin(np.radians(30)), np.cos(np.radians(30)), 0.0])
    model = {"normal": n, "d": -1.0, "origin": np.array([0.0, 1.0, 0.0])}
    out = force_horizontal_ground(model, max_angle=5.0)
    ang = np.degrees(np.arccos(np.clip(out["normal"] @ [0, 1, 0], -1, 1)))
    np.testing.assert_allclose(ang, 5.0, atol=1e-9)
