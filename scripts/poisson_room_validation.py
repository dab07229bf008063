"""Screened vs unscreened Poisson on a realistic ROOM depth-map cloud
(VERDICT r3 #4): ground plane + two walls + an occluding box, sampled
through a pinhole camera like a real Depth Pro cloud — dense foreground,
sparse background, occlusion shadows, open boundaries. The sphere-only
validation of rounds 2-3 never exercised this regime, where the plain
(unscreened) equation over-smooths and bulges.

Prints a table (also meant for docs/PERFORMANCE.md): per variant,
  vert->scene  unsigned distance of mesh vertices to the true geometry
               (bulge/over-smooth indicator),
  sample->mesh coverage of the observed surface by the mesh,
  watertight   boundary-edge count after the density trim.

Run: python scripts/poisson_room_validation.py [depth]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def room_depth_cloud(h=160, w=200, f=180.0):
    """Raycast a simple room: floor y=-1, back wall z=4, left wall x=-2,
    box [0.4,1.2]x[-1,-0.3]x[2.2,2.8]. Camera at origin, +z forward,
    y up. Returns (points, per-pixel validity)."""
    ys, xs = np.mgrid[0:h, 0:w]
    dx = (xs - w / 2) / f
    dy = -(ys - h / 2) / f
    d = np.stack([dx, dy, np.ones_like(dx)], axis=-1)  # ray dirs (unnormed)

    t_hit = np.full((h, w), np.inf)

    def take(t, cond):
        nonlocal t_hit
        ok = cond & (t > 0) & (t < t_hit)
        t_hit = np.where(ok, t, t_hit)

    # floor y = -1: t = -1 / dy  (dy < 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        tf = -1.0 / d[..., 1]
        p = d * tf[..., None]
        take(tf, (d[..., 1] < 0) & (p[..., 2] < 4.0) & (p[..., 0] > -2.0))
        # back wall z = 4
        tb = 4.0 / d[..., 2]
        p = d * tb[..., None]
        take(tb, (p[..., 1] > -1.0) & (p[..., 0] > -2.0))
        # left wall x = -2: t = -2 / dx (dx < 0)
        tl = -2.0 / d[..., 0]
        p = d * tl[..., None]
        take(tl, (d[..., 0] < 0) & (p[..., 1] > -1.0) & (p[..., 2] < 4.0))
        # box: front face z=2.2 and top face y=-0.3 (the visible ones)
        tz = 2.2 / d[..., 2]
        p = d * tz[..., None]
        take(tz, (p[..., 0] > 0.4) & (p[..., 0] < 1.2)
             & (p[..., 1] > -1.0) & (p[..., 1] < -0.3))
        ty = -0.3 / d[..., 1]
        p = d * ty[..., None]
        take(ty, (d[..., 1] < 0) & (p[..., 0] > 0.4) & (p[..., 0] < 1.2)
             & (p[..., 2] > 2.2) & (p[..., 2] < 2.8))

    valid = np.isfinite(t_hit)
    with np.errstate(invalid="ignore"):
        pts = (d * np.where(valid, t_hit, 0.0)[..., None])[valid]
    return pts, valid


def scene_distance(q: np.ndarray) -> np.ndarray:
    """Unsigned distance from query points to the union of the room's
    VISIBLE surfaces (planes clipped to their extents + box)."""
    x, y, z = q[:, 0], q[:, 1], q[:, 2]

    def plane(dist_axis, in_bounds):
        d = np.abs(dist_axis)
        return np.where(in_bounds, d, np.inf)

    d_floor = plane(y + 1.0, (z < 4.2) & (x > -2.2))
    d_back = plane(z - 4.0, (y > -1.2) & (x > -2.2))
    d_left = plane(x + 2.0, (y > -1.2) & (z < 4.2))
    # box unsigned SDF
    c = np.array([0.8, -0.65, 2.5])
    half = np.array([0.4, 0.35, 0.3])
    dd = np.abs(q - c) - half
    outside = np.linalg.norm(np.maximum(dd, 0), axis=1)
    inside = np.minimum(np.max(dd, axis=1), 0.0)
    d_box = np.abs(outside + inside)
    return np.minimum.reduce([d_floor, d_back, d_left, d_box])


def boundary_edges(faces: np.ndarray) -> int:
    if len(faces) == 0:
        return 0
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return int((counts == 1).sum())


def main():
    from scipy.spatial import cKDTree

    from ml_depth_pro_video_tpu.geom.mesh import (
        estimate_normals, poisson_reconstruct)

    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    pts, valid = room_depth_cloud()
    print(f"room cloud: {len(pts)} points ({valid.mean()*100:.0f}% pixels), "
          f"depth {depth} ({2**depth}^3)")
    rng = np.random.default_rng(0)
    pts = pts + rng.normal(scale=2e-3, size=pts.shape)  # sensor noise

    normals = estimate_normals(pts, radius=0.15, camera=(0.0, 0.0, 0.0))

    # Poisson closes every surface: vertices FAR from all samples are the
    # closure membrane over unobserved space (occlusion shadows, the open
    # camera side), not a reconstruction of anything. Score observed-
    # surface fidelity on the NEAR vertices (within ~2 voxels of a
    # sample) and report the closure fraction separately.
    sample_tree = cKDTree(pts)
    rows = []
    for screen, name in [(0.0, "unscreened"), (4.0, "screened a=4")]:
        mesh = poisson_reconstruct(pts, -normals, depth=depth, screen=screen)
        d_sample = sample_tree.query(mesh.vertices, k=1, workers=-1)[0]
        near = d_sample < 0.1
        v2s = scene_distance(mesh.vertices[near])
        s2m = cKDTree(mesh.vertices).query(pts, k=1, workers=-1)[0]
        rows.append((name, len(mesh.vertices), len(mesh.faces),
                     np.mean(v2s), np.median(v2s), np.quantile(v2s, 0.95),
                     np.mean(s2m), np.quantile(s2m, 0.95),
                     100.0 * (1 - near.mean()),
                     boundary_edges(mesh.faces)))

    # sphere for continuity with the round-2/3 validation
    v = rng.normal(size=(6000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sn = estimate_normals(v, radius=0.3, camera=(0, 0, 0))
    for screen, name in [(0.0, "sphere unscreened"), (4.0, "sphere a=4")]:
        mesh = poisson_reconstruct(v, -sn, depth=min(depth, 6), screen=screen)
        r = np.linalg.norm(mesh.vertices, axis=1)
        err = np.abs(r - 1.0)
        s2m = cKDTree(mesh.vertices).query(v, k=1, workers=-1)[0]
        rows.append((name, len(mesh.vertices), len(mesh.faces),
                     np.mean(err), np.median(err), np.quantile(err, 0.95),
                     np.mean(s2m), np.quantile(s2m, 0.95),
                     0.0, boundary_edges(mesh.faces)))

    hdr = (f"{'variant':<18} {'verts':>6} {'faces':>6} "
           f"{'v2s mean':>9} {'med':>7} {'p95':>7} "
           f"{'s2m mean':>9} {'p95':>7} {'clos%':>6} {'bdry':>5}")
    print(hdr)
    for r in rows:
        print(f"{r[0]:<18} {r[1]:>6} {r[2]:>6} "
              f"{r[3]:>9.4f} {r[4]:>7.4f} {r[5]:>7.4f} "
              f"{r[6]:>9.4f} {r[7]:>7.4f} {r[8]:>6.1f} {r[9]:>5}")


if __name__ == "__main__":
    main()
