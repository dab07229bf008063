"""Point-cloud cleaning: stray-point removal and shadow-column cleanup.

Behavioral parity with `/root/reference/pointcloud_cleaner.py:142-309`
but vectorized: the reference loops a KD-tree query per point in Python
batches; here neighbor counting is one batched cKDTree query (and the
optional C++ grid-hash counter in ``native/`` when built), and shadow
detection pre-selects tall cells with grouped reductions before the
per-cell angle analysis.
"""

from __future__ import annotations

import numpy as np

from .pointcloud import PointCloud

try:
    from ..native import neighbors as _native
except Exception:  # pragma: no cover
    _native = None


def radius_neighbor_counts(points: np.ndarray, radius: float) -> np.ndarray:
    """Number of neighbors (excluding self) within ``radius`` per point."""
    if _native is not None and _native.available():
        return _native.radius_counts(points, radius)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    counts = tree.query_ball_point(points, r=radius, return_length=True, workers=-1)
    return np.asarray(counts) - 1  # query includes the point itself


def remove_stray_points(cloud: PointCloud, nb_points: int = 20, radius: float = 0.1) -> PointCloud:
    """Keep points with >= nb_points neighbors within radius.

    The reference counts the point itself via Open3D's radius search
    (`pointcloud_cleaner.py:184-187`), so the threshold here is
    ``counts + 1 >= nb_points``.
    """
    if len(cloud) == 0:
        return cloud.copy()
    if _native is not None and _native.available():
        # early-exit mask: point kept once nb_points-1 neighbors are seen
        mask = _native.radius_mask(cloud.points, radius, nb_points - 1)
        return cloud.select(mask)
    counts = radius_neighbor_counts(cloud.points, radius)
    return cloud.select(counts + 1 >= nb_points)


def clean_shadows(
    cloud: PointCloud,
    shadow_height_threshold: float = 0.1,
    max_shadow_angle: float = 75.0,
    min_points_per_column: int = 3,
) -> PointCloud:
    """Drop XZ-grid cells whose points form tall near-vertical columns
    (monocular depth 'shadow' streaks)."""
    points = cloud.points
    n = len(points)
    if n == 0:
        return cloud.copy()

    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    x_min, x_max = x.min(), x.max()
    z_min, z_max = z.min(), z.max()
    area = max((x_max - x_min) * (z_max - z_min), 1e-9)
    density = n / area
    cell_size = max(0.05, 1.0 / np.sqrt(max(density / 10.0, 1e-12)))

    nx = max(int(np.ceil((x_max - x_min) / cell_size)), 1)
    nz = max(int(np.ceil((z_max - z_min) / cell_size)), 1)
    xi = np.minimum(((x - x_min) / cell_size).astype(np.int64), nx - 1)
    zi = np.minimum(((z - z_min) / cell_size).astype(np.int64), nz - 1)
    cell = xi * nz + zi

    # group points by cell: sort once, then segment reductions
    order = np.lexsort((y, cell))
    cell_sorted = cell[order]
    starts = np.nonzero(np.r_[True, cell_sorted[1:] != cell_sorted[:-1]])[0]
    ends = np.r_[starts[1:], n]

    keep = np.ones(n, dtype=bool)
    y_sorted_global = y[order]
    for s, e in zip(starts, ends):
        cnt = e - s
        if cnt < min_points_per_column:
            continue
        ys = y_sorted_global[s:e]  # ascending within the cell (lexsort)
        if ys[-1] - ys[0] <= shadow_height_threshold:
            continue
        idx = order[s:e]
        pts = points[idx]  # already height-sorted
        if cnt >= 3:
            vec = np.diff(pts, axis=0)
            norms = np.linalg.norm(vec, axis=1)
            norms[norms == 0] = 1e-12
            angles = np.degrees(np.arccos(np.clip(vec[:, 1] / norms, -1.0, 1.0)))
            if np.median(angles) < max_shadow_angle:
                keep[idx] = False
    return cloud.select(keep)
