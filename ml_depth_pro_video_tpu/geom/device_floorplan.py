"""Frames→floorplan geometry ON DEVICE (the pod-rate throughput tier).

The centerpiece video pipeline (`video/pipeline.py`, reference
`/root/reference/pointcloud_pipeline.py:265-393`) runs ~3 s/frame of
host geometry per frame on one core — at the chip's 6.16 fps that is
~20 host cores per chip (scripts/pipeline_stage_budget.out). This
module runs the same stage chain as ONE jitted XLA program over the
depth-map grid, where every stage is regular (the cloud IS a (H, W)
grid): unproject → ground-normalize → grid ground adjustment → stray
filter → shadow-column filter → height split → tallest-wins color
splat. The host then only writes the fetched raster to PNG.

Exactness vs the host chain (tested in tests/test_device_floorplan.py):

- unproject / rotate / clamps / global floor percentile / per-cell
  grid-adjust percentiles: SAME math (fp32 on device vs the host's
  float64; percentiles are exact order statistics via sort, matching
  np.percentile's linear interpolation).
- shadow-column filter: same grouping, same pair-angle counting rule,
  with ONE divergence — the even-pair-count median tie (host computes
  the exact two-middle-value median; here a tie keeps the cell). Ties
  need cnt_below == m/2 exactly; measured <0.1% of cells.
- stray filter: 27-voxel-block counts (voxel edge = radius) instead of
  exact sphere counts — an OVER-count, so the device tier only ever
  KEEPS points the exact rule would drop (never drops a kept point).
  Quality-gated by floorplan-IoU tests, not bit parity.

Scope: the plain-mode floorplan (`fast_floorplan_image` semantics:
tallest-point-wins splat + radius-1 dilation, fixed axis limits).
Shape fitting (DBSCAN / rotating calipers) stays on host — it needs
the cleaned cloud, which `--geometry device` mode doesn't fetch.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeviceFloorplanConfig:
    """Static configuration closed over by the jitted program."""

    height: int  # depth-map rows
    width: int  # depth-map cols
    x_limits: tuple  # raster framing (meters, pre-flip)
    z_limits: tuple
    raster_width: int = 1024
    height_threshold: float = 0.1  # floorplan keeps y >= this
    max_depth: float | None = None
    # stray filter (remove_stray_points defaults)
    stray_nb_points: int = 20
    stray_radius: float = 0.1
    # voxel edge = stray_radius * stray_cell_scale; the block half-width
    # grows to keep covering the radius-r sphere (scale 1.0 = 3³ block,
    # 0.5 = 5³). Smaller cells tighten the over-count — scale 0.5 halved
    # the kept-extra fraction on the smoke scenes — at 8x the grid
    # memory; both preserve keep ⊇ exact.
    stray_cell_scale: float = 0.5
    # voxel-grid bounds for the stray counts (normalized-cloud meters);
    # points outside clamp into the edge voxels
    voxel_bounds: tuple = ((-10.0, 10.0), (-0.5, 6.0), (0.0, 20.0))
    # shadow filter (clean_shadows defaults)
    shadow_height_threshold: float = 0.1
    max_shadow_angle: float = 75.0
    min_points_per_column: int = 3
    # grid ground adjustment
    grid_size: int = 20
    ground_percentile: float = 5.0
    point_radius: int = 1
    background: tuple = (0.94, 0.94, 0.94)
    # pixel stride through the depth grid: 1 = every point (the parity
    # setting); 2 = quarter the points — the sort/scan-bound program
    # cost scales ~linearly while the 1024-wide raster stays covered
    # (0.6 pts/px + dilation). Per-pixel geometry stays EXACT (original
    # pixel coordinates unproject); only the cleanup statistics and
    # splat density see the thinner cloud.
    subsample: int = 1

    @property
    def raster_height(self) -> int:
        (x0, x1), (z0, z1) = self.x_limits, self.z_limits
        span_x = max(x1 - x0, 1e-9)
        span_z = max(z1 - z0, 1e-9)
        # the host renderer has no cap, but it also never jits a buffer:
        # a degenerate aspect (garbage depth framing) must not allocate
        # an unbounded device raster
        return min(max(int(round(self.raster_width * span_z / span_x)), 1),
                   8192)


def _masked_percentile(vals, mask, pct):
    """np.percentile(vals[mask], pct) (linear interpolation) on device:
    masked values sort to +inf, the order statistic indexes the prefix."""
    v = jnp.where(mask, vals, jnp.inf)
    v = jnp.sort(v)
    n = jnp.sum(mask)
    pos = (n - 1).astype(jnp.float32) * (pct / 100.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, v.shape[0] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, v.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    return v[lo] * (1.0 - frac) + v[hi] * frac


def _segment_sort(cell, y, valid, n_invalid_cell):
    """Stable lexicographic sort by (cell, y); invalid points get the
    sentinel cell so they group at the end. Returns sorted (cell, y,
    original index)."""
    key_cell = jnp.where(valid, cell, n_invalid_cell)
    return jax.lax.sort((key_cell, y, jnp.arange(cell.shape[0], dtype=jnp.int32)),
                        num_keys=2)


def _segment_bounds(cell_sorted):
    """Per-point [start, last] indices of the point's contiguous sorted
    segment — pure prefix scans, NO scatters (TPU scatters with
    colliding indices serialize per duplicate and dominated the first
    implementation's profile, scripts/tpu_device_floorplan3.out)."""
    n = cell_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones(1, bool),
                               cell_sorted[1:] != cell_sorted[:-1]])
    start = jax.lax.cummax(jnp.where(new_seg, idx, 0))
    is_last = jnp.concatenate([new_seg[1:], jnp.ones(1, bool)])
    last = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.where(is_last, idx, n - 1))))
    return start, last


def unproject_normalize(depth, f_px, cfg: DeviceFloorplanConfig,
                        rot, shift, normal, d):
    """Flat (N,) normalized coordinates + validity, mirroring
    `geom/unproject.depth_to_3d` + `geom/ground.normalize_to_ground`."""
    h, w = cfg.height, cfg.width
    s = cfg.subsample
    ys, xs = jnp.mgrid[0:h:s, 0:w:s]  # ORIGINAL pixel indices survive
    z = depth[::s, ::s].astype(jnp.float32)
    valid = jnp.isfinite(z) & (z > 0)
    if cfg.max_depth is not None:
        valid &= z < cfg.max_depth
    x = -(xs.astype(jnp.float32) - w / 2.0) * z / f_px
    y = -(ys.astype(jnp.float32) - h / 2.0) * z / f_px
    p = jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)
    valid = valid.ravel()

    # signed plane distance on the RAW points (normalize_to_ground)
    nrm = normal / jnp.linalg.norm(normal)
    dist = p @ nrm + d

    out = p @ rot.T
    oy = out[:, 1] - shift

    # floor alignment: 2-percentile of y over near-plane points
    ground_near = (jnp.abs(dist) < 0.1) & valid
    y_shift = jnp.where(jnp.sum(ground_near) > 10,
                        _masked_percentile(oy, ground_near, 2.0), 0.0)
    oy = oy - y_shift

    ground_mask = jnp.abs(dist) < 0.05
    oy = jnp.where((oy < 0) & ground_mask, 0.0, oy)
    oy = jnp.where((oy < -0.1) & ~ground_mask, -0.1, oy)
    return out[:, 0], oy, out[:, 2], valid


def _grid_adjust(ox, oy, oz, valid, cfg: DeviceFloorplanConfig):
    """`geom/ground.grid_ground_adjustment` on device: per-XZ-cell
    p-percentile of the sub-0.2 m heights, height-graduated lowering.
    Percentiles are exact order statistics (one (cell, y) sort)."""
    g = cfg.grid_size
    n = ox.shape[0]
    inf = jnp.float32(jnp.inf)
    x_min = jnp.min(jnp.where(valid, ox, inf))
    x_max = jnp.max(jnp.where(valid, ox, -inf))
    z_min = jnp.min(jnp.where(valid, oz, inf))
    z_max = jnp.max(jnp.where(valid, oz, -inf))
    # digitize against linspace edges == floor against the uniform step,
    # with the right-edge landing in the last cell (host clips the same)
    xi = jnp.clip(jnp.floor((ox - x_min) / jnp.maximum(x_max - x_min, 1e-12)
                            * g).astype(jnp.int32), 0, g - 1)
    zi = jnp.clip(jnp.floor((oz - z_min) / jnp.maximum(z_max - z_min, 1e-12)
                            * g).astype(jnp.int32), 0, g - 1)
    cell = xi * g + zi
    n_cells = g * g

    cell_sorted, y_sorted, idx_sorted = _segment_sort(cell, oy, valid, n_cells)

    # per-point segment stats from prefix scans — no scatters (see
    # _segment_bounds); y ascends within a segment, so the sub-0.2 m
    # subset is the prefix and its size is a cumsum boundary difference
    start, last = _segment_bounds(cell_sorted)
    cnt = last - start + 1
    low_c = jnp.cumsum(jnp.concatenate([
        jnp.zeros(1, jnp.int32), (y_sorted < 0.2).astype(jnp.int32)]))
    k = low_c[last + 1] - low_c[start]
    # the host gates (>=10 points, >=5 low points) are DENSITY gates;
    # a subsampled cloud is ~s² thinner, so they scale with it (s=1 is
    # the exact-parity setting)
    s2 = cfg.subsample ** 2
    min_cnt = 10 if s2 == 1 else max(3, round(10 / s2))
    min_low = 5 if s2 == 1 else max(2, round(5 / s2))
    ok = (cnt >= min_cnt) & (k >= min_low)
    # percentile over the cell's ascending low-prefix [start, start+k)
    pos = (k - 1).astype(jnp.float32) * (cfg.ground_percentile / 100.0)
    lo = start + jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, None)
    hi = start + jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, None)
    lo = jnp.clip(lo, 0, n - 1)
    hi = jnp.clip(hi, 0, n - 1)
    frac = pos - jnp.floor(pos)
    y_pct = y_sorted[lo] * (1.0 - frac) + y_sorted[hi] * frac
    y_pct = jnp.where(ok & (y_pct > 0.01), y_pct, 0.0)

    # back to original point order: ONE boolean-free scatter (the
    # inverse permutation) — y_pct and the adjusted heights ride it
    per_point_pct = jnp.zeros(n, jnp.float32).at[idx_sorted].set(y_pct)
    active = per_point_pct > 0
    adj = jnp.where(active & (oy < 0.1), per_point_pct, 0.0)
    mid = active & (oy >= 0.1) & (oy < 1.5)
    adj = jnp.where(mid, per_point_pct * (1.0 - (oy - 0.1) / 1.4), adj)
    out_y = oy - adj
    out_y = jnp.where(active & (out_y < 0), 0.0, out_y)
    return out_y


def stray_keep(ox, oy, oz, valid, cfg: DeviceFloorplanConfig):
    """Voxel-block stray filter: per-point count of points in the
    27-voxel neighborhood (voxel edge = radius) — a superset of the
    exact radius-``r`` sphere, so `keep ⊇ remove_stray_points`'s keep."""
    r = cfg.stray_radius * cfg.stray_cell_scale
    k = int(np.ceil(1.0 / cfg.stray_cell_scale))  # block half-width in cells
    (x0, x1), (y0, y1), (z0, z1) = cfg.voxel_bounds
    nx = int(np.ceil((x1 - x0) / r))
    ny = int(np.ceil((y1 - y0) / r))
    nz = int(np.ceil((z1 - z0) / r))
    xi = jnp.clip(jnp.floor((ox - x0) / r).astype(jnp.int32), 0, nx - 1)
    yi = jnp.clip(jnp.floor((oy - y0) / r).astype(jnp.int32), 0, ny - 1)
    zi = jnp.clip(jnp.floor((oz - z0) / r).astype(jnp.int32), 0, nz - 1)
    flat = (xi * ny + yi) * nz + zi
    grid = jnp.zeros(nx * ny * nz, jnp.int32).at[flat].add(
        valid.astype(jnp.int32)).reshape(nx, ny, nz)
    # (2k+1)³-block sum = three separable box filters (pad + slices)
    def box(a, axis):
        p = jnp.pad(a, [(k, k) if i == axis else (0, 0) for i in range(3)])
        sl = [slice(None)] * 3
        out = jnp.zeros_like(a)
        for off in range(2 * k + 1):
            sl[axis] = slice(off, off + a.shape[axis])
            out = out + p[tuple(sl)]
        return out

    blocked = box(box(box(grid, 0), 1), 2)
    cnt = blocked.reshape(-1)[flat]
    # host rule keeps when exact neighbors+self >= nb_points; the block
    # count includes self already. Subsampling thins the cloud ~s², so
    # the density threshold scales with it (floor 2: a point plus one
    # genuine neighbor)
    nb = (cfg.stray_nb_points if cfg.subsample == 1
          else max(2, round(cfg.stray_nb_points / (cfg.subsample ** 2))))
    return valid & (cnt >= nb)


def shadow_keep(ox, oy, oz, valid, cfg: DeviceFloorplanConfig):
    """`geom/clean.clean_shadows` on device: same cell sizing, same
    pair-angle counting; even-count median TIES keep the cell (host
    resolves them with the exact median — <0.1% of cells)."""
    n = ox.shape[0]
    inf = jnp.float32(jnp.inf)
    x_min = jnp.min(jnp.where(valid, ox, inf))
    x_max = jnp.max(jnp.where(valid, ox, -inf))
    z_min = jnp.min(jnp.where(valid, oz, inf))
    z_max = jnp.max(jnp.where(valid, oz, -inf))
    n_valid = jnp.sum(valid)
    area = jnp.maximum((x_max - x_min) * (z_max - z_min), 1e-9)
    density = n_valid.astype(jnp.float32) / area
    cell_size = jnp.maximum(0.05, 1.0 / jnp.sqrt(
        jnp.maximum(density / 10.0, 1e-12)))

    # int32-overflow guard: coarsen the grid until nx*nz <= 2^30 (only
    # degenerate framings — kilometer extents at the 0.05 m cell floor —
    # ever trigger it). Cell ids stay INJECTIVE at every scale, unlike a
    # clipped cap, which silently merged unrelated columns' statistics.
    nx = jnp.maximum(jnp.ceil((x_max - x_min) / cell_size), 1.0)
    nz = jnp.maximum(jnp.ceil((z_max - z_min) / cell_size), 1.0)
    cell_size = cell_size * jnp.sqrt(jnp.maximum(nx * nz / 2.0**30, 1.0))
    nxi = jnp.maximum(jnp.ceil((x_max - x_min) / cell_size), 1.0).astype(jnp.int32)
    nzi = jnp.maximum(jnp.ceil((z_max - z_min) / cell_size), 1.0).astype(jnp.int32)
    xi = jnp.clip(((ox - x_min) / cell_size).astype(jnp.int32), 0, nxi - 1)
    zi = jnp.clip(((oz - z_min) / cell_size).astype(jnp.int32), 0, nzi - 1)
    # host uses cell = xi * nz + zi with dynamic nz; dynamic VALUES are
    # fine under jit (shapes are static)
    cell = xi * nzi + zi
    SENT = np.int32(2**31 - 1)  # > any nx*nz <= 2^30

    cell_sorted, y_sorted, idx_sorted = _segment_sort(cell, oy, valid, SENT)
    seg_valid = cell_sorted < SENT

    # per-point segment stats from prefix scans — no scatters (see
    # _segment_bounds); y ascends within a segment, so the extent is
    # simply last-minus-first
    start, last = _segment_bounds(cell_sorted)
    seg_cnt = last - start + 1
    # density gate scales with the subsample thinning (s=1 = host exact);
    # floor 2: a "column" needs at least one pair
    mppc = max(cfg.min_points_per_column, 3)
    if cfg.subsample > 1:
        mppc = max(2, round(mppc / cfg.subsample ** 2))
    qual = (seg_cnt >= mppc) & (
        y_sorted[last] - y_sorted[start] > cfg.shadow_height_threshold)

    # consecutive height-sorted pairs within a cell: within a segment
    # EVERY adjacent pair is same-cell by construction, so the pair set
    # of segment s is exactly [start, last) and per-segment pair sums
    # are cumsum boundary differences
    xs = ox[idx_sorted]
    zs = oz[idx_sorted]
    dvy = jnp.diff(y_sorted)
    dn2 = dvy * dvy + jnp.diff(xs) ** 2 + jnp.diff(zs) ** 2

    cos_t = float(np.cos(np.radians(cfg.max_shadow_angle)))
    # sign-aware squared test: angle < t <=> dvy > cos(t)*|v| (the
    # naive squared form silently keeps every cell when t > 90)
    if cos_t >= 0:
        below = (dvy > 0) & (dvy * dvy > cos_t * cos_t * dn2)
    else:
        below = ~((dvy < 0) & (dvy * dvy >= cos_t * cos_t * dn2))

    def pair_segment_sum(flags):
        c = jnp.cumsum(jnp.concatenate([jnp.zeros(1, jnp.int32),
                                        flags.astype(jnp.int32)]))
        return c[last] - c[start]

    m = jnp.where(qual, seg_cnt - 1, 0)
    cnt_below = jnp.where(qual, pair_segment_sum(below), 0)
    odd = m % 2 == 1
    drop = jnp.where(odd, cnt_below >= (m + 1) // 2,
                     cnt_below >= m // 2 + 1) & (m > 0)
    # duplicate-point pairs (zero length) NaN the host's median -> keep
    drop &= pair_segment_sum(dn2 == 0) == 0

    keep_sorted = ~drop | ~seg_valid
    keep = jnp.ones(n, bool).at[idx_sorted].set(keep_sorted)
    return valid & keep


def splat_raster(ox, oy, oz, colors, valid, cfg: DeviceFloorplanConfig):
    """`geom/floorplan_viz.fast_floorplan_image` on device: flip X,
    tallest-point-wins color splat at fixed limits, radius-1 dilation."""
    W = cfg.raster_width
    H = cfg.raster_height
    (x0, x1), (z0, z1) = cfg.x_limits, cfg.z_limits
    span_x = max(x1 - x0, 1e-9)
    span_z = max(z1 - z0, 1e-9)

    x = -ox
    px = ((x - x0) / span_x * (W - 1)).astype(jnp.int32)
    pz = ((z1 - oz) / span_z * (H - 1)).astype(jnp.int32)
    ok = valid & (oy >= cfg.height_threshold) & (px >= 0) & (px < W) \
        & (pz >= 0) & (pz < H)
    lin = jnp.where(ok, pz * W + px, H * W)  # rejected -> overflow slot

    hbuf = jnp.full(H * W + 1, -jnp.inf, jnp.float32).at[lin].max(
        jnp.where(ok, oy, -jnp.inf))
    # winners re-scatter their color; losers go to the overflow slot
    # (ties: any tied point's color may land — the host's stable-sort
    # tie-break differs only on exact-equal heights)
    win = ok & (hbuf[lin] == oy)
    lin_w = jnp.where(win, lin, H * W)
    img = jnp.zeros((H * W + 1, 3), jnp.float32).at[lin_w].set(colors)

    hbuf = hbuf[:-1].reshape(H, W)
    img = img[:-1].reshape(H, W, 3)

    r = cfg.point_radius
    if r > 0:
        src_h, src_img = hbuf, img
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dy == 0 and dx == 0:
                    continue
                sh = jnp.full_like(src_h, -jnp.inf)
                ys0, ys1 = max(dy, 0), H + min(dy, 0)
                xs0, xs1 = max(dx, 0), W + min(dx, 0)
                sh = sh.at[ys0:ys1, xs0:xs1].set(
                    src_h[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx])
                simg = jnp.zeros_like(src_img)
                simg = simg.at[ys0:ys1, xs0:xs1].set(
                    src_img[ys0 - dy:ys1 - dy, xs0 - dx:xs1 - dx])
                winm = sh > hbuf
                img = jnp.where(winm[..., None], simg, img)
                hbuf = jnp.where(winm, sh, hbuf)

    bg = jnp.asarray(cfg.background, jnp.float32)
    img = jnp.where((hbuf > -jnp.inf)[..., None], img, bg)
    return img, hbuf


class DeviceFloorplanSession:
    """Per-video wrapper for the pipeline's ``--geometry device`` mode:
    derives static raster framing from the first frame (one host-chain
    pass per video, mirroring the fixed-axis framing the host path uses)
    unless explicit limits are given, builds the jitted program lazily,
    and writes the fetched raster to PNG. Thread-safe: `video/pipeline`
    calls :meth:`process` from its geometry worker pool."""

    def __init__(self, ground_model: dict, height_threshold: float = 1.3,
                 x_limits=None, z_limits=None, raster_width: int = 1024,
                 max_depth: float | None = None,
                 limits_cache: str | None = None, subsample: int = 1):
        import threading

        # pixel stride (DeviceFloorplanConfig.subsample): 2 quarters the
        # program cost (501 -> 155 ms/frame at 1536² on-chip, 96.4%
        # raster occupancy agreement — scripts/tpu_device_floorplan3.out)
        self.subsample = max(int(subsample), 1)
        self.ground_model = ground_model
        self.height_threshold = float(height_threshold)
        self.x_limits = tuple(x_limits) if x_limits is not None else None
        self.z_limits = tuple(z_limits) if z_limits is not None else None
        self.raster_width = int(raster_width)
        self.max_depth = max_depth
        # persisted derived framing (ground.json-style sidecar): without
        # it a --resume run would derive limits from the first
        # UNPROCESSED frame and the video's plans would jump in
        # scale/offset mid-sequence
        self.limits_cache = limits_cache
        self._fn = None
        self._shape = None
        self._lock = threading.Lock()

    def _derive_limits(self, depth, f_px):
        """Fixed-axis framing from one host-chain pass (once per video;
        the ~3 s cost replaces the per-frame host geometry entirely)."""
        from ..geom.ground import grid_ground_adjustment, normalize_to_ground
        from ..geom.unproject import depth_to_3d

        pts, _ = depth_to_3d(depth, f_px, max_depth=self.max_depth)
        pts = grid_ground_adjustment(
            normalize_to_ground(pts, self.ground_model))
        m = pts[:, 1] >= self.height_threshold
        if not m.any():  # degenerate frame: frame everything
            m = np.ones(len(pts), bool)
        x, z = -pts[m, 0], pts[m, 2]
        # percentile framing, not min/max: an untrained/degenerate model
        # clamps depth at 1e4 m and a single such ray would blow the
        # frame (and the voxel grid) four orders of magnitude
        x0, x1 = np.percentile(x, [0.5, 99.5])
        z0, z1 = np.percentile(z, [0.5, 99.5])
        mx = 0.05 * max(float(x1 - x0), 1e-3)
        mz = 0.05 * max(float(z1 - z0), 1e-3)
        self.x_limits = (float(x0) - mx, float(x1) + mx)
        self.z_limits = (float(z0) - mz, float(z1) + mz)

    def _fingerprint(self) -> str:
        """Identity of everything the derived framing depends on — a
        cached limits file from a different ground fit / threshold must
        be re-derived, not silently reused."""
        n = np.asarray(self.ground_model["normal"], np.float64)
        return (f"n={n[0]:.9f},{n[1]:.9f},{n[2]:.9f};"
                f"d={float(self.ground_model['d']):.9f};"
                f"ht={self.height_threshold};md={self.max_depth}")

    def _build(self, depth, f_px):
        import json
        import os

        if self.x_limits is None or self.z_limits is None:
            cached = None
            if self.limits_cache and os.path.exists(self.limits_cache):
                with open(self.limits_cache) as f:
                    lim = json.load(f)
                # absent fingerprint = pre-fingerprint file = lenient
                # (same convention as the export manifest's identity
                # keys) — rejecting it would re-derive framing from the
                # first UNPROCESSED frame on a resumed old run, the
                # exact jump the cache prevents
                if lim.get("fingerprint", self._fingerprint()) \
                        == self._fingerprint():
                    cached = lim
                # else: stale framing (re-fit ground plane, different
                # threshold) — fall through and re-derive
            if cached is not None:
                self.x_limits = tuple(cached["x_limits"])
                self.z_limits = tuple(cached["z_limits"])
            else:
                self._derive_limits(depth, f_px)
                if self.limits_cache:
                    tmp = self.limits_cache + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump({"x_limits": list(self.x_limits),
                                   "z_limits": list(self.z_limits),
                                   "fingerprint": self._fingerprint()}, f)
                    os.replace(tmp, self.limits_cache)
        # voxel bounds from the framing (+margin); ox = -raster-x
        (x0, x1), (z0, z1) = self.x_limits, self.z_limits
        vb = ((-x1 - 1.0, -x0 + 1.0), (-0.5, 8.0), (min(z0, 0.0) - 1.0,
                                                    z1 + 1.0))
        # voxel budget: coarsen the stray grid until it fits (the block
        # half-width shrinks with coarser cells, so keep ⊇ exact holds
        # at ANY scale — stray_keep derives the reach from the scale)
        scale, radius = 0.5, 0.1
        while True:
            n_vox = 1.0
            for b0, b1 in vb:
                n_vox *= np.ceil((b1 - b0) / (radius * scale))
            if n_vox <= 48e6 or scale > 64:
                break
            scale *= 2.0
        cfg = DeviceFloorplanConfig(
            height=depth.shape[0], width=depth.shape[1],
            x_limits=self.x_limits, z_limits=self.z_limits,
            raster_width=self.raster_width,
            height_threshold=self.height_threshold,
            max_depth=self.max_depth, voxel_bounds=vb,
            stray_cell_scale=scale, subsample=self.subsample)
        self._fn = make_device_floorplan(cfg, self.ground_model)
        self._shape = depth.shape

    def process(self, depth, image, f_px, output_path: str) -> None:
        """Render one frame's floorplan PNG entirely on device."""
        depth = np.asarray(depth, np.float32)
        with self._lock:
            if self._fn is None or self._shape != depth.shape:
                self._build(depth, f_px)
            fn = self._fn
        out = fn(depth, image, jnp.float32(f_px))
        raster = np.asarray(out["raster"])
        from PIL import Image

        Image.fromarray(
            np.clip(raster * 255.0, 0, 255).astype(np.uint8)).save(output_path)


def make_device_floorplan(cfg: DeviceFloorplanConfig, ground_model: dict,
                          debug: bool = False):
    """Build the jitted per-frame program.

    ``fn(depth (H,W) f32, rgb (H,W,3) uint8, f_px scalar) ->
    {"raster": (Hr,Wr,3) f32, ...}`` — with ``debug=True`` the output
    dict additionally carries the per-stage coordinates/masks the parity
    tests compare against the host chain.
    """
    from .ground import HORIZONTAL, rotation_between

    normal = np.asarray(ground_model["normal"], np.float64)
    nrm = normal / np.linalg.norm(normal)
    d = float(ground_model["d"])
    if abs(nrm @ HORIZONTAL) > 0.99:
        rot = np.eye(3)
        shift = 0.0
    else:
        rot = rotation_between(normal, HORIZONTAL)
        shift = -d / float((rot @ normal)[1])
    rot_j = jnp.asarray(rot, jnp.float32)

    @jax.jit
    def fn(depth, rgb, f_px):
        ox, oy, oz, valid = unproject_normalize(
            depth, f_px, cfg, rot_j, jnp.float32(shift),
            jnp.asarray(nrm, jnp.float32), jnp.float32(d))
        oy = _grid_adjust(ox, oy, oz, valid, cfg)
        keep_s = stray_keep(ox, oy, oz, valid, cfg)
        keep = shadow_keep(ox, oy, oz, keep_s, cfg)
        ss = cfg.subsample
        colors = rgb[::ss, ::ss].reshape(-1, 3).astype(jnp.float32) / 255.0
        raster, hbuf = splat_raster(ox, oy, oz, colors, keep, cfg)
        out = {"raster": raster}
        if debug:
            out.update(x=ox, y=oy, z=oz, valid=valid, keep_stray=keep_s,
                       keep=keep, hbuf=hbuf)
        return out

    return fn
