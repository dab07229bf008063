"""Per-stage on-chip breakdown of the 525 ms device floorplan program
(tpu_device_floorplan2.out) — which stage carries the cost, so the
optimization lands where it matters. Each stage timed as its own jit
with chip-resident inputs, plus targeted sub-probes:

- the two (cell, y) lexicographic sorts (grid-adjust + shadows) are the
  suspected dominators (comparator sort on 2.36 M triples);
- a histogram-quantile variant of grid-adjust (scatter-add, no sort);
- a stride-2 subsampled shadow decision (cells decided on 1/4 of the
  points, applied to all).

Self-terminating. Writes scripts/tpu_device_floorplan3.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_device_floorplan3.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def timed(fn, *args, n=5):
    import jax.numpy as jnp

    out = fn(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(jnp.asarray(leaf)[..., :1].astype(jnp.float32)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(jnp.asarray(leaf)[..., :1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from scipy.ndimage import gaussian_filter

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.geom import device_floorplan as dfp
    from ml_depth_pro_video_tpu.utils.synthetic import make_scene_boxes
    from ml_depth_pro_video_tpu.video.pipeline import compute_ground_from_frame

    log(f"devices: {jax.devices()}")
    size = 1536
    rng = np.random.default_rng(7)
    img, depth = make_scene_boxes(rng, size)
    depth = gaussian_filter(depth, sigma=2.0).astype(np.float32)
    f_px = size * 0.9
    ground = compute_ground_from_frame(depth, f_px)

    sess = dfp.DeviceFloorplanSession(ground, height_threshold=0.1)
    sess._build(depth, f_px)
    cfg = dfp.DeviceFloorplanConfig(
        height=size, width=size, x_limits=sess.x_limits,
        z_limits=sess.z_limits, raster_width=1024)

    from ml_depth_pro_video_tpu.geom.ground import HORIZONTAL, rotation_between

    normal = np.asarray(ground["normal"], np.float64)
    nrm = normal / np.linalg.norm(normal)
    d_off = float(ground["d"])
    rot = (np.eye(3) if abs(nrm @ HORIZONTAL) > 0.99
           else rotation_between(normal, HORIZONTAL))
    shift = (0.0 if abs(nrm @ HORIZONTAL) > 0.99
             else -d_off / float((rot @ normal)[1]))

    d_dev = jnp.asarray(depth)
    i_dev = jnp.asarray(img)
    f_dev = jnp.float32(f_px)
    rot_j = jnp.asarray(rot, jnp.float32)

    un = jax.jit(lambda dd, ff: dfp.unproject_normalize(
        dd, ff, cfg, rot_j, jnp.float32(shift),
        jnp.asarray(nrm, jnp.float32), jnp.float32(d_off)))
    t_un = timed(un, d_dev, f_dev)
    ox, oy, oz, valid = un(d_dev, f_dev)
    log(f"unproject+normalize (incl. global 2-pct sort): {t_un*1000:.0f} ms")

    ga = jax.jit(lambda a, b, c, v: dfp._grid_adjust(a, b, c, v, cfg))
    t_ga = timed(ga, ox, oy, oz, valid)
    oy2 = ga(ox, oy, oz, valid)
    log(f"grid adjust (one (cell,y) sort + gathers):     {t_ga*1000:.0f} ms")

    st = jax.jit(lambda a, b, c, v: dfp.stray_keep(a, b, c, v, cfg))
    t_st = timed(st, ox, oy2, oz, valid)
    keep_s = st(ox, oy2, oz, valid)
    log(f"stray voxel filter (scatter + box + gather):   {t_st*1000:.0f} ms")

    sh = jax.jit(lambda a, b, c, v: dfp.shadow_keep(a, b, c, v, cfg))
    t_sh = timed(sh, ox, oy2, oz, keep_s)
    keep = sh(ox, oy2, oz, keep_s)
    log(f"shadow filter (one (cell,y) sort + pairs):     {t_sh*1000:.0f} ms")

    colors = i_dev.reshape(-1, 3).astype(jnp.float32) / 255.0
    sp = jax.jit(lambda a, b, c, col, v: dfp.splat_raster(a, b, c, col, v, cfg))
    t_sp = timed(sp, ox, oy2, oz, colors, keep)
    log(f"splat + dilation:                              {t_sp*1000:.0f} ms")
    log(f"stage sum: {(t_un+t_ga+t_st+t_sh+t_sp)*1000:.0f} ms "
        f"(whole program measured 525)")

    # sub-probe: raw lex sort cost at this size
    srt = jax.jit(lambda c, y: jax.lax.sort(
        (c, y, jnp.arange(c.shape[0], dtype=jnp.int32)), num_keys=2))
    cell = jnp.asarray(
        np.random.default_rng(0).integers(0, 400, ox.shape[0], np.int32))
    t_sort = timed(srt, cell, oy2)
    log(f"raw 2-key lax.sort of 2.36M triples:           {t_sort*1000:.0f} ms")

    # single fused key: cell in high bits + y quantized to 20 bits
    def packed_sort(c, y):
        ymin = jnp.min(y)
        yq = ((y - ymin) * (1048575.0 / (jnp.max(y) - ymin + 1e-9))
              ).astype(jnp.uint32)
        key = (c.astype(jnp.uint32) << 20) | yq
        order = jnp.argsort(key)
        return order

    ps = jax.jit(packed_sort)
    t_ps = timed(ps, cell, oy2)
    log(f"packed single-key argsort (20-bit y quant):    {t_ps*1000:.0f} ms")

    # whole program, post scatter-elimination rewrite
    fn = dfp.make_device_floorplan(cfg, ground)
    whole = jax.jit(lambda dd, ii, ff: fn(dd, ii, ff)["raster"])
    t_whole = timed(whole, d_dev, i_dev, f_dev)
    log(f"WHOLE program (current code):                  {t_whole*1000:.0f} ms")
    r1 = np.asarray(whole(d_dev, i_dev, f_dev))

    # subsample tier: quarter the points, same raster framing
    import dataclasses

    cfg2 = dataclasses.replace(cfg, subsample=2)
    fn2 = dfp.make_device_floorplan(cfg2, ground)
    whole2 = jax.jit(lambda dd, ii, ff: fn2(dd, ii, ff)["raster"])
    t2 = timed(whole2, d_dev, i_dev, f_dev)
    r2 = np.asarray(whole2(d_dev, i_dev, f_dev))
    bg1 = np.abs(r1 - 0.94).max(-1) < 0.02
    bg2 = np.abs(r2 - 0.94).max(-1) < 0.02
    log(f"WHOLE program subsample=2:                     {t2*1000:.0f} ms "
        f"({t_whole/t2:.1f}x); raster occupancy agreement vs full "
        f"{(bg1 == bg2).mean():.4f}, full-drawn missing "
        f"{(~bg1 & bg2).mean():.4f}")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
