"""On-chip cost of the device floorplan program alone (follow-up to
tpu_device_floorplan.py, whose 1.53 s/frame e2e is tunnel-transfer
bound: ~16 MB/frame of upload at the tunnel's ~20-70 MB/s). Inputs
live on device; chained runs, scalar-fetch sync — the number a real
TPU-VM host (PCIe, sub-ms transfer) would see per frame.

Self-terminating. Writes scripts/tpu_device_floorplan2.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_device_floorplan2.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    from scipy.ndimage import gaussian_filter

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.geom.device_floorplan import (
        DeviceFloorplanConfig,
        DeviceFloorplanSession,
        make_device_floorplan,
    )
    from ml_depth_pro_video_tpu.utils.synthetic import make_scene_boxes
    from ml_depth_pro_video_tpu.video.pipeline import compute_ground_from_frame

    log(f"devices: {jax.devices()}")
    size = 1536
    rng = np.random.default_rng(7)
    img, depth = make_scene_boxes(rng, size)
    depth = gaussian_filter(depth, sigma=2.0).astype(np.float32)
    f_px = size * 0.9
    ground = compute_ground_from_frame(depth, f_px)

    sess = DeviceFloorplanSession(ground, height_threshold=0.1)
    sess._build(depth, f_px)
    cfg_limits = (sess.x_limits, sess.z_limits)
    cfg = DeviceFloorplanConfig(height=size, width=size,
                                x_limits=cfg_limits[0],
                                z_limits=cfg_limits[1], raster_width=1024)
    fn = make_device_floorplan(cfg, ground)

    d_dev = jnp.asarray(depth)
    i_dev = jnp.asarray(img)
    f_dev = jnp.float32(f_px)
    out = fn(d_dev, i_dev, f_dev)
    float(jnp.sum(out["raster"][:2, :2]).astype(jnp.float32))  # compile+sync

    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(d_dev, i_dev, f_dev)
        float(jnp.sum(out["raster"][:2, :2]).astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    t = min(times)
    log(f"on-chip floorplan program (2.36 M pts, sort+scatter+splat): "
        f"{t*1000:.0f} ms/frame (min of 6; incl. ~4 ms tunnel dispatch)")
    log(f"vs host chain ~5.0 s/frame/core (pipeline_stage_budget.out): "
        f"{5.0/t:.0f}x per chip, and the host core is freed entirely")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
