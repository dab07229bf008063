"""Device frames→floorplan tier at production dims on the real chip
(VERDICT r4 #2: cut the centerpiece pipeline's biggest host stage).

Times the jitted geom/device_floorplan.py program on 1536² raycast room
scenes (warm, chained) and compares against the host-chain stage costs
(scripts/pipeline_stage_budget.out). Also reports the stray-filter
over-keep at production density and the raster agreement vs the host
chain — the honesty numbers for the approximation tier.

Self-terminating. Writes scripts/tpu_device_floorplan.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_device_floorplan.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    from scipy.ndimage import gaussian_filter

    import jax

    from ml_depth_pro_video_tpu.geom.clean import (
        clean_shadows,
        radius_neighbor_counts,
        remove_stray_points,
    )
    from ml_depth_pro_video_tpu.geom.device_floorplan import (
        DeviceFloorplanSession,
    )
    from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image
    from ml_depth_pro_video_tpu.geom.ground import (
        grid_ground_adjustment,
        normalize_to_ground,
    )
    from ml_depth_pro_video_tpu.geom.pointcloud import PointCloud
    from ml_depth_pro_video_tpu.geom.unproject import depth_to_3d
    from ml_depth_pro_video_tpu.utils.synthetic import make_scene_boxes
    from ml_depth_pro_video_tpu.video.pipeline import compute_ground_from_frame

    log(f"devices: {jax.devices()}")
    size = 1536
    rng = np.random.default_rng(7)
    scenes = []
    for _ in range(4):
        img, depth = make_scene_boxes(rng, size)
        depth = gaussian_filter(depth, sigma=2.0).astype(np.float32)
        scenes.append((img, depth))
    f_px = size * 0.9
    ground = compute_ground_from_frame(scenes[0][1], f_px)

    sess = DeviceFloorplanSession(ground, height_threshold=0.1)
    import os

    # warm-up + compile (includes the once-per-video host framing pass)
    t0 = time.perf_counter()
    sess.process(scenes[0][1], scenes[0][0], f_px, "/tmp/dev_fp_0.png")
    log(f"first frame (framing pass + compile): {time.perf_counter()-t0:.1f} s")

    times = []
    for i, (img, depth) in enumerate(scenes * 3):
        t0 = time.perf_counter()
        sess.process(depth, img, f_px, "/tmp/dev_fp.png")
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    log(f"device floorplan warm: {med*1000:.0f} ms/frame e2e "
        f"(dispatch + on-chip geometry + raster fetch + PNG write; "
        f"host chain was ~3.3 s/frame — {3.3/med:.0f}x)")

    # honesty numbers at production density: host chain on scene 1
    img, depth = scenes[1]
    cloud = depth_to_3d(depth, f_px, image=img)
    pts = grid_ground_adjustment(normalize_to_ground(cloud.points, ground))
    counts = radius_neighbor_counts(pts, 0.1)
    host_keep = counts + 1 >= 20

    from ml_depth_pro_video_tpu.geom.device_floorplan import (
        DeviceFloorplanConfig,
        make_device_floorplan,
    )

    cfg = DeviceFloorplanConfig(
        height=size, width=size, x_limits=sess.x_limits,
        z_limits=sess.z_limits, raster_width=1024)
    dbg = make_device_floorplan(cfg, ground, debug=True)
    out = {k: np.asarray(v) for k, v in
           dbg(depth, img, np.float32(f_px)).items()}
    valid = out["valid"]
    dev_keep = out["keep_stray"][valid]
    dropped_kept = int((host_keep & ~dev_keep).sum())
    extra = float((~host_keep & dev_keep).sum() / max(valid.sum(), 1))
    log(f"stray at 1536^2: host keeps {host_keep.mean():.3f}, "
        f"device extra-keep {extra:.3f} of points, "
        f"host-kept dropped {dropped_kept} (must be 0)")

    cleaned = clean_shadows(remove_stray_points(
        PointCloud(pts, cloud.colors)))
    host = fast_floorplan_image(
        cleaned, None, height_threshold=0.1, x_limits=cfg.x_limits,
        z_limits=cfg.z_limits, width=1024).astype(np.float32) / 255.0
    dev = out["raster"]
    bg_h = np.abs(host - 0.94).max(-1) < 0.02
    bg_d = np.abs(dev - 0.94).max(-1) < 0.02
    log(f"raster at 1536^2: occupancy disagreement "
        f"{(bg_h != bg_d).mean():.4f}, host-drawn missing on device "
        f"{(~bg_h & bg_d).mean():.4f}")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
