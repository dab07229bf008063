"""Per-stage host budget for the centerpiece frames→floorplan path
(VERDICT r4 #2).

The round-4 sustained harness measured decode at 0.28 cores/chip but
the frames→floorplan pipeline's 3.35 s/frame warm figure had no
per-stage decomposition — pod feasibility was an extrapolation. This
script times every host stage of `video/pipeline.process_single_frame`
(plain mode, fast renderer) on REALISTIC structured clouds: raycast
room scenes (utils/synthetic.py) at 1536², with a small Gaussian blur
on the depth map to reproduce the monocular depth-edge "shadow" streaks
the cleanup stages exist for (a sharp raycast depth has none, which
made the old host_stage_profile degenerate).

Output: s/frame per stage and cores-per-chip at the 6.16 fps/chip
device rate — the sizing numbers a pod deployment needs. CPU-only
(no TPU use; depth comes from the raycaster, not the model).

Env: BUDGET_REPS (default 5), BUDGET_SIZE (default 1536).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/pipeline_stage_budget.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    from scipy.ndimage import gaussian_filter

    from ml_depth_pro_video_tpu.geom.clean import (
        clean_shadows,
        remove_stray_points,
    )
    from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image
    from ml_depth_pro_video_tpu.utils.synthetic import make_scene_boxes
    from ml_depth_pro_video_tpu.video.pipeline import (
        compute_ground_from_frame,
        normalized_cloud_from_depth,
    )

    reps = int(os.environ.get("BUDGET_REPS", "5"))
    size = int(os.environ.get("BUDGET_SIZE", "1536"))
    fps_chip = 6.16  # BENCH_r04 device rate the host must feed

    rng = np.random.default_rng(7)
    frames = []
    for _ in range(reps):
        img, depth = make_scene_boxes(rng, size)
        # monocular nets smear depth across object edges — the blur
        # reproduces those interpolated "shadow" points so the cleanup
        # stages do real work (sharp raycast depth gives them nothing)
        depth = gaussian_filter(depth, sigma=2.0).astype(np.float32)
        frames.append((img, depth))
    f_px = size * 0.9

    img0, depth0 = frames[0]
    t0 = time.perf_counter()
    ground = compute_ground_from_frame(depth0, f_px)
    log(f"ground fit (once/video): {time.perf_counter() - t0:.2f} s")

    stages = {k: [] for k in ("cloud", "stray", "shadows", "render")}
    n_pts = []
    for img, depth in frames:
        t0 = time.perf_counter()
        cloud = normalized_cloud_from_depth(depth, f_px, img, ground)
        stages["cloud"].append(time.perf_counter() - t0)
        n_pts.append(len(cloud))

        t0 = time.perf_counter()
        cloud = remove_stray_points(cloud, nb_points=20, radius=0.1)
        stages["stray"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        cloud = clean_shadows(cloud)
        stages["shadows"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        fast_floorplan_image(cloud, "/tmp/budget_plan.png",
                             height_threshold=0.1)
        stages["render"].append(time.perf_counter() - t0)

    log(f"scenes: {reps} x {size}^2, {np.mean(n_pts) / 1e6:.2f} M pts/frame "
        f"mean after unproject")
    total = 0.0
    log(f"{'stage':<28}{'s/frame (median)':<18}{'cores/chip @6.16fps':<20}")
    for k, label in (("cloud", "unproject+normalize+adjust"),
                     ("stray", "stray removal"),
                     ("shadows", "shadow cleanup"),
                     ("render", "floorplan render+png")):
        t = float(np.median(stages[k]))
        total += t
        log(f"{label:<28}{t:<18.3f}{t * fps_chip:<20.2f}")
    log(f"{'TOTAL host geometry':<28}{total:<18.3f}{total * fps_chip:<20.2f}")
    log(f"(+ decode 0.046 s/frame = 0.28 cores/chip, feed_sustained.out)")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
