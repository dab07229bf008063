"""Full-size end-to-end drive on the real chip: example.jpg -> depth ->
normalized cloud -> clean -> floor plan, with per-stage timings."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_e2e_pipeline.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.utils.profiling import StageTimer
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner
from ml_depth_pro_video_tpu.video.pipeline import (
    compute_ground_from_frame,
    normalized_cloud_from_depth,
)
from ml_depth_pro_video_tpu.geom.clean import clean_shadows, remove_stray_points
from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image
from ml_depth_pro_video_tpu.native import neighbors as nat

log(f"native C++ available: {nat.available()}")

timer = StageTimer()
runner = DepthVideoRunner(precision="bf16", batch_size=1)

with timer.stage("depth (compile+first)"):
    result = runner.infer_one("/root/reference/data/example.jpg")
log(f"depth shape {result['depth'].shape}, f_px={result['focallength_px']:.1f}")

with timer.stage("depth (warm)"):
    result = runner.infer_one("/root/reference/data/example.jpg")

with timer.stage("ground fit"):
    ground = compute_ground_from_frame(result["depth"], result["focallength_px"])
log(f"ground normal {np.round(ground['normal'], 3)}")

with timer.stage("unproject+normalize+grid"):
    cloud = normalized_cloud_from_depth(
        result["depth"], result["focallength_px"], result["image"], ground
    )
log(f"cloud points: {len(cloud)}")

with timer.stage("stray removal (native)"):
    cloud2 = remove_stray_points(cloud, nb_points=20, radius=0.1)
log(f"after stray: {len(cloud2)}")

with timer.stage("shadow cleanup"):
    cloud3 = clean_shadows(cloud2)
log(f"after shadows: {len(cloud3)}")

with timer.stage("fast floorplan"):
    fast_floorplan_image(cloud3, "/root/repo/scripts/e2e_floorplan.png",
                         height_threshold=1.3)

log(timer.report())
log("done")
