"""Per-stage host profile of one video-pipeline frame (warm model)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/host_stage_profile.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


src = Image.open("/root/reference/data/example.jpg").crop((0, 0, 1536, 1536))
frame = np.asarray(src)

from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner
from ml_depth_pro_video_tpu.video.pipeline import (
    compute_ground_from_frame, normalized_cloud_from_depth,
)
from ml_depth_pro_video_tpu.geom.clean import remove_stray_points, clean_shadows
from ml_depth_pro_video_tpu.geom.floorplan_viz import fast_floorplan_image

runner = DepthVideoRunner(precision="bf16", batch_size=1)
r = runner.infer_one(frame)  # compile
t0 = time.perf_counter()
r = runner.infer_one(frame)
log(f"depth (warm): {time.perf_counter()-t0:.2f} s")

t0 = time.perf_counter()
ground = compute_ground_from_frame(r["depth"], r["focallength_px"])
log(f"ground fit (once/video): {time.perf_counter()-t0:.2f} s")

t0 = time.perf_counter()
cloud = normalized_cloud_from_depth(r["depth"], r["focallength_px"], frame, ground)
log(f"normalized cloud (fused native): {time.perf_counter()-t0:.2f} s  ({len(cloud.points)} pts)")

t0 = time.perf_counter()
cloud2 = remove_stray_points(cloud)
log(f"stray removal: {time.perf_counter()-t0:.2f} s ({len(cloud.points)} -> {len(cloud2.points)})")

t0 = time.perf_counter()
cloud3 = clean_shadows(cloud2)
log(f"shadow cleanup: {time.perf_counter()-t0:.2f} s ({len(cloud2.points)} -> {len(cloud3.points)})")

t0 = time.perf_counter()
img = fast_floorplan_image(cloud3, height_threshold=None)
log(f"fast floorplan render: {time.perf_counter()-t0:.2f} s")

log("DONE")
OUT.close()
