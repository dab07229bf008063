"""Per-frame, per-stage timing over the 8 pan crops: which stage causes
the multi-second spikes seen in tpu_video_pipeline_bench on some frames?
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/tpu_frame_spike_profile.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


src = Image.open("/root/reference/data/example.jpg")
w, h = src.size
frames = [np.asarray(src.crop((int((w - 1536) * i / 7), 0,
                               int((w - 1536) * i / 7) + 1536, 1536)))
          for i in range(8)]

from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner
from ml_depth_pro_video_tpu.video.pipeline import (
    compute_ground_from_frame, normalized_cloud_from_depth,
)
from ml_depth_pro_video_tpu.geom.clean import clean_shadows, remove_stray_points
from ml_depth_pro_video_tpu.geom.floorplan_viz import floorplan_visualization

runner = DepthVideoRunner(batch_size=1)
res0 = runner.infer_one(frames[0])  # warm compile
ground = compute_ground_from_frame(res0["depth"], res0["focallength_px"])

for rep in range(2):
    for i, frame in enumerate(frames):
        t0 = time.time()
        res = runner.infer_one(frame)
        t1 = time.time()
        cloud = normalized_cloud_from_depth(res["depth"], res["focallength_px"],
                                            frame, ground)
        t2 = time.time()
        c2 = remove_stray_points(cloud, nb_points=20, radius=0.1)
        t3 = time.time()
        c3 = clean_shadows(c2)
        t4 = time.time()
        floorplan_visualization(c3, f"/tmp/spike_{i}.png", height_threshold=1.3,
                                fit_shapes=True, output_all_files=True)
        t5 = time.time()
        log(f"rep{rep} frame {i}: depth {t1-t0:5.2f}  cloud {t2-t1:5.2f} ({len(cloud.points)/1e6:.2f}M)"
            f"  stray {t3-t2:5.2f} (->{len(c2.points)/1e6:.2f}M)  shadow {t4-t3:5.2f} (->{len(c3.points)/1e6:.2f}M)"
            f"  plan {t5-t4:5.2f}  total {t5-t0:5.2f}")
log("DONE")
