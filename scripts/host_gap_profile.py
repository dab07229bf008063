"""Where do the extra seconds/frame go? Stream-only vs full handle()."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/host_gap_profile.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


frames_dir = "/tmp/gap_frames"
os.makedirs(frames_dir, exist_ok=True)
src = Image.open("/root/reference/data/example.jpg")
for i in range(6):
    x0 = int((src.size[0] - 1536) * i / 5)
    src.crop((x0, 0, x0 + 1536, 1536)).save(f"{frames_dir}/output_{i:04d}.png")

paths = sorted(os.path.join(frames_dir, f) for f in os.listdir(frames_dir))

t0 = time.perf_counter()
imgs = [np.asarray(Image.open(p)) for p in paths]
log(f"PNG decode: {(time.perf_counter()-t0)/len(paths):.2f} s/frame")

from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

runner = DepthVideoRunner(precision="bf16", batch_size=2)
list(runner.depth_stream(paths[:2]))  # warmup/compile

t0 = time.perf_counter()
results = list(runner.depth_stream(paths))
dt = (time.perf_counter() - t0) / len(paths)
log(f"depth stream only: {dt:.2f} s/frame")

from ml_depth_pro_video_tpu.video.pipeline import (
    compute_ground_from_frame, process_single_frame,
)

ground = compute_ground_from_frame(results[0]["depth"], results[0]["focallength_px"])
out_dir = "/tmp/gap_out"
os.makedirs(out_dir, exist_ok=True)

t0 = time.perf_counter()
for r in results:
    ok, dtf = process_single_frame(r, out_dir, ground, fit_shapes=False, renderer="fast")
log(f"geometry handle (serial): {(time.perf_counter()-t0)/len(results):.2f} s/frame")

# full overlapped run
t0 = time.perf_counter()
n = 0
from concurrent.futures import ThreadPoolExecutor

with ThreadPoolExecutor(max_workers=2) as pool:
    futs = [pool.submit(process_single_frame, r, out_dir, ground,
                        fit_shapes=False, renderer="fast")
            for r in runner.depth_stream(paths)]
    for f in futs:
        f.result()
        n += 1
log(f"overlapped depth+geometry: {(time.perf_counter()-t0)/n:.2f} s/frame")
log("DONE")
OUT.close()
