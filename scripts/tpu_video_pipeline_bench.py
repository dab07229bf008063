"""Sustained video-pipeline throughput on the chip: 8 full-HD-ish frames
-> depth -> clouds -> cleaned -> floor plans, with host/device overlap."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/tpu_video_pipeline_bench.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


frames_dir = "/tmp/bench_frames"
out_dir = "/tmp/bench_plans"
os.makedirs(frames_dir, exist_ok=True)
src = Image.open("/root/reference/data/example.jpg")
w, h = src.size
rng = np.random.default_rng(0)
for i in range(8):
    # sliding crops simulate a camera pan
    x0 = int((w - 1536) * i / 7)
    src.crop((x0, 0, x0 + 1536, 1536)).save(f"{frames_dir}/output_{i:04d}.png")

from ml_depth_pro_video_tpu.video.pipeline import process_images_to_floor_plans
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

runner = DepthVideoRunner(precision="bf16", batch_size=2)
t0 = time.time()
completed = process_images_to_floor_plans(
    frames_dir, output_dir=out_dir, num_workers=2, fit_shapes=False,
    renderer="fast", runner=runner, force_reprocess=True,
)
dt = time.time() - t0
ok = sum(1 for v in completed.values() if v["success"])
log(f"frames ok: {ok}/8, total {dt:.1f}s = {dt/8:.2f} s/frame sustained "
    f"(incl. compile on first batch)")

# second pass: warm (no compile, ground cached)
t0 = time.time()
completed = process_images_to_floor_plans(
    frames_dir, output_dir=out_dir, num_workers=2, fit_shapes=False,
    renderer="fast", runner=runner, force_reprocess=True,
)
dt = time.time() - t0
log(f"warm pass: {dt:.1f}s = {dt/8:.2f} s/frame sustained")

# showcase mode: --fit_shapes with the full artifact set (scatter +
# _shapes.txt/_shapes.png/_floor_plan.png per frame) — DBSCAN shape
# fitting in the loop
t0 = time.time()
completed = process_images_to_floor_plans(
    frames_dir, output_dir=out_dir, num_workers=2, fit_shapes=True,
    output_all_files=True, runner=runner, force_reprocess=True,
)
dt = time.time() - t0
ok = sum(1 for v in completed.values() if v["success"])
log(f"fit_shapes pass: ok {ok}/8, {dt:.1f}s = {dt/8:.2f} s/frame sustained")

# showcase mode on the FAST renderer: shape overlays drawn by the numpy
# rasterizer; matplotlib only for the two golden artifacts
t0 = time.time()
completed = process_images_to_floor_plans(
    frames_dir, output_dir=out_dir, num_workers=2, fit_shapes=True,
    output_all_files=True, renderer="fast", runner=runner, force_reprocess=True,
)
dt = time.time() - t0
ok = sum(1 for v in completed.values() if v["success"])
log(f"fit_shapes FAST pass: ok {ok}/8, {dt:.1f}s = {dt/8:.2f} s/frame sustained")

# fast showcase without the matplotlib golden artifacts (scatter with
# overlays only; output_all_files=False also skips _shapes.txt)
t0 = time.time()
completed = process_images_to_floor_plans(
    frames_dir, output_dir=out_dir, num_workers=2, fit_shapes=True,
    output_all_files=False, renderer="fast", runner=runner, force_reprocess=True,
)
dt = time.time() - t0
ok = sum(1 for v in completed.values() if v["success"])
log(f"fit_shapes FAST (no golden artifacts): ok {ok}/8, {dt:.1f}s = {dt/8:.2f} s/frame")
log("done")
