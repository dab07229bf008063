"""End-to-end `depth-pro-video --geometry device` on the real chip:
the flagship CLI path with the on-chip geometry tier (frames -> depth
-> device floorplan -> PNG), warm-pass s/frame vs the host-geometry
run on the same frames. Self-terminating; writes
scripts/tpu_device_pipeline_e2e.out.
"""
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/tpu_device_pipeline_e2e.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    frames_dir = "/tmp/devgeo_frames"
    os.makedirs(frames_dir, exist_ok=True)
    src = Image.open("/root/reference/data/example.jpg")
    for i in range(8):
        x0 = 40 * i
        src.crop((x0, 0, x0 + 1536, 1536)).save(
            f"{frames_dir}/output_{i:04d}.png")

    from ml_depth_pro_video_tpu.video.pipeline import (
        process_images_to_floor_plans,
    )
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    runner = DepthVideoRunner(precision="bf16", batch_size=8)

    def run(tag, **kw):
        out_dir = f"/tmp/devgeo_out_{tag}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        done = process_images_to_floor_plans(
            frames_dir, output_dir=out_dir, runner=runner, num_workers=1,
            fit_shapes=False, force_reprocess=True, **kw)
        dt = time.perf_counter() - t0
        n = len(glob.glob(os.path.join(out_dir, "*_clean_simple_view.png")))
        log(f"{tag}: {len(done)} ok, {n} plans, {dt:.1f}s = "
            f"{dt / max(len(done), 1):.2f} s/frame")
        return out_dir

    run("warmup", geometry="device")  # compiles both programs
    d_dev = run("device", geometry="device")
    d_dev2 = run("device_sub2", geometry="device", device_subsample=2)
    d_host = run("host", geometry="host", renderer="fast")

    # structural agreement of one plan (different framings would differ
    # in size; device uses its cached limits, host auto-frames per frame
    # — compare nonbg fractions as a sanity signal, not parity)
    a = np.asarray(Image.open(
        os.path.join(d_dev, "output_0003_clean_simple_view.png")))
    log(f"device plan: {a.shape}, nonbg frac "
        f"{(np.abs(a.astype(int) - 240).max(-1) > 5).mean():.3f}")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
