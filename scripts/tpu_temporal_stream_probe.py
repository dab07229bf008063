"""Sustained-stream cost of --temporal_smooth on the real chip.

The round-4 device-side design claims smoothing adds ZERO host<->device
traffic (the smoothed depth is fetched INSTEAD of the raw one). This
probe streams the same in-RAM uint8 frames through the REAL
DepthVideoRunner.depth_stream with smoothing off and on and reports
s/frame for each — on this tunnel-bound host the pre-rewire design
(host-side smoothing re-uploading + re-downloading 2x9.4 MB/frame)
would show up as ~0.3-1 s/frame of extra transfer; the device-side
design should be within noise of raw.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_temporal_stream_probe.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

N = 16
rng = np.random.default_rng(0)
base = (rng.random((1536, 1536, 3)) * 255).astype(np.uint8)
frames = [np.clip(base.astype(np.int16) + rng.integers(-3, 4, base.shape),
                  0, 255).astype(np.uint8) for _ in range(N)]

for smooth in (0.0, 0.8):
    runner = DepthVideoRunner(precision="bf16", batch_size=8,
                              temporal_smooth=smooth)
    # warm the compile outside the clock
    list(runner.depth_stream(frames[:8]))
    t0 = time.perf_counter()
    out = list(runner.depth_stream(frames))
    dt = (time.perf_counter() - t0) / N
    assert len(out) == N and all(np.isfinite(r["depth"]).all() for r in out)
    log(f"temporal_smooth={smooth}: {dt:.3f} s/frame sustained "
        f"({N} frames, batch 8, 1536^2, tunnel-bound host)")
log("done")
OUT.close()
