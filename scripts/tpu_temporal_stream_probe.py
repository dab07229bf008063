"""Sustained-stream cost of --temporal_smooth on the real chip.

The device-side design claims smoothing adds ZERO host<->device traffic
(the smoothed depth is fetched INSTEAD of the raw one) — and, since the
dispatch-time rewire, zero pipeline stall as well: the smoothing kernel
is dispatched WITH its batch, not at collect time where it would queue
behind the next batch's infer (in-order device stream; the same bug
cost the packed fetch 0.91x before the rewire — scripts/
tpu_packed_fetch.py).

The tunnel's bandwidth drifts minute-to-minute, so modes run in
INTERLEAVED 30 s windows (3 reps) and compare medians:
  raw        — smoothing off
  smooth     — temporal_smooth=0.8
  smooth+u16 — temporal_smooth=0.8 + fetch_pack='u16'

Env: TSP_SECONDS (default 30), TSP_BATCH (default 8).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_temporal_stream_probe.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    import jax

    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    seconds = float(os.environ.get("TSP_SECONDS", "30"))
    batch = int(os.environ.get("TSP_BATCH", "8"))
    log(f"devices: {jax.devices()}  batch={batch}  window={seconds:.0f}s")

    rng = np.random.default_rng(0)
    base = (rng.random((1536, 1536, 3)) * 255).astype(np.uint8)
    ring = [np.clip(base.astype(np.int16) + rng.integers(-3, 4, base.shape),
                    0, 255).astype(np.uint8) for _ in range(12)]

    def frames(n):
        for i in range(n):
            yield ring[i % len(ring)]

    # ONE runner for all modes: two resident ViT-L runners (params +
    # compiled programs + two pipelines of batch-8 1536^2 flights) OOM
    # a single v5e chip. depth_stream reads temporal_smooth/fetch_pack
    # at stream start, so a mode is just attribute toggles.
    MODES = {  # mode -> (temporal_smooth, fetch_pack)
        "raw": (0.0, "none"),
        "smooth": (0.8, "none"),
        "smooth+u16": (0.8, "u16"),
    }
    t0 = time.perf_counter()
    runner = DepthVideoRunner(precision="bf16", batch_size=batch)

    def set_mode(mode):
        runner.temporal_smooth, runner.fetch_pack = MODES[mode]

    for mode in MODES:  # warm every mode's kernels outside the clock
        set_mode(mode)
        list(runner.depth_stream(frames(batch)))
    log(f"compile+warmup: {time.perf_counter() - t0:.0f}s")

    def window(mode):
        r = runner
        set_mode(mode)
        done = 0
        t0 = time.perf_counter()
        stream = r.depth_stream(frames(10 ** 9))
        for _ in stream:
            done += 1
            if done % batch == 0 and time.perf_counter() - t0 > seconds:
                break
        dt = time.perf_counter() - t0
        stream.close()
        return done / dt

    fps = {m: [] for m in MODES}
    for rep in range(3):
        for mode in fps:
            f = window(mode)
            fps[mode].append(f)
            log(f"rep {rep} {mode}: {f:.2f} fps sustained")
    med = {m: sorted(v)[len(v) // 2] for m, v in fps.items()}
    log("median sustained: " + "  ".join(
        f"{m}={v:.2f}" for m, v in med.items()))
    log(f"smoothing cost vs raw: {med['smooth'] / med['raw']:.2f}x; "
        f"smooth+packed vs raw: {med['smooth+u16'] / med['raw']:.2f}x")
    log("done")


if __name__ == "__main__":
    main()
    OUT.close()
