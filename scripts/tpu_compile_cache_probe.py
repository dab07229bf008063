"""Cold vs warm process start with the persistent XLA compilation cache.

VERDICT r4 #1: the pod deployment restarts processes (preemption, code
pushes) and every fresh process used to re-pay the full-dims XLA
compile. This probe measures, on the real chip, the time from process
start to FIRST depth result for:

  cold  — empty cache directory (the old behavior)
  warm  — second process, same cache directory (the new behavior)

Each phase is its own subprocess (the whole point is the per-process
cost), run sequentially per the one-TPU-process rule. Self-terminating.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE = "/tmp/depth_pro_cache_probe"


def phase(tag: str) -> None:
    os.environ["DEPTH_PRO_COMPILE_CACHE"] = CACHE
    t_start = time.time()
    import dataclasses

    import numpy as np

    from ml_depth_pro_video_tpu.models.depth_pro import DEFAULT_MONODEPTH_CONFIG
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
    runner = DepthVideoRunner(cfg=cfg, precision="bf16", batch_size=8)
    t_init = time.time() - t_start  # imports + random-weight init + put

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (cfg.img_size, cfg.img_size, 3),
                           dtype=np.uint8) for _ in range(8)]
    t1 = time.time()
    out = list(runner.depth_stream(frames))
    t_first = time.time() - t1  # first batch: XLA compile (or cache read)
    assert len(out) == 8 and np.isfinite(out[0]["depth"]).all()

    t2 = time.time()
    out = list(runner.depth_stream(frames))
    t_steady = time.time() - t2  # compiled steady-state for the same batch

    print(json.dumps({
        "phase": tag,
        "init_s": round(t_init, 2),
        "first_batch_s": round(t_first, 2),
        "steady_batch_s": round(t_steady, 2),
        "start_to_first_depth_s": round(t_init + t_first, 2),
    }), flush=True)


def main() -> None:
    import shutil

    shutil.rmtree(CACHE, ignore_errors=True)
    env = dict(os.environ, DEPTH_PRO_COMPILE_CACHE=CACHE)
    for tag in ("cold", "warm"):
        r = subprocess.run([sys.executable, __file__, tag], env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))),
                           timeout=560)
        if r.returncode != 0:
            print(f"{tag} phase failed rc={r.returncode}", flush=True)
            sys.exit(1)
        time.sleep(10)  # let the tunnel settle between processes
    n_entries = len(os.listdir(CACHE)) if os.path.isdir(CACHE) else 0
    print(json.dumps({"cache_entries": n_entries, "cache_dir": CACHE}),
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        phase(sys.argv[1])
    else:
        main()
