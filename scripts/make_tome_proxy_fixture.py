"""Train + check in the ToMe quality-gate proxy (VERDICT r4 #3).

The round-4 trained-proxy gate (`scripts/tome_quality_gate.py`) ran
once as a 1,531 s script — nothing guarded the merge path's QUALITY as
the kernel/merge code evolves. This script makes the gate a CI
regression test:

1. trains the proxy (8-block ViT, embed 128, 512-px network) with the
   REAL training loop on a MIXED dataset of both synthetic families
   (`utils/synthetic.py`: boxes = redundancy-rich, edges = thin
   structures + high-frequency clutter — the max-deviation tail);
2. saves the weights to ``tests/fixtures/tome_proxy_weights.npz``
   (few MB, checked in);
3. re-execs itself on the CPU backend to record per-family deviation
   bounds into ``tests/fixtures/tome_proxy_bounds.json`` — recorded on
   the SAME platform the CI test runs on, so the 2x regression margin
   measures code drift, not platform rounding.

Run (TPU, ~25 min): python scripts/make_tome_proxy_fixture.py
Env: TOME_STEPS (default 480), TOME_SCENES (default 96),
TOME_CPU=1 to also train on CPU (slow; for environments without a chip).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

FIXTURE_DIR = "/root/repo/tests/fixtures"
WEIGHTS = os.path.join(FIXTURE_DIR, "tome_proxy_weights.npz")
BOUNDS = os.path.join(FIXTURE_DIR, "tome_proxy_bounds.json")
OUT_PATH = "/root/repo/scripts/make_tome_proxy_fixture.out"


def proxy_config():
    from ml_depth_pro_video_tpu.utils.synthetic import tome_proxy_config

    return tome_proxy_config()


def eval_curves(params, **kw):
    from ml_depth_pro_video_tpu.utils.synthetic import tome_deviation_curves

    return tome_deviation_curves(params, **kw)


def record_bounds() -> None:
    """CPU phase: measure the curves with the checked-in weights on the
    platform CI runs, and write the bounds file."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ml_depth_pro_video_tpu.ckpt.convert import load_params

    params = jax.tree.map(lambda a: np.asarray(a, np.float32),
                          load_params(WEIGHTS))
    curves = eval_curves(params)
    with open(BOUNDS, "w") as f:
        json.dump({"platform": "cpu", "curves": curves}, f, indent=1)
    print(json.dumps(curves, indent=1))


def train() -> None:
    import jax

    if os.environ.get("TOME_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from ml_depth_pro_video_tpu.ckpt.convert import save_params
    from ml_depth_pro_video_tpu.train.loop import fit
    from ml_depth_pro_video_tpu.utils.synthetic import write_dataset

    log = open(OUT_PATH, "w")

    def say(m):
        print(m, flush=True)
        log.write(m + "\n")
        log.flush()

    steps = int(os.environ.get("TOME_STEPS", "480"))
    n_scenes = int(os.environ.get("TOME_SCENES", "96"))
    say(f"devices: {jax.devices()}")

    proxy = proxy_config()
    root = "/tmp/tome_scenes_mixed"
    if not os.path.exists(os.path.join(root, f"scene_{n_scenes - 1:04d}.png")):
        t0 = time.perf_counter()
        write_dataset(root, n_scenes, size=proxy.img_size,
                      families=("boxes", "edges"))
        say(f"dataset: {n_scenes} mixed scenes in "
            f"{time.perf_counter() - t0:.0f}s")

    batch = 8
    epochs = max(1, steps * batch // n_scenes)
    t0 = time.perf_counter()
    state = fit(root, cfg=proxy, batch_size=batch, epochs=epochs, lr=3e-4,
                holdout=8, log_every=50,
                checkpoint_dir="/tmp/tome_fixture_ckpt", save_every=200)
    say(f"trained {epochs} epochs in {time.perf_counter() - t0:.0f}s")

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    # fp16 storage halves the checked-in size; consumers cast back to
    # fp32 at load, and the CPU bounds are recorded AFTER the roundtrip
    # so the quantization is inside the gate's baseline, not its error
    params = jax.tree.map(lambda a: np.asarray(a, np.float16), state.params)
    save_params(WEIGHTS, params)
    say(f"saved {WEIGHTS} ({os.path.getsize(WEIGHTS) / 1e6:.1f} MB)")
    params = jax.tree.map(lambda a: a.astype(np.float32), params)

    # on-chip curves for the log (informational; the CI bounds are
    # recorded on CPU by the subprocess below)
    for k, v in eval_curves(params).items():
        say(f"tpu {k}: mean {v['mean']:.4f} p95 {v['p95']:.4f} "
            f"max {v['max']:.4f}")

    say("recording CPU bounds in a fresh process...")
    r = subprocess.run([sys.executable, __file__, "--record"],
                       cwd="/root/repo", timeout=1800,
                       capture_output=True, text=True)
    say(r.stdout)
    if r.returncode != 0:
        say(f"RECORD FAILED rc={r.returncode}: {r.stderr[-2000:]}")
        sys.exit(1)
    say("DONE")
    log.close()


if __name__ == "__main__":
    if "--record" in sys.argv:
        record_bounds()
    else:
        train()
