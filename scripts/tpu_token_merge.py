"""Token-merge speed tier on the chip (VERDICT r2 next #2): fps/chip vs
merge ratio at the full config, plus output deviation vs the exact path
(random weights -> numeric envelope; quality sign-off needs real
weights)."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_token_merge.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG,
    fold_head_params,
    infer_fn,
    init_depth_pro,
)

log(f"devices: {jax.devices()}")

B = int(__import__("os").environ.get("TM_BATCH", "8"))
base = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
params = init_depth_pro(jax.random.PRNGKey(0), base)
params = fold_head_params(params)
params = jax.tree.map(jnp.asarray, params)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((B, base.img_size, base.img_size, 3)).astype(np.float32) * 2 - 1)

results = {}
for ratio in (0.0, 0.25, 0.4, 0.5):
    cfg = dataclasses.replace(base, token_merge_ratio=ratio)
    fn = jax.jit(lambda p, xx, _cfg=cfg: infer_fn(p, xx, None, _cfg, Precision.bf16())["depth"])
    t0 = time.perf_counter()
    d = fn(params, x)
    _ = float(jnp.asarray(d)[0, 0, 0])  # sync via scalar fetch
    compile_s = time.perf_counter() - t0
    iters = 6
    t0 = time.perf_counter()
    for _i in range(iters):
        d = fn(params, x)
    _ = float(jnp.asarray(d)[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    fps = B / dt
    depth = np.asarray(d, np.float64)
    results[ratio] = (fps, depth)
    line = f"ratio {ratio:.2f}: {fps:.2f} fps/chip (batch {B}, {dt * 1e3:.0f} ms/batch, compile {compile_s:.0f}s)"
    if 0.0 in results and ratio > 0.0:
        ref = results[0.0][1]
        inv_r, inv_d = 1.0 / ref, 1.0 / depth
        rel = np.abs(inv_d - inv_r) / (np.abs(inv_r) + 1e-9)
        line += (f"  | inv-depth dev vs exact: mean {rel.mean():.4f}, "
                 f"p95 {np.percentile(rel, 95):.4f}, max {rel.max():.4f}, "
                 f"speedup {fps / results[0.0][0]:.2f}x")
    log(line)

log("done")
