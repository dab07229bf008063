"""Model-family throughput on the chip: fps/chip for large/base/small
at the production 1536² config, batch 8 bf16 (the headline protocol,
bench.py). The smaller members trade accuracy (they need a distilled
checkpoint, train/distill.py) for throughput by shrinking the ViT
trunk — unlike the ToMe tier, the graph stays exact for whatever
weights they carry."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_model_family.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    fold_head_params,
    infer_fn,
    init_depth_pro,
    model_preset,
)
import dataclasses

log(f"devices: {jax.devices()}")
B = int(__import__("os").environ.get("FAM_BATCH", "8"))

for name in ("small", "base", "large"):
    cfg = dataclasses.replace(model_preset(name), checkpoint_uri=None)
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    params = fold_head_params(params)
    params = jax.tree.map(jnp.asarray, params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, cfg.img_size, cfg.img_size, 3)).astype(np.float32) * 2 - 1)
    fn = jax.jit(lambda p, xx, _cfg=cfg: infer_fn(p, xx, None, _cfg, Precision.bf16())["depth"])
    t0 = time.perf_counter()
    d = fn(params, x)
    _ = float(jnp.asarray(d)[0, 0, 0])
    compile_s = time.perf_counter() - t0
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        d = fn(params, x)
    _ = float(jnp.asarray(d)[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    log(f"{name:6s}: {B / dt:6.2f} fps/chip (batch {B}, {dt * 1e3:6.1f} ms/batch, "
        f"{n_params / 1e6:6.1f} M params, compile {compile_s:.0f}s)")
    del params, x, d

log("done")
OUT.close()
