"""Bound the DP-projection overhead on one chip.

The ≥30 fps v5e-8 target is a projection (one chip measured, 8
extrapolated). Two of the three projection risks are measurable HERE:
the shard_map program overhead (dp=1 mesh vs plain jit — same math,
same chip, different program structure) and the per-batch host→device
feed. ICI collectives for replicated-param DP inference are zero
(no cross-chip communication in the forward), so dp=8 per-chip time ≈
dp=1 time; this probe measures how far the dp wrapper is from the
plain-jit bench number.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG, fold_head_params, infer_fn, init_depth_pro,
)
from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
from ml_depth_pro_video_tpu.parallel.spmd import make_dp_infer

OUT = open("/root/repo/scripts/tpu_dp_overhead.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


cfg = DEFAULT_MONODEPTH_CONFIG
precision = Precision.bf16()
params = jax.tree.map(jnp.asarray, fold_head_params(init_depth_pro(jax.random.PRNGKey(0), cfg)))
B, S = 8, cfg.img_size
x = jnp.zeros((B, S, S, 3), jnp.float32)
ITERS = 6

plain = jax.jit(lambda p, xx: infer_fn(p, xx, None, cfg, precision)["depth"].mean())

mesh = make_mesh(dp=1, tp=1)
dp_fn = make_dp_infer(
    lambda p, xx: {"d": infer_fn(p, xx, None, cfg, precision)["depth"].mean(keepdims=True)[None]},
    mesh,
)

for name, fn in (("plain jit", plain), ("dp=1 shard_map", lambda p, xx: dp_fn(p, xx)["d"].mean())):
    v = float(fn(params, x))  # compile + warm
    float(fn(params, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(params, x)
    float(out)
    dt = time.perf_counter() - t0
    log(f"{name}: {B*ITERS/dt:.3f} fps  ({dt/ITERS*1e3:.1f} ms/batch-{B})")

# host feed: uint8 HWC frames -> device, per batch
frames = np.zeros((B, S, S, 3), np.uint8)
t0 = time.perf_counter()
for _ in range(ITERS):
    dev = jax.device_put(frames)
    dev.block_until_ready()
dt = time.perf_counter() - t0
log(f"uint8 feed: {dt/ITERS*1e3:.1f} ms/batch-{B} ({B*S*S*3/1e6:.0f} MB)")
log("DONE")
