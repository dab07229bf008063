"""Round-2 check: fused head timing + full infer fps + batch-8 probe."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_profile2.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


def t(name, f, iters=4):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms")
    return dt


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, head_apply, infer_fn, init_depth_pro,
)

cfg = DEFAULT_MONODEPTH_CONFIG
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
hd = params["head"]

for B in (1, 2):
    feats = jnp.ones((B, 768, 768, 256), jnp.bfloat16)
    fhead = jax.jit(lambda f: head_apply(hd, f, Precision.bf16()))
    t(f"fused head_apply b{B}", lambda: fhead(feats))

pb = params
for B in (2, 4, 8):
    try:
        x = jnp.ones((B, 1536, 1536, 3), jnp.bfloat16)
        fi = jax.jit(lambda p, x: infer_fn(p, x, None, cfg, Precision.bf16())["depth"])
        d = t(f"full infer b{B}", lambda: fi(pb, x), iters=3)
        log(f"  -> {B/d:.2f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"full infer b{B} FAILED: {type(e).__name__}: {str(e)[:200]}")
        break

# f_px-given path (video pipeline case: FOV ViT skipped)
for B in (2, 4):
    try:
        x = jnp.ones((B, 1536, 1536, 3), jnp.bfloat16)
        f = jnp.full((B,), 1000.0)
        fi = jax.jit(lambda p, x, f: infer_fn(p, x, f, cfg, Precision.bf16())["depth"])
        d = t(f"infer f_px-given b{B}", lambda: fi(pb, x, f), iters=3)
        log(f"  -> {B/d:.2f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"infer f_px b{B} FAILED: {type(e).__name__}: {str(e)[:200]}")
        break

log("DONE")
OUT.close()
