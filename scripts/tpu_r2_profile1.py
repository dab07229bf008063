"""Round-2 profiling: decoder conv MFU, attention kernel, batch scaling.

Establishes where the 48 ms decoder (42% MFU) and 1.65 ms/block-batch
attention actually spend time, and probes the batch-8 OOM.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/scripts/tpu_r2_profile1.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


def t(name, f, flops=None, iters=8):
    r = f()
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops/dt/1e12:.1f} TFLOPs" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


log(f"devices: {jax.devices()}")

from ml_depth_pro_video_tpu.ops.conv import conv2d, conv_transpose2x2  # noqa: E402

# ---- 1. isolated decoder-shaped convs, chained inside one jit ----
for res, ch in [(768, 256), (384, 256), (192, 256), (96, 256)]:
    x = jnp.ones((1, res, res, ch), jnp.bfloat16)
    w = jnp.ones((3, 3, ch, ch), jnp.bfloat16) * 0.01
    b = jnp.zeros((ch,), jnp.bfloat16)

    def chain(x, w, b, n=6):
        for _ in range(n):
            x = conv2d(x, w, b, padding=1)
        return x

    f = jax.jit(lambda x, w, b: chain(x, w, b))
    fl = 6 * 2 * res * res * ch * ch * 9
    t(f"conv3x3 {ch}ch @{res}^2 bf16 (x6 chained)", lambda f=f, x=x, w=w, b=b: f(x, w, b), fl)

# 1b. the same conv as 9 shifted matmuls (accumulate) — XLA version
res, ch = 768, 256


def conv_as_matmuls(x, w, b):
    # x: (1, H, W, C); w: (3, 3, C, C)
    h, wd = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + wd, :].reshape(-1, ch)
            y = jnp.dot(xs, w[dy, dx], preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return (acc + b).astype(x.dtype).reshape(x.shape)


x = jnp.ones((1, res, res, ch), jnp.bfloat16)
w = jnp.ones((3, 3, ch, ch), jnp.bfloat16) * 0.01
b = jnp.zeros((ch,), jnp.bfloat16)
f = jax.jit(lambda x, w, b: conv_as_matmuls(conv_as_matmuls(x, w, b), w, b))
t("conv3x3 as 9 shifted matmuls @768^2 (x2)", lambda: f(x, w, b), 2 * 2 * res * res * ch * ch * 9)

# ---- 2. decoder_apply with realistic encodings ----
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, decoder_apply, head_apply, init_depth_pro,
)
from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402

cfg = DEFAULT_MONODEPTH_CONFIG
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
dec = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a is not None else None,
                   params["decoder"], is_leaf=lambda a: a is None)
hd = params["head"]

for B in (1, 2):
    encs = [
        jnp.ones((B, 768, 768, 256), jnp.bfloat16),
        jnp.ones((B, 384, 384, 256), jnp.bfloat16),
        jnp.ones((B, 192, 192, 512), jnp.bfloat16),
        jnp.ones((B, 96, 96, 1024), jnp.bfloat16),
        jnp.ones((B, 48, 48, 1024), jnp.bfloat16),
    ]
    fdec = jax.jit(lambda *e: decoder_apply(dec, list(e))[0])
    # decoder flops (approx): per level fusion 4x resconv + projections
    t(f"decoder_apply b{B}", lambda fdec=fdec, encs=encs: fdec(*encs), None, iters=4)
    feats = fdec(*encs)
    fhead = jax.jit(lambda f: head_apply(hd, f, Precision.bf16()))
    t(f"head_apply b{B}", lambda fhead=fhead, feats=feats: fhead(feats), None, iters=4)

# ---- 3. attention kernel ----
from ml_depth_pro_video_tpu.ops.attention import (  # noqa: E402
    flash_attention_packed, xla_attention_packed,
)

B, S, D, H = 35, 577, 1024, 16
qkv = jax.random.normal(jax.random.PRNGKey(1), (B, S, 3 * D), jnp.bfloat16)
fl = 4 * B * H * S * S * (D // H)
t("flash_attention_packed (B35,S577,H16)", lambda: flash_attention_packed(qkv, H), fl)
fx = jax.jit(lambda q: xla_attention_packed(q, H))
t("xla_attention_packed", lambda: fx(qkv), fl)

# ---- 4. full infer batch scaling + batch-8 OOM probe ----
from ml_depth_pro_video_tpu.models.depth_pro import infer_fn  # noqa: E402

pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a is not None else None,
                  params, is_leaf=lambda a: a is None)
# keep head fp32-sensitive parts as model does internally; infer_fn casts
for B in (2, 4, 6, 8):
    try:
        x = jnp.ones((B, 1536, 1536, 3), jnp.bfloat16)
        fi = jax.jit(lambda p, x: infer_fn(p, x, None, cfg, Precision.bf16())["depth"])
        d = t(f"full infer b{B}", lambda: fi(pb, x), None, iters=3)
        log(f"  -> {B/d:.2f} fps")
    except Exception as e:  # noqa: BLE001
        log(f"full infer b{B} FAILED: {type(e).__name__}: {str(e)[:300]}")
        break

log("DONE")
OUT.close()
