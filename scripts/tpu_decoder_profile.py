"""Round-4: decoder conv formulations at PRODUCTION batch (b8, bf16).

Measures on the real chip, most-valuable-first so a timeout still
yields data (everything device-generated; NO model init — the
952M-param random init alone costs ~90 s over the tunnel):
1. conv3x3 XLA vs im2col single-matmul at 48/96/192/384 (x2 chained),
2. residual pair (relu-conv-relu-conv-add) XLA vs im2col,
3. 768^2 XLA conv reference rate.

Writes scripts/tpu_decoder_profile.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_decoder_profile.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


def t(name, f, flops=None, iters=4):
    r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops/dt/1e12:.1f} TFLOPs" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


log(f"devices: {jax.devices()}")

from ml_depth_pro_video_tpu.ops.conv import conv2d  # noqa: E402

B = 8
key = jax.random.PRNGKey(0)


def rnd(*shape):
    global key
    key, k = jax.random.split(key)
    return (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(jnp.bfloat16)


def conv3x3_im2col(x, w, b):
    Bs, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)
    wm = w.reshape(9 * C, -1)
    y = jnp.dot(patches.reshape(-1, 9 * C), wm.astype(x.dtype),
                preferred_element_type=x.dtype)
    return y.reshape(Bs, H, W, -1) + b.astype(x.dtype)


w256 = rnd(3, 3, 256, 256)
w2_ = rnd(3, 3, 256, 256)
b256 = jnp.zeros((256,), jnp.bfloat16)


def chain_xla(x, w, b):
    for _ in range(2):
        x = conv2d(x, w, b, padding=1)
    return x


def chain_im2col(x, w, b):
    for _ in range(2):
        x = conv3x3_im2col(x, w, b)
    return x


def res_xla(x, w1, b1, w2, b2):
    h = jax.nn.relu(x)
    h = conv2d(h, w1, b1, padding=1)
    h = jax.nn.relu(h)
    h = conv2d(h, w2, b2, padding=1)
    return x + h


def res_im2col(x, w1, b1, w2, b2):
    h = jax.nn.relu(x)
    h = conv3x3_im2col(h, w1, b1)
    h = jax.nn.relu(h)
    h = conv3x3_im2col(h, w2, b2)
    return x + h


fx = jax.jit(chain_xla)
fi = jax.jit(chain_im2col)
r1 = jax.jit(res_xla)
r2 = jax.jit(res_im2col)

for res in (96, 48, 192, 384):
    x = rnd(B, res, res, 256)
    fl = 2 * B * res * res * 256 * 256 * 9
    t(f"conv3x3 XLA b8 @{res}^2 (x2)", lambda x=x: fx(x, w256, b256), flops=2 * fl)
    t(f"conv3x3 im2col b8 @{res}^2 (x2)", lambda x=x: fi(x, w256, b256), flops=2 * fl)
    t(f"residual XLA b8 @{res}^2", lambda x=x: r1(x, w256, b256, w2_, b256), flops=2 * fl)
    t(f"residual im2col b8 @{res}^2", lambda x=x: r2(x, w256, b256, w2_, b256), flops=2 * fl)

# correctness
import numpy as np  # noqa: E402

x = rnd(2, 96, 96, 256)
bq = rnd(256)
a = jax.jit(conv2d, static_argnames=("padding",))(x, w256, bq, padding=1)
c = jax.jit(conv3x3_im2col)(x, w256, bq)
log(f"im2col vs conv max err: {float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))):.2e}")

# 768 reference rate
x = rnd(B, 768, 768, 256)
fl = 2 * B * 768 * 768 * 256 * 256 * 9
t("conv3x3 XLA b8 @768^2 (x2)", lambda: fx(x, w256, b256), flops=2 * fl)
t("residual XLA b8 @768^2", lambda: r1(x, w256, b256, w2_, b256), flops=2 * fl)

# proj convs (the other slow small-map shapes): 3x3 1024->256 @96/48,
# 3x3 512->256 @192
for res, cin in ((96, 1024), (48, 1024), (192, 512)):
    x = rnd(B, res, res, cin)
    w = rnd(3, 3, cin, 256)
    fl = 2 * B * res * res * cin * 256 * 9
    fp = jax.jit(lambda x, w: conv2d(x, w, padding=1))
    fq = jax.jit(lambda x, w: conv3x3_im2col(x, w, jnp.zeros((256,), jnp.bfloat16)))
    t(f"proj XLA {cin}->256 @{res}^2", lambda fp=fp, x=x, w=w: fp(x, w), flops=fl)
    t(f"proj im2col {cin}->256 @{res}^2", lambda fq=fq, x=x, w=w: fq(x, w), flops=fl)

log("DONE1")


# ---- 5. fused Pallas resblock vs XLA/im2col at b8 ----
from ml_depth_pro_video_tpu.ops.resblock import residual_block  # noqa: E402

for res in (96, 48, 192, 384):
    x = rnd(B, res, res, 256)
    fl = 2 * 2 * B * res * res * 256 * 256 * 9
    f_bf = jax.jit(lambda x, w1, b1, w2, b2: residual_block(
        x, w1, b1, w2, b2, impl="pallas"))
    f_f32 = jax.jit(lambda x, w1, b1, w2, b2: residual_block(
        x, w1, b1, w2, b2, impl="pallas", acc_f32=True))
    w3 = w256.reshape(3, 3, 256, 256)
    w4 = w2_.reshape(3, 3, 256, 256)
    try:
        t(f"resblock PALLAS bf16acc b8 @{res}^2",
          lambda f=f_bf, x=x: f(x, w3, b256, w4, b256), flops=fl)
    except Exception as e:
        log(f"resblock PALLAS bf16acc @{res}^2 FAILED: {type(e).__name__}: {str(e)[:200]}")
    try:
        t(f"resblock PALLAS f32acc b8 @{res}^2",
          lambda f=f_f32, x=x: f(x, w3, b256, w4, b256), flops=fl)
    except Exception as e:
        log(f"resblock PALLAS f32acc @{res}^2 FAILED: {type(e).__name__}: {str(e)[:200]}")

# numerical check on-chip
x = rnd(2, 96, 96, 256)
w3 = w256.reshape(3, 3, 256, 256)
w4 = w2_.reshape(3, 3, 256, 256)
try:
    a = jax.jit(lambda x: residual_block(x, w3, b256, w4, b256, impl="xla"))(x)
    c = jax.jit(lambda x: residual_block(x, w3, b256, w4, b256, impl="pallas"))(x)
    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    log(f"resblock pallas vs xla max rel err: "
        f"{float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))) / scale:.5f}")
except Exception as e:
    log(f"resblock check FAILED: {type(e).__name__}: {str(e)[:200]}")

log("DONE2")
OUT.close()
