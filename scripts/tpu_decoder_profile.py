"""Round-4: decoder per-level profile at PRODUCTION batch (b8, bf16).

The round-2 per-conv numbers were batch-1; before building the fused
resblock kernel (VERDICT r3 #1) this measures on the real chip:
1. each decoder fusion level in isolation at b8,
2. plain conv3x3 rates per resolution at b8,
3. an im2col single-matmul conv3x3 formulation,
4. the residual pair (relu-conv-relu-conv-add) XLA vs im2col.

All tensors are created ON DEVICE (host->device over the axon tunnel is
~70 MB/s; a single b8 768^2 feature map would take ~30 s to ship).
Self-terminating; writes scripts/tpu_decoder_profile.out.
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


def t(name, f, flops=None, iters=5):
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
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, decoder_apply, init_depth_pro, _fusion_apply,
)

B = 8
key = jax.random.PRNGKey(0)


def rnd(*shape):
    global key
    key, k = jax.random.split(key)
    return (jax.random.normal(k, shape, jnp.float32) * 0.05).astype(jnp.bfloat16)


import dataclasses  # noqa: E402

cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
t0 = time.perf_counter()
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
dec = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16)
                   if a is not None and a.dtype == jnp.float32 else a,
                   params["decoder"], is_leaf=lambda a: a is None)
del params
log(f"init: {time.perf_counter() - t0:.1f}s")

enc_shapes = [(B, 768, 768, 256), (B, 384, 384, 256), (B, 192, 192, 512),
              (B, 96, 96, 1024), (B, 48, 48, 1024)]
encs = [rnd(*s) for s in enc_shapes]

dec_fn = jax.jit(decoder_apply)
t("decoder_apply b8 (full)", lambda: dec_fn(dec, encs))

convs = dec["convs"]
fus = dec["fusions"]
x0s = {}
for i, (e, name, res) in enumerate(zip(
        encs, ["lvl0_768", "lvl1_384", "lvl2_192", "lvl3_96", "lvl4_48"],
        [768, 384, 192, 96, 48])):
    if i == len(encs) - 1:
        def level(e, w=convs[i], i=i):
            p = e if w is None else conv2d(e, w, padding=1)
            return _fusion_apply(fus[i], p, None)

        f = jax.jit(level)
        t(f"fusion {name} b8", lambda f=f, e=e: f(e))
    else:
        x0 = rnd(B, res, res, 256)

        def level(e, x0, w=convs[i], i=i):
            p = e if w is None else conv2d(e, w, padding=1)
            return _fusion_apply(fus[i], x0, p)

        f = jax.jit(level)
        t(f"fusion {name} b8", lambda f=f, e=e, x0=x0: f(e, x0))

w256 = rnd(3, 3, 256, 256)
b256 = jnp.zeros((256,), jnp.bfloat16)

for res in (768, 384, 192, 96, 48):
    x = rnd(B, res, res, 256)
    fl = 2 * B * res * res * 256 * 256 * 9

    def chain(x, w, b, n=4):
        for _ in range(n):
            x = conv2d(x, w, b, padding=1)
        return x

    f = jax.jit(chain)
    t(f"conv3x3 b8 @{res}^2 (x4 chained)", lambda f=f, x=x: f(x, w256, b256),
      flops=4 * fl)


def conv3x3_im2col(x, w, b):
    Bs, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)
    wm = w.reshape(9 * C, -1)
    y = jnp.dot(patches.reshape(-1, 9 * C), wm.astype(x.dtype),
                preferred_element_type=x.dtype)
    return y.reshape(Bs, H, W, -1) + b.astype(x.dtype)


for res in (384, 192, 96, 48):
    x = rnd(B, res, res, 256)
    fl = 2 * B * res * res * 256 * 256 * 9

    def chain(x, w, b, n=4):
        for _ in range(n):
            x = conv3x3_im2col(x, w, b)
        return x

    f = jax.jit(chain)
    t(f"im2col conv3x3 b8 @{res}^2 (x4 chained)", lambda f=f, x=x: f(x, w256, b256),
      flops=4 * fl)

x = rnd(2, 96, 96, 256)
bq = rnd(256)
a = jax.jit(conv2d, static_argnames=("padding",))(x, w256, bq, padding=1)
c = jax.jit(conv3x3_im2col)(x, w256, bq)
log(f"im2col vs conv max err: {float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))):.2e}")


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


w2_ = rnd(3, 3, 256, 256)
f1 = jax.jit(res_xla)
f2 = jax.jit(res_im2col)
for res in (384, 192, 96, 48):
    x = rnd(B, res, res, 256)
    fl = 2 * 2 * B * res * res * 256 * 256 * 9
    t(f"residual XLA b8 @{res}^2", lambda x=x: f1(x, w256, b256, w2_, b256), flops=fl)
    t(f"residual im2col b8 @{res}^2", lambda x=x: f2(x, w256, b256, w2_, b256), flops=fl)

log("DONE")
OUT.close()
