"""On-chip validation of the fused resblock kernel (round 4).

A: pallas vs XLA residual at the gated levels (48^2, 96^2): time + max
   rel error.
B: FULL decoder_apply b8 with the kernel active vs forced-XLA — the
   number that matters for bench.py (the 48^2 XLA residual pathology
   costs ~40 ms/batch; scripts/tpu_decoder_profile.out).

Decoder params are built directly on device (full init_depth_pro costs
~90 s of tunnel dispatches for the 952M ViT params this probe never
uses). Writes scripts/tpu_resblock_check.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_resblock_check.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def t(name, f, flops=None, iters=6):
    r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops/dt/1e12:.1f} TFLOPs" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


log(f"devices: {jax.devices()}")

from ml_depth_pro_video_tpu.ops.resblock import residual_block  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, decoder_apply)

B = 8
key = jax.random.PRNGKey(0)


def rnd(*shape, scale=0.05):
    global key
    key, k = jax.random.split(key)
    return (jax.random.normal(k, shape, jnp.float32) * scale).astype(jnp.bfloat16)


# ---- A: kernel vs XLA at the gated levels ----
for res in (48, 96):
    x = rnd(B, res, res, 256, scale=0.3)
    w1, w2 = rnd(3, 3, 256, 256), rnd(3, 3, 256, 256)
    b1, b2 = rnd(256, scale=0.1), rnd(256, scale=0.1)
    fl = 2 * 2 * B * res * res * 256 * 256 * 9
    fx = jax.jit(lambda x, w1, b1, w2, b2: residual_block(x, w1, b1, w2, b2, impl="xla"))
    fp = jax.jit(lambda x, w1, b1, w2, b2: residual_block(x, w1, b1, w2, b2, impl="pallas"))
    t(f"residual XLA b8 @{res}^2", lambda: fx(x, w1, b1, w2, b2), flops=fl)
    t(f"residual PALLAS b8 @{res}^2", lambda: fp(x, w1, b1, w2, b2), flops=fl)
    a = fx(x, w1, b1, w2, b2)
    c = fp(x, w1, b1, w2, b2)
    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    err = float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))) / scale
    log(f"  parity @{res}^2: max rel err {err:.5f}")

# ---- B: full decoder with/without the kernel ----
import dataclasses  # noqa: E402

cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
df = cfg.decoder_features
dims = cfg.dims_encoder
dec_dims = (df,) + tuple(dims)


def fusion(deconv):
    return {
        "res1": {"w1": rnd(3, 3, df, df), "b1": rnd(df, scale=0.1),
                 "w2": rnd(3, 3, df, df), "b2": rnd(df, scale=0.1)},
        "res2": {"w1": rnd(3, 3, df, df), "b1": rnd(df, scale=0.1),
                 "w2": rnd(3, 3, df, df), "b2": rnd(df, scale=0.1)},
        "deconv_w": rnd(df, 4 * df) if deconv else None,
        "out": {"w": rnd(1, 1, df, df), "b": rnd(df, scale=0.1)},
    }


dec = {
    "convs": [None] + [rnd(3, 3, dim, df) for dim in dec_dims[1:]],
    "fusions": [fusion(deconv=(i != 0)) for i in range(len(dec_dims))],
}
sizes = [768 // (2 ** i) for i in range(len(dec_dims))]
encs = [rnd(B, s, s, d, scale=0.3) for s, d in zip(sizes, dec_dims)]
log(f"decoder levels: {[(e.shape[1], e.shape[3]) for e in encs]}")

from ml_depth_pro_video_tpu.ops import resblock as rb  # noqa: E402

dec_fused = jax.jit(decoder_apply)
t("decoder_apply b8 (fused resblock)", lambda: dec_fused(dec, encs))

orig = rb.residual_block
rb.residual_block = lambda x, w1, b1, w2, b2, **kw: rb._xla_residual(x, w1, b1, w2, b2)
dec_xla = jax.jit(decoder_apply)
t("decoder_apply b8 (forced XLA)", lambda: dec_xla(dec, encs))
rb.residual_block = orig

a = dec_fused(dec, encs)[0]
c = dec_xla(dec, encs)[0]
scale = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
err = float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))) / scale
log(f"decoder parity fused vs XLA: max rel err {err:.5f}")

log("DONE")
OUT.close()
