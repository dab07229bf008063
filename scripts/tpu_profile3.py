"""Decoder conv efficiency: find the fastest formulation for the DPT
fusion convs (3x3, 256ch at 768^2/384^2)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

OUT = open("/root/repo/scripts/tpu_profile3.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


def t(name, f, flops, iters=6):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms {flops/dt/1e12:.1f} TFLOPs")
    return dt


R, C = 768, 256
x = jnp.ones((1, R, R, C), jnp.bfloat16)
w = jnp.ones((3, 3, C, C), jnp.bfloat16)
FL = 2 * R * R * C * C * 9

conv_f32acc = jax.jit(lambda x, w: lax.conv_general_dilated(
    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.float32).astype(jnp.bfloat16))
t("conv NHWC f32-acc", lambda: conv_f32acc(x, w), FL)

conv_bf16 = jax.jit(lambda x, w: lax.conv_general_dilated(
    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    preferred_element_type=jnp.bfloat16))
t("conv NHWC bf16-acc", lambda: conv_bf16(x, w), FL)

xc = jnp.ones((1, C, R, R), jnp.bfloat16)
wc = jnp.ones((C, C, 3, 3), jnp.bfloat16)
conv_nchw = jax.jit(lambda x, w: lax.conv_general_dilated(
    x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW"),
    preferred_element_type=jnp.float32).astype(jnp.bfloat16))
t("conv NCHW f32-acc", lambda: conv_nchw(xc, wc), FL)


# chained convs (amortize dispatch): the actual res-block pattern
@jax.jit
def resblock_chain(x, w):
    for _ in range(4):
        h = jax.nn.relu(x)
        h = lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        h = jax.nn.relu(h)
        h = lax.conv_general_dilated(h, w, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        x = x + h
    return x


t("4 chained resblocks (8 convs)", lambda: resblock_chain(x, w), 8 * FL)

# full decoder on realistic encodings
from ml_depth_pro_video_tpu.models import depth_pro as dp

import dataclasses

cfg = dataclasses.replace(dp.DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
params = jax.tree.map(jnp.asarray, dp.init_depth_pro(jax.random.PRNGKey(0), cfg))
enc = [
    jnp.ones((1, 768, 768, 256), jnp.bfloat16),
    jnp.ones((1, 384, 384, 256), jnp.bfloat16),
    jnp.ones((1, 192, 192, 512), jnp.bfloat16),
    jnp.ones((1, 96, 96, 1024), jnp.bfloat16),
    jnp.ones((1, 48, 48, 1024), jnp.bfloat16),
]
dec = jax.jit(lambda p, e: dp.decoder_apply(p["decoder"], e)[0])
DEC_FLOPS = 4.0e12
t("full decoder", lambda: dec(params, enc), DEC_FLOPS)
log("done")
