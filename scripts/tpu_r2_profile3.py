"""Fused-head stage breakdown + variants."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_profile3.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


def t(name, f, iters=6):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms")
    return dt


from ml_depth_pro_video_tpu.ops.conv import (  # noqa: E402
    conv2d, depth_to_space2x2, fold_deconv2x2_conv3x3,
)

B, R, C, M, N = 1, 768, 256, 128, 32
key = jax.random.PRNGKey(0)
feats = jax.random.normal(key, (B, R, R, C), jnp.bfloat16)
w_in = jax.random.normal(key, (3, 3, C, M), jnp.bfloat16) * 0.02
b_in = jnp.zeros((M,), jnp.bfloat16)
wd = jax.random.normal(key, (M, 4 * M), jnp.float32) * 0.02
bd = jnp.zeros((M,), jnp.float32)
wc = jax.random.normal(key, (3, 3, M, N), jnp.float32) * 0.02
bc = jnp.zeros((N,), jnp.float32)
wo = jax.random.normal(key, (N, 1), jnp.float32) * 0.02

f1 = jax.jit(lambda x: conv2d(x, w_in, b_in, padding=1))
x1 = f1(feats)
t("conv_in 3x3 256->128 @768", lambda: f1(feats))

wcomp = fold_deconv2x2_conv3x3(wd, bd, wc)
wcomp_x = wcomp[:, :, :M].astype(jnp.bfloat16)
wcomp_1 = wcomp[:, :, M:].astype(jnp.bfloat16)


def comp_concat(x):
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    return conv2d(jnp.concatenate([x, ones], axis=-1), wcomp.astype(x.dtype), padding=1)


def comp_split(x):
    # ones-conv is input-independent -> constant-folded by XLA
    h = conv2d(x, wcomp_x, padding=1)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    return h + conv2d(ones, wcomp_1, padding=1)


f2a = jax.jit(comp_concat)
f2b = jax.jit(comp_split)
t("composite conv (concat ones, 129ch)", lambda: f2a(x1))
t("composite conv (split const bias)", lambda: f2b(x1))
h = f2b(x1)


def epilogue(h):
    hh = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype)).astype(jnp.float32)
    y = jnp.dot(hh.reshape(B, R, R, 4, N), wo)
    return depth_to_space2x2(y.reshape(B, R, R, 4))


f3 = jax.jit(epilogue)
t("epilogue relu+fp32+1x1+d2s", lambda: f3(h))


def epilogue_bf16(h):
    hh = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype))
    y = jnp.dot(hh.reshape(B, R, R, 4, N), wo.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return depth_to_space2x2(y.reshape(B, R, R, 4))


f4 = jax.jit(epilogue_bf16)
t("epilogue bf16 dot fp32 acc", lambda: f4(h))

# whole fused head as one jit (current model path)
from ml_depth_pro_video_tpu.models.depth_pro import head_apply  # noqa: E402
from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402

hp = {"conv_in": {"w": w_in, "b": b_in},
      "deconv": {"w": wd, "b": bd},
      "conv_mid": {"w": wc, "b": bc},
      "conv_out": {"w": wo.reshape(1, 1, N, 1), "b": jnp.zeros((1,), jnp.float32)}}
f5 = jax.jit(lambda x: head_apply(hp, x, Precision.bf16()))
t("head_apply current (one jit)", lambda: f5(feats))

log("DONE")
OUT.close()
