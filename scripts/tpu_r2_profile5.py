"""Locate remaining head fat: chained per-op costs + more fold variants."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_profile5.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


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
w_out_dec = jax.random.normal(key, (1, 1, C, C), jnp.bfloat16) * 0.02  # decoder out_conv


def t(name, f, iters=4, chain=6, flops=None):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters / chain
    extra = f" {flops/dt/1e12:.1f} TFLOPs" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


def chain_op(op, x0, n=6):
    def run(x):
        out = None
        for _ in range(n):
            out = op(x)
            x = x + (jnp.mean(out) * 1e-30).astype(x.dtype)
        return out
    return jax.jit(run)


# per-op chained costs
f = chain_op(lambda x: conv2d(x, w_in, b_in, padding=1), feats)
t("conv_in 3x3 256->128 chained", lambda: f(feats), flops=2 * R * R * C * M * 9)

wcomp = np.asarray(fold_deconv2x2_conv3x3(wd, bd, wc))
wcx = jnp.asarray(wcomp[:, :, :M]).astype(jnp.bfloat16)
wc1 = jnp.asarray(wcomp[:, :, M:]).astype(jnp.bfloat16)
x1 = jax.jit(lambda x: conv2d(x, w_in, b_in, padding=1))(feats)
f = chain_op(lambda x: conv2d(x, wcx, padding=1), x1)
t("composite 3x3 128->128 chained", lambda: f(x1), flops=2 * R * R * M * 4 * N * 9)

wbig = np.zeros((4 * N, 4), np.float32)
for g in range(4):
    wbig[g * N:(g + 1) * N, g] = np.asarray(wo[:, 0])
wbig = jnp.asarray(wbig)
h1 = jax.jit(lambda x: conv2d(x, wcx, padding=1))(x1)


def epi(h):
    h = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype))
    y = jnp.dot(h, wbig.astype(h.dtype), preferred_element_type=jnp.float32)
    return jax.nn.relu(depth_to_space2x2(y))


f = chain_op(epi, h1)
t("epilogue chained", lambda: f(h1))

# E: decoder out_conv (1x1 256->256) folded into conv_in (3x3 256->128)
# exact: 1x1 then 3x3 -> 3x3 with W'[dy,dx] = Wout @ Win[dy,dx]; out_conv
# bias rides the ones channel
w_e = jnp.einsum("io,yxom->yxim", w_out_dec.astype(jnp.float32)[0, 0],
                 w_in.astype(jnp.float32)).astype(jnp.bfloat16)
f = chain_op(lambda x: conv2d(x, w_e, b_in, padding=1), feats)
t("E outconv+conv_in folded 3x3 256->128", lambda: f(feats), flops=2 * R * R * C * M * 9)
# baseline it replaces: out_conv then conv_in
f = chain_op(lambda x: conv2d(conv2d(x, w_out_dec), w_in, b_in, padding=1), feats)
t("baseline out_conv + conv_in", lambda: f(feats),
  flops=2 * R * R * C * C + 2 * R * R * C * M * 9)

# D fixed: 5x5 = conv_in (3x3) composed with composite (3x3)
w5 = np.zeros((5, 5, C, 4 * N), np.float32)
wci = np.asarray(w_in, np.float32)
wcxn = wcomp[:, :, :M]
for a in range(3):
    for b_ in range(3):
        for s in range(3):
            for t_ in range(3):
                w5[a + s, b_ + t_] += wci[a, b_] @ wcxn[s, t_]
w5 = jnp.asarray(w5, jnp.bfloat16)
f = chain_op(lambda x: conv2d(x, w5, padding=2), feats)
t("D 5x5 256->128 fold", lambda: f(feats), flops=2 * R * R * C * 4 * N * 25)

# sanity: is a PLAIN 3x3 256->256 @768 still 133TF in this setup?
w_ref = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
f = chain_op(lambda x: conv2d(x, w_ref, padding=1), feats)
t("ref conv3x3 256->256 chained", lambda: f(feats), flops=2 * R * R * C * C * 9)

log("DONE")
OUT.close()
