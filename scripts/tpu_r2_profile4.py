"""Head variants, chained x4 inside one jit to amortize dispatch."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_profile4.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


CHAIN = 4


def t(name, f, iters=4):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters / CHAIN
    log(f"{name}: {dt*1000:.2f} ms (per head pass)")
    return dt


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import head_apply  # noqa: E402
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

hp = {"conv_in": {"w": w_in, "b": b_in},
      "deconv": {"w": wd, "b": bd},
      "conv_mid": {"w": wc, "b": bc},
      "conv_out": {"w": wo.reshape(1, 1, N, 1), "b": jnp.zeros((1,), jnp.float32)}}


def chained(head_fn):
    def run(x):
        out = None
        for _ in range(CHAIN):
            out = head_fn(x)
            x = x + (jnp.mean(out) * 1e-30).astype(x.dtype)
        return out
    return jax.jit(run)


fA = chained(lambda x: head_apply(hp, x, Precision.bf16()))
t("A current head_apply", lambda: fA(feats))

# B: split constant-bias conv + block-diagonal fp32 epilogue
wcomp = fold_deconv2x2_conv3x3(wd, bd, wc)
wcomp_x = wcomp[:, :, :M]
wcomp_1 = wcomp[:, :, M:]
wbig = jnp.zeros((4 * N, 4), jnp.float32)
for g in range(4):
    wbig = wbig.at[g * N:(g + 1) * N, g].set(wo[:, 0])


def head_B(x):
    x = conv2d(x, w_in, b_in, padding=1)
    h = conv2d(x, wcomp_x.astype(x.dtype), padding=1)
    ones = jnp.ones((1, R, R, 1), x.dtype)
    h = h + conv2d(ones, wcomp_1.astype(x.dtype), padding=1)
    h = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype))
    y = jnp.dot(h.reshape(B, R, R, 4 * N).astype(jnp.float32), wbig)
    y = depth_to_space2x2(y)
    return jax.nn.relu(y)


fB = chained(head_B)
t("B split-bias + blockdiag epilogue", lambda: fB(feats))


# C: B but dot stays bf16 w/ fp32 accumulate (no big fp32 cast)
def head_C(x):
    x = conv2d(x, w_in, b_in, padding=1)
    h = conv2d(x, wcomp_x.astype(x.dtype), padding=1)
    ones = jnp.ones((1, R, R, 1), x.dtype)
    h = h + conv2d(ones, wcomp_1.astype(x.dtype), padding=1)
    h = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype))
    y = jnp.dot(h.reshape(B, R, R, 4 * N), wbig.astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = depth_to_space2x2(y)
    return jax.nn.relu(y)


fC = chained(head_C)
t("C blockdiag epilogue bf16-in fp32-acc", lambda: fC(feats))

# D: full 5x5 all-linear fold (conv_in o deconv o conv_mid), one conv
# W5[u, v, cin, cout] = sum_{s} Wci[a, b, cin, m] * Wcx[s, t, m, cout]
wci = w_in.astype(jnp.float32)
w5 = jnp.einsum("abim,stmo->asbtio",
                wci, wcomp_x.astype(jnp.float32)).reshape(5, 5, C, 4 * N)
# conv_in bias feeds every tap of wcomp_x + ones channel handles deconv bias
b_in_term = jnp.einsum("m,stmo->o", b_in.astype(jnp.float32),
                       wcomp_x.astype(jnp.float32).sum(axis=(0, 1)).reshape(1, 1, M, 4 * N)[0, 0])


def head_D(x):
    h = conv2d(x, w5.astype(x.dtype), padding=2)
    ones = jnp.ones((1, R, R, 1), x.dtype)
    h = h + conv2d(ones, wcomp_1.astype(x.dtype), padding=1)
    # NOTE: border-inexact for b_in (constant interior term) — perf probe only
    h = h + b_in_term.astype(h.dtype)
    h = jax.nn.relu(h + jnp.tile(bc, 4).astype(h.dtype))
    y = jnp.dot(h.reshape(B, R, R, 4 * N), wbig.astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = depth_to_space2x2(y)
    return jax.nn.relu(y)


fD = chained(head_D)
t("D full 5x5 fold", lambda: fD(feats))

log("DONE")
OUT.close()
