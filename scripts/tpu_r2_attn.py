"""Attention kernel v1 vs v2 vs XLA: correctness + chained timing."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_attn.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.ops.attention import (  # noqa: E402
    flash_attention_packed, xla_attention_packed,
)
flash_attention_packed_v2 = flash_attention_packed  # v2 removed (no win; see .out)

B, S, D, H = 35, 577, 1024, 16
key = jax.random.PRNGKey(1)
qkv = (jax.random.normal(key, (B, S, 3 * D), jnp.float32) * 0.5).astype(jnp.bfloat16)
FL = 4 * B * H * S * S * (D // H)

# correctness vs XLA reference
ref = np.asarray(jax.jit(lambda q: xla_attention_packed(q, H))(qkv), np.float32)
for name, fn in [("v1", flash_attention_packed), ("v2", flash_attention_packed_v2)]:
    try:
        got = np.asarray(fn(qkv, H), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        log(f"{name} max rel err vs xla: {err:.2e}")
    except Exception as e:  # noqa: BLE001
        log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


def t(name, f, chain=8, iters=4):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters / chain
    log(f"{name}: {dt*1000:.2f} ms ({FL/dt/1e12:.1f} TF)")
    return dt


def chained(fn, n=8):
    def run(x):
        out = None
        for _ in range(n):
            out = fn(x, H)
            x = x.at[:, :, :D].set(out * 1e-30 + x[:, :, :D])
        return out
    return jax.jit(run)


for name, fn in [("v1 chained", flash_attention_packed),
                 ("v2 chained", flash_attention_packed_v2),
                 ("xla chained", xla_attention_packed)]:
    try:
        f = chained(fn)
        t(name, lambda f=f: f(qkv))
    except Exception as e:  # noqa: BLE001
        log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")



# ---- v3 experiment: batched dot_general over heads, heads pre-split OUTSIDE ----
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _v3_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale):
    q = q_ref[0]  # (hp, S_pad, d)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (hp, S, S)
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(kidx < seq_len, s * scale, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "hp"))
def flash_v3(qkv, num_heads, hp=4):
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    s_pad = ((s + 127) // 128) * 128
    x = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))
    x = x.reshape(b, s_pad, 3, num_heads, hd)
    q = x[:, :, 0].transpose(0, 2, 1, 3)  # (B, H, S, d)
    k = x[:, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, 2].transpose(0, 2, 1, 3)
    spec = pl.BlockSpec((1, hp, s_pad, hd), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_v3_kernel, seq_len=s, scale=hd**-0.5),
        grid=(b, num_heads // hp),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s_pad, hd), qkv.dtype),
    )(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(b, s_pad, d)[:, :s]


for hp in (2, 4, 8):
    try:
        got = np.asarray(flash_v3(qkv, H, hp), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        log(f"v3 hp={hp} max rel err: {err:.2e}")
        f = chained(lambda x, HH, hp=hp: flash_v3(x, HH, hp))
        t(f"v3 hp={hp} chained", lambda f=f: f(qkv))
    except Exception as e:  # noqa: BLE001
        log(f"v3 hp={hp} FAILED: {type(e).__name__}: {str(e)[:200]}")

log("DONE2")
OUT.close()
