"""Attention kernel v3 experiment: per-head loop vs grouped batched dots."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/root/repo/scripts/tpu_attn_v3.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def kernel_grouped(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale, num_heads, group):
    """Heads processed in batched groups via one dot_general per group."""
    d = q_ref.shape[-1]
    hd = d // num_heads
    s_pad = q_ref.shape[1]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad, s_pad), 2)
    mask = kidx < seq_len
    for g0 in range(0, num_heads, group):
        sl = slice(g0 * hd, (g0 + group) * hd)
        q = q_ref[0, :, sl].reshape(s_pad, group, hd).transpose(1, 0, 2)
        k = k_ref[0, :, sl].reshape(s_pad, group, hd).transpose(1, 0, 2)
        v = v_ref[0, :, sl].reshape(s_pad, group, hd).transpose(1, 0, 2)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(mask, s * scale, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (group, s_pad, hd)
        o_ref[0, :, sl] = out.transpose(1, 0, 2).reshape(s_pad, group * hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "group"))
def flash_grouped(qkv, num_heads, group):
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    scale = hd**-0.5
    s_pad = _round_up(s, 128)
    x = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))

    def spec(which):
        return pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, which), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(kernel_grouped, seq_len=s, scale=scale,
                          num_heads=num_heads, group=group),
        grid=(b,),
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), qkv.dtype),
    )(x, x, x)[:, :s]


from ml_depth_pro_video_tpu.ops.attention import flash_attention_packed, xla_attention_packed

import numpy as np

rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((35, 577, 3072)).astype(np.float32)).astype(jnp.bfloat16)
ref = np.asarray(jax.jit(lambda x: xla_attention_packed(x, 16))(qkv), np.float32)
AF = 2 * 2 * 35 * 16 * 577 * 577 * 64


def t(name, f, iters=8):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms {AF/dt/1e12:.1f} TFLOPs")


for group in (2, 4, 8):
    try:
        got = np.asarray(flash_grouped(qkv, 16, group), np.float32)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        log(f"group={group} err={err:.4f}")
        assert err < 2e-2
        t(f"grouped flash g={group}", lambda g=group: flash_grouped(qkv, 16, g))
    except Exception as e:  # noqa: BLE001
        log(f"group={group} FAILED: {type(e).__name__}: {str(e)[:200]}")

t("current packed (loop)", lambda: flash_attention_packed(qkv, 16))


# chained to remove dispatch overhead
@functools.partial(jax.jit, static_argnames=("g",))
def chain_grouped(x, g):
    y = x
    for _ in range(8):
        o = flash_grouped(y, 16, g)
        y = jnp.concatenate([o, o, o], axis=-1)
    return y


for g in (4, 8):
    try:
        t(f"8x chained grouped g={g} (/8)", lambda g=g: chain_grouped(qkv, g), iters=4)
    except Exception as e:
        log(f"chain g={g} FAILED: {str(e)[:120]}")
log("done")
