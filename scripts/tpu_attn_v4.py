"""Attention v4: batched dot_general over heads-per-program (no reshapes
in kernel) vs the per-head loop."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/root/repo/scripts/tpu_attn_v4.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def kernel_batched(q_ref, k_ref, v_ref, o_ref, *, seq_len, scale):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(kidx < seq_len, s * scale, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hp",))
def flash_batched(q, k, v, hp=4):
    # q,k,v: (BH, S, d)
    bh, s, d = q.shape
    scale = d**-0.5
    s_pad = _round_up(s, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    spec = pl.BlockSpec((hp, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(kernel_batched, seq_len=s, scale=scale),
        grid=(bh // hp,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
    )(pad(q), pad(k), pad(v))
    return out[:, :s]


rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((560, 577, 64)).astype(np.float32)).astype(jnp.bfloat16)
AF = 2 * 2 * 560 * 577 * 577 * 64

from ml_depth_pro_video_tpu.ops.attention import _xla_attention

ref = np.asarray(jax.jit(_xla_attention)(
    q.reshape(35, 16, 577, 64), q.reshape(35, 16, 577, 64), q.reshape(35, 16, 577, 64)
), np.float32).reshape(560, 577, 64)


def t(name, f, iters=8):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms {AF/dt/1e12:.1f} TFLOPs")


for hp in (2, 4, 8):
    try:
        got = np.asarray(flash_batched(q, q, q, hp=hp), np.float32)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        log(f"hp={hp} err={err:.4f}")
        t(f"batched-dot hp={hp}", lambda hp=hp: flash_batched(q, q, q, hp=hp))
    except Exception as e:  # noqa: BLE001
        log(f"hp={hp} FAILED: {type(e).__name__}: {str(e)[:150]}")


@functools.partial(jax.jit, static_argnames=("hp",))
def chain(q, hp):
    x = q
    for _ in range(8):
        x = flash_batched(x, x, x, hp=hp)
    return x


for hp in (4, 8):
    try:
        t(f"8 chained batched-dot hp={hp}", lambda hp=hp: chain(q, hp), iters=4)
    except Exception as e:
        log(f"chain hp={hp} FAILED: {str(e)[:120]}")
log("done")
