"""Attention kernel internals: dots-only vs softmax-only vs full."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/root/repo/scripts/tpu_attn_breakdown.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


B, S, D, H = 35, 577, 1024, 16
HD = D // H
S_PAD, Q_ROWS = 640, 584
qkv = (jax.random.normal(jax.random.PRNGKey(1), (B, S_PAD, 3 * D)) * 0.5).astype(jnp.bfloat16)


def make_kernel(mode):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = HD ** -0.5
        kidx = jax.lax.broadcasted_iota(jnp.int32, (Q_ROWS, S_PAD), 1)
        mask = kidx < S
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            q = q_ref[0, :Q_ROWS, sl]
            k = k_ref[0, :, sl]
            v = v_ref[0, :, sl]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if mode == "dots":
                out = jnp.dot(s.astype(v.dtype)[:, :S_PAD], v,
                              preferred_element_type=jnp.float32)
            else:
                if mode == "bias":
                    s = s * scale + jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (1, S_PAD), 1) < S,
                        0.0, -jnp.inf)
                elif mode == "nomask":
                    s = s * scale
                else:  # full
                    s = jnp.where(mask, s * scale, -jnp.inf)
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            o_ref[0, :Q_ROWS, sl] = out.astype(o_ref.dtype)
    return kernel


def build(mode):
    def spec(which):
        return pl.BlockSpec((1, S_PAD, D), lambda i: (i, 0, which),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        out = None
        for _ in range(8):
            out = pl.pallas_call(
                make_kernel(mode), grid=(B,),
                in_specs=[spec(0), spec(1), spec(2)],
                out_specs=pl.BlockSpec((1, S_PAD, D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, S_PAD, D), x.dtype),
            )(x, x, x)
            x = x.at[:, :, :D].set(out * 1e-30 + x[:, :, :D])
        return out
    return run


for mode in ("full", "nomask", "bias", "dots"):
    try:
        f = build(mode)
        r = f(qkv); float(jnp.sum(r).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(4):
            r = f(qkv)
        float(jnp.sum(r).astype(jnp.float32))
        log(f"{mode}: {(time.perf_counter()-t0)/4/8*1000:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"{mode} FAILED: {type(e).__name__}: {str(e)[:200]}")

log("DONE")
OUT.close()
