"""Probe int8 matmul throughput vs bf16 on the v5e (394 vs 197 peak)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_int8_probe.out", "w")


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
    log(f"{name}: {dt*1000:.2f} ms {flops/dt/1e12:.1f} T(FL)OPs")


M, K, N = 20224, 1024, 3072
FL = 2 * M * K * N
a8 = jnp.ones((M, K), jnp.int8)
b8 = jnp.ones((K, N), jnp.int8)
a16 = jnp.ones((M, K), jnp.bfloat16)
b16 = jnp.ones((K, N), jnp.bfloat16)


@jax.jit
def chain_bf16(a, b, bT):
    x = a
    for _ in range(8):
        x = jnp.dot(jnp.dot(x, b, preferred_element_type=jnp.bfloat16), bT,
                    preferred_element_type=jnp.bfloat16)
    return x


@jax.jit
def chain_int8(a, b):
    # int8 x int8 -> int32 matmuls chained via requantization
    x = a
    for _ in range(8):
        y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = (y >> 12).astype(jnp.int8)[:, :K]  # fake requant, keep shapes
    return x


bT16 = jnp.ones((N, K), jnp.bfloat16)
t("8x2 chained bf16", lambda: chain_bf16(a16, b16, bT16), 16 * FL)
try:
    b8sq = jnp.ones((K, K), jnp.int8)
    t("8 chained int8 (KxK)", lambda: chain_int8(a8, b8sq), 8 * 2 * M * K * K)
except Exception as e:  # noqa: BLE001
    log(f"int8 chain FAILED: {str(e)[:200]}")

# mixed: int8 weights dequantized to bf16 on the fly (weight-only quant)
w8 = jnp.ones((K, N), jnp.int8)
scale = jnp.ones((N,), jnp.bfloat16)


@jax.jit
def weight_only(a, w8, scale):
    x = a
    for _ in range(8):
        w = w8.astype(jnp.bfloat16) * scale
        y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        x = y[:, :K]
    return x


t("8 chained weight-only-int8->bf16", lambda: weight_only(a16, w8, scale), 8 * FL)
log("done")
