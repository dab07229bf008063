"""fp32 Pallas packed attention on the real chip: compile at ViT-L dims
(head-grouped grid), verify vs XLA fp32, and time both paths.
Round-3 VERDICT item #5: parity mode and production share one kernel."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_fp32_attn.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.ops.attention import (
    _fp32_block_heads,
    attention_packed,
    flash_attention_packed,
    xla_attention_packed,
)

log(f"devices: {jax.devices()}")

B, S, NH, HD = 35, 577, 16, 64
D = NH * HD
rng = np.random.default_rng(0)
qkv32 = jnp.asarray(rng.standard_normal((B, S, 3 * D)).astype(np.float32) * 0.3)

bh = _fp32_block_heads(NH, HD, S)
log(f"fp32 block_heads chosen: {bh}")

# correctness: both on-chip fp32 paths vs a float64 HOST reference.
# (v5e fp32 XLA matmuls default to bf16 passes; Mosaic fp32 dots use
# multi-pass precision — so kernel-vs-XLA alone shows their combined
# rounding, not the kernel's own error.)
def ref64(qkv):
    x = np.asarray(qkv, np.float64).reshape(B, S, NH, 3, HD)
    q = x[:, :, :, 0].transpose(0, 2, 1, 3)
    k = x[:, :, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, :, 2].transpose(0, 2, 1, 3)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * HD**-0.5
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(B, S, NH * HD)


gold = ref64(qkv32)
scale = np.abs(gold).max()
xla = np.asarray(xla_attention_packed(qkv32, NH))
got = np.asarray(flash_attention_packed(qkv32, NH, block_heads=bh))
err_xla = np.abs(xla - gold).max() / scale
err_krn = np.abs(got - gold).max() / scale
log(f"fp32 XLA    vs float64: max rel err {err_xla:.3e}")
log(f"fp32 kernel vs float64: max rel err {err_krn:.3e}")
assert err_krn <= max(2 * err_xla, 1e-5), (err_krn, err_xla)

# routing: attention_packed(fp32, impl=pallas) must hit the kernel and match
routed = np.asarray(attention_packed(qkv32, NH, impl="pallas"))
log(f"routed fp32 == kernel: {np.array_equal(routed, got)}")


def timeit(f, *args, iters=20):
    o = f(*args)
    _ = float(jnp.asarray(o)[0, 0, 0])  # sync via scalar fetch
    t0 = time.perf_counter()
    for _i in range(iters):
        o = f(*args)
    _ = float(jnp.asarray(o)[0, 0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


jk = jax.jit(lambda x: flash_attention_packed(x, NH, block_heads=bh))
jx = jax.jit(lambda x: xla_attention_packed(x, NH))
log(f"fp32 kernel:  {timeit(jk, qkv32):.3f} ms / 35x577 call")
log(f"fp32 XLA:     {timeit(jx, qkv32):.3f} ms / 35x577 call")

# bf16 production path unchanged — sanity-time it for the record
qkv16 = qkv32.astype(jnp.bfloat16)
jb = jax.jit(lambda x: flash_attention_packed(x, NH))
log(f"bf16 kernel:  {timeit(jb, qkv16):.3f} ms / 35x577 call")

# head-grouped bf16 (same grid shape as fp32) for curiosity
jb4 = jax.jit(lambda x: flash_attention_packed(x, NH, block_heads=4))
log(f"bf16 kernel bh=4: {timeit(jb4, qkv16):.3f} ms / 35x577 call")

log("done")
