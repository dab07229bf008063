"""TPU micro-profiling: find where the 67% of non-MXU time goes in the ViT."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models import vit as V

OUT = open("/root/repo/scripts/tpu_profile1.out", "w")


def log(msg):
    print(msg)
    OUT.write(msg + "\n")
    OUT.flush()


def t(name, f, flops=None, iters=8):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops/dt/1e12:.1f} TFLOPs" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


# 1. raw matmul peaks
M, K, N = 20224, 1024, 3072
a = jnp.ones((M, K), jnp.bfloat16)
b = jnp.ones((K, N), jnp.bfloat16)
mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16))
t("mm 20224x1024x3072 bf16", lambda: mm(a, b), 2 * M * K * N)
b2 = jnp.ones((1024, 4096), jnp.bfloat16)
t("mm 20224x1024x4096 bf16", lambda: mm(a, b2), 2 * M * 1024 * 4096)
w32 = jnp.ones((K, N), jnp.float32)
mmc = jax.jit(lambda a, w: jnp.dot(a, w.astype(jnp.bfloat16), preferred_element_type=jnp.bfloat16))
t("mm w/ fp32->bf16 weight cast", lambda: mmc(a, w32), 2 * M * K * N)

# 2. one ViT block: full, no-attention, pallas vs xla attention
cfg = V.ViTConfig()
prec = Precision.bf16()
p = V.init_vit(jax.random.PRNGKey(0), cfg)
bp = jax.tree.map(lambda x: x[0], p["blocks"])
bp16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), bp)
x = jnp.ones((35, 577, 1024), jnp.bfloat16)
BLOCK_FLOPS = 35 * (577 * 1024 * 3072 * 2 + 577 * 1024 * 1024 * 2 + 2 * 577 * 1024 * 4096 * 2)
ATTN_FLOPS = 2 * 2 * 35 * 16 * 577 * 577 * 64

blk_pallas = jax.jit(lambda x, bp: V._block(x, bp, cfg, "pallas"))
blk_xla = jax.jit(lambda x, bp: V._block(x, bp, cfg, "xla"))
t("block pallas attn", lambda: blk_pallas(x, bp), BLOCK_FLOPS + ATTN_FLOPS)
t("block xla attn", lambda: blk_xla(x, bp), BLOCK_FLOPS + ATTN_FLOPS)
t("block pallas bf16 params", lambda: blk_pallas(x, bp16), BLOCK_FLOPS + ATTN_FLOPS)

# block without attention (identity attn) to isolate matmul+LN+gelu time
import ml_depth_pro_video_tpu.ops.attention as A

orig = A.multi_head_attention
A.multi_head_attention = lambda q, k, v, impl=None: v
V.multi_head_attention = A.multi_head_attention
blk_noattn = jax.jit(lambda x, bp: V._block(x, bp, cfg, None))
t("block no-attention", lambda: blk_noattn(x, bp), BLOCK_FLOPS)
A.multi_head_attention = orig
V.multi_head_attention = orig

# 3. attention alone
from ml_depth_pro_video_tpu.ops.attention import _flash_attention, _xla_attention

q = jnp.ones((35, 16, 577, 64), jnp.bfloat16)
att_x = jax.jit(_xla_attention)
t("attention xla", lambda: att_x(q, q, q), ATTN_FLOPS)
t("attention pallas", lambda: _flash_attention(q, q, q), ATTN_FLOPS)

# 4. scan vs unrolled: 4 blocks
p4 = jax.tree.map(lambda x: x[:4], p["blocks"])


def scan4(x, blocks):
    return V._scan_blocks(x, blocks, 0, 4, cfg, "xla")


def unroll4(x, blocks):
    for i in range(4):
        x = V._block(x, jax.tree.map(lambda a: a[i], blocks), cfg, "xla")
    return x


t("4 blocks scan", lambda: jax.jit(scan4)(x, p4), 4 * (BLOCK_FLOPS + ATTN_FLOPS))
t("4 blocks unrolled", lambda: jax.jit(unroll4)(x, p4), 4 * (BLOCK_FLOPS + ATTN_FLOPS))

log("done")
