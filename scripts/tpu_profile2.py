"""Round 2: new flash kernel variants + head dtype + chained matmuls."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_profile2.out", "w")


def log(msg):
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


# chained matmuls (amortize dispatch overhead) -> real matmul throughput
M, K, N = 20224, 1024, 3072
a = jnp.ones((M, K), jnp.bfloat16)
b = jnp.ones((K, N), jnp.bfloat16)
bT = jnp.ones((N, K), jnp.bfloat16)


@jax.jit
def chain(a, b, bT):
    x = a
    for _ in range(8):
        x = jnp.dot(jnp.dot(x, b, preferred_element_type=jnp.bfloat16), bT,
                    preferred_element_type=jnp.bfloat16)
    return x


t("16 chained matmuls", lambda: chain(a, b, bT), 16 * 2 * M * K * N)

# attention variants
from ml_depth_pro_video_tpu.ops.attention import _flash_attention, _xla_attention

q = jnp.ones((35, 16, 577, 64), jnp.bfloat16)
AF = 2 * 2 * 35 * 16 * 577 * 577 * 64
for hp in (1, 2, 4, 8):
    t(f"flash hp={hp}", lambda hp=hp: _flash_attention(q, q, q, heads_per_program=hp), AF)
t("xla attention", lambda: jax.jit(_xla_attention)(q, q, q), AF)


# chained attention x8 to remove dispatch overhead
@functools.partial(jax.jit, static_argnames=("hp",))
def chain_att(q, hp):
    x = q
    for _ in range(8):
        x = _flash_attention(x, x, x, heads_per_program=hp)
    return x


for hp in (2, 4):
    t(f"8 chained flash hp={hp}", lambda hp=hp: chain_att(q, hp), 8 * AF)


@jax.jit
def chain_att_xla(q):
    x = q
    for _ in range(8):
        x = _xla_attention(x, x, x)
    return x


t("8 chained xla attention", lambda: chain_att_xla(q), 8 * AF)

# full ViT with new kernel
from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models import vit as V

cfg = V.ViTConfig()
p = V.init_vit(jax.random.PRNGKey(0), cfg)
x35 = jnp.ones((35, 384, 384, 3), jnp.bfloat16)
pv = jax.jit(lambda p, t_: V.vit_apply(p, t_, cfg, Precision.bf16(), capture_blocks=(5, 11))[0])
t("patch ViT 35p (new flash)", lambda: pv(p, x35), 35 * 37 * 14.7e9 / 37)
pvx = jax.jit(lambda p, t_: V.vit_apply(p, t_, cfg, Precision.bf16(), capture_blocks=(5, 11), attn_impl="xla")[0])
t("patch ViT 35p (xla attn)", lambda: pvx(p, x35))
log("done")
