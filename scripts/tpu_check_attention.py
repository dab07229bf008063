"""On-TPU correctness + perf check of the packed flash kernel."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ml_depth_pro_video_tpu.ops.attention import (
    attention_packed,
    flash_attention_packed,
    xla_attention_packed,
)

OUT = open("/root/repo/scripts/tpu_check_attention.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.standard_normal((35, 577, 3 * 1024)).astype(np.float32)).astype(jnp.bfloat16)
ref = np.asarray(jax.jit(lambda x: xla_attention_packed(x, 16))(qkv), dtype=np.float32)
got = np.asarray(flash_attention_packed(qkv, 16), dtype=np.float32)
err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
log(f"packed flash vs xla max rel err: {err:.5f}")
assert err < 2e-2, err

AF = 2 * 2 * 35 * 16 * 577 * 577 * 64


def t(name, f, flops, iters=8):
    r = f()
    float(jnp.sum(r).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms {flops/dt/1e12:.1f} TFLOPs")


@jax.jit
def chain_packed(x):
    y = x
    for _ in range(8):
        o = flash_attention_packed(y, 16)
        y = jnp.concatenate([o, o, o], axis=-1)
    return y


t("8 chained packed flash (incl concat)", lambda: chain_packed(qkv), 8 * AF)

# full ViT with packed attention
from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models import vit as V

cfg = V.ViTConfig()
p = V.init_vit(jax.random.PRNGKey(0), cfg)
x35 = jnp.ones((35, 384, 384, 3), jnp.bfloat16)
pv = jax.jit(lambda p, t_: V.vit_apply(p, t_, cfg, Precision.bf16(), capture_blocks=(5, 11))[0])
t("patch ViT 35p packed-flash", lambda: pv(p, x35), 12.4e12)
log("done")
