"""Where does ViT block time go IN-MODEL (scan over 24 blocks, b=35)?

Variants: full block (pallas attention), xla attention, attention
replaced by identity (pure matmul+LN+gelu cost). The difference
full - identity is the true in-model attention cost per frame;
standalone kernel probes (tpu_attn_breakdown) cannot see scheduling
overlap inside the scanned program.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.models.vit import ViTConfig, init_vit
from ml_depth_pro_video_tpu.ops.attention import attention_packed
from ml_depth_pro_video_tpu.ops.norm import layer_norm

OUT = open("/root/repo/scripts/tpu_block_anatomy.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


CFG = ViTConfig()
B, S, D = 35, 577, 1024
REPS = 8

params = init_vit(jax.random.PRNGKey(0), CFG)
blocks = jax.tree.map(lambda a: a.astype(jnp.float32), params["blocks"])
x0 = (jax.random.normal(jax.random.PRNGKey(1), (B, S, D)) * 0.02).astype(jnp.bfloat16)


def block(x, bp, attn: str):
    cdt = x.dtype
    h = layer_norm(x, bp["ln1_g"], bp["ln1_b"], CFG.layer_norm_eps)
    qkv = jnp.dot(h, bp["qkv_w"].astype(cdt), preferred_element_type=cdt) + bp["qkv_b"].astype(cdt)
    if attn == "identity":
        a = qkv[..., :D]
    else:
        a = attention_packed(qkv, CFG.num_heads, impl=attn)
    a = jnp.dot(a, bp["proj_w"].astype(cdt), preferred_element_type=cdt) + bp["proj_b"].astype(cdt)
    x = x + bp["ls1"].astype(cdt) * a
    h = layer_norm(x, bp["ln2_g"], bp["ln2_b"], CFG.layer_norm_eps)
    h = jnp.dot(h, bp["fc1_w"].astype(cdt), preferred_element_type=cdt) + bp["fc1_b"].astype(cdt)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, bp["fc2_w"].astype(cdt), preferred_element_type=cdt) + bp["fc2_b"].astype(cdt)
    return x + bp["ls2"].astype(cdt) * h


@functools.partial(jax.jit, static_argnames=("attn", "reps"))
def run(x, bp, attn: str, reps: int):
    def rep(carry, _):
        def body(c, p):
            return block(c, p, attn), None

        y, _ = jax.lax.scan(body, carry, bp)
        # keep magnitudes bounded across reps
        return (y * 0.5).astype(carry.dtype), None

    y, _ = jax.lax.scan(rep, x, None, length=reps)
    return y.mean()


for attn in ("pallas", "xla", "identity"):
    v = float(run(x0, blocks, attn, REPS))  # compile + warm (same static args)
    t0 = time.perf_counter()
    v = float(run(x0, blocks, attn, REPS))
    dt = time.perf_counter() - t0
    per_block = dt / (REPS * CFG.depth) * 1e3
    per_frame = dt / REPS * 1e3
    log(f"{attn:9s}: {per_frame:7.1f} ms / 24-block frame pass, {per_block:5.2f} ms/block  (val {v:.4f})")

log("DONE")
