"""Component-wise training-grad probes at full scale (the monolithic
1536^2 step crashes the tunnel's remote compile helper; isolate which
pieces compile and run)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_train_probe2.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models import vit as V  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, decoder_apply, init_depth_pro,
)

cfg = DEFAULT_MONODEPTH_CONFIG
prec = Precision.bf16()
params = init_depth_pro(jax.random.PRNGKey(0), cfg)

# 1. ViT backward at the full 35-patch batch, remat scan
vp = params["encoder"]["patch_vit"]
x = jnp.ones((35, 384, 384, 3), jnp.bfloat16)


def vit_loss(vparams, x):
    tokens, (h0, h1) = V.vit_apply(vparams, x, cfg.vit, prec,
                                   capture_blocks=cfg.hook_block_ids, remat=True)
    return (jnp.mean(tokens.astype(jnp.float32) ** 2)
            + jnp.mean(h0.astype(jnp.float32) ** 2))


try:
    g = jax.jit(jax.grad(vit_loss))
    gv = g(vp, x)
    float(jnp.sum(gv["cls_token"]).astype(jnp.float32))
    t0 = time.perf_counter()
    gv = g(vp, x)
    float(jnp.sum(gv["cls_token"]).astype(jnp.float32))
    log(f"ViT-L grad (35x384^2, 24 blocks, remat): OK {(time.perf_counter()-t0)*1000:.0f} ms")
except Exception as e:  # noqa: BLE001
    log(f"ViT grad FAILED: {type(e).__name__}: {str(e)[:250]}")

# 2. decoder backward at full feature scales
encs = [
    jnp.ones((1, 768, 768, 256), jnp.bfloat16),
    jnp.ones((1, 384, 384, 256), jnp.bfloat16),
    jnp.ones((1, 192, 192, 512), jnp.bfloat16),
    jnp.ones((1, 96, 96, 1024), jnp.bfloat16),
    jnp.ones((1, 48, 48, 1024), jnp.bfloat16),
]


def dec_loss(dparams, encs):
    f, _ = decoder_apply(dparams, list(encs))
    return jnp.mean(f.astype(jnp.float32) ** 2)


try:
    gd = jax.jit(jax.grad(dec_loss))
    gg = gd(params["decoder"], encs)
    leaf = jax.tree_util.tree_leaves(gg)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    t0 = time.perf_counter()
    gg = gd(params["decoder"], encs)
    float(jnp.sum(jax.tree_util.tree_leaves(gg)[0]).astype(jnp.float32))
    log(f"decoder grad (full scales): OK {(time.perf_counter()-t0)*1000:.0f} ms")
except Exception as e:  # noqa: BLE001
    log(f"decoder grad FAILED: {type(e).__name__}: {str(e)[:250]}")

log("DONE")
OUT.close()
