"""Round-2 final stage profile (after accumulate-dtype + head fusion)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_r2_stages.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def t(name, f, iters=4, flops=None):
    r = f()
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops/dt/1e12:.1f} TF" if flops else ""
    log(f"{name}: {dt*1000:.2f} ms{extra}")
    return dt


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models import vit as V  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, decoder_apply, encoder_apply, fold_head_params,
    head_apply, infer_fn, init_depth_pro,
)

cfg = DEFAULT_MONODEPTH_CONFIG
prec = Precision.bf16()
params = fold_head_params(init_depth_pro(jax.random.PRNGKey(0), cfg))

B = 1
x = jnp.ones((B, 1536, 1536, 3), jnp.bfloat16)

fe = jax.jit(lambda p, x: encoder_apply(p["encoder"], x, cfg, prec))
encs = fe(params, x)
t("encoder (incl. patch ViT + upsamples)", lambda: fe(params, x)[0])

fd = jax.jit(lambda p, *e: decoder_apply(p["decoder"], list(e))[0])
feats = fd(params, *encs)
t("decoder", lambda: fd(params, *encs))

fh = jax.jit(lambda p, f: head_apply(p["head"], f, prec))
t("head (fused)", lambda: fh(params, feats))

# one ViT block in isolation (35-patch batch), chained x8
vp = params["encoder"]["patch_vit"]
tokens = jnp.ones((35, 577, 1024), jnp.bfloat16)
blk = {k: v[0] for k, v in vp["blocks"].items()}


def block_chain(tok):
    for _ in range(8):
        tok = V._block(tok, blk, cfg.vit, None)
    return tok


tokens = tokens.astype(prec.compute_dtype)
fb = jax.jit(block_chain)
r = fb(tokens); float(jnp.sum(r).astype(jnp.float32))
t0 = time.perf_counter()
for _ in range(4):
    r = fb(tokens)
float(jnp.sum(r).astype(jnp.float32))
log(f"ViT block chained: {(time.perf_counter()-t0)/4/8*1000:.2f} ms/block")

fi = jax.jit(lambda p, x: infer_fn(p, x, None, cfg, prec)["depth"])
for B in (1, 8):
    xb = jnp.ones((B, 1536, 1536, 3), jnp.bfloat16)
    d = t(f"full infer b{B}", lambda: fi(params, xb), iters=3)
    log(f"  -> {B/d:.2f} fps")

log("DONE")
OUT.close()
