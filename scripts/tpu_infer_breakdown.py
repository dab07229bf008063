"""Round-4 stage anatomy of the FULL infer at production batch.

Times (b8, bf16, real chip): infer_fn, forward, forward w/o FOV,
encoder_apply, decoder_apply, head_apply — the deltas locate every
ms/frame and show whether any exact-path slack remains beyond the
at-ceiling ViT + conv stages. Writes scripts/tpu_infer_breakdown.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_infer_breakdown.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def t(name, f, iters=4):
    r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt*1000:.2f} ms/batch = {dt*1000/8:.2f} ms/frame")
    return dt


log(f"devices: {jax.devices()}")

import dataclasses  # noqa: E402

from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG,
    decoder_apply,
    encoder_apply,
    fold_head_params,
    forward,
    head_apply,
    infer_fn,
    init_depth_pro,
)

cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
prec = Precision.bf16()
t0 = time.perf_counter()
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
params = fold_head_params(params)
params = jax.tree.map(
    lambda a: jnp.asarray(a) if a is not None else a, params,
    is_leaf=lambda a: a is None)
log(f"init {time.perf_counter() - t0:.0f}s")

B = 8
x = jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.float32)

f_infer = jax.jit(lambda p, x: infer_fn(p, x, None, cfg, prec)["depth"])
f_fwd = jax.jit(lambda p, x: forward(p, x, cfg, prec)[0])
f_nofov = jax.jit(lambda p, x: forward(p, x, cfg, prec, compute_fov=False)[0])
f_enc = jax.jit(lambda p, x: encoder_apply(p["encoder"], x.astype(prec.compute_dtype),
                                           cfg, prec))

d_infer = t("infer_fn (full contract)", lambda: f_infer(params, x))
d_fwd = t("forward (canonical+fov)", lambda: f_fwd(params, x))
d_nofov = t("forward w/o FOV", lambda: f_nofov(params, x))
encs = jax.block_until_ready(f_enc(params, x))
d_enc = t("encoder_apply", lambda: f_enc(params, x))

f_dec = jax.jit(decoder_apply)
d_dec = t("decoder_apply", lambda: f_dec(params["decoder"], encs))
feats = f_dec(params["decoder"], encs)[0]
f_head = jax.jit(lambda p, z: head_apply(p["head"], z, prec))
d_head = t("head_apply", lambda: f_head(params, feats))

log(f"deltas/frame: infer-extra {(d_infer-d_fwd)*125:.2f} ms, "
    f"fov {(d_fwd-d_nofov)*125:.2f} ms, "
    f"forward-minus-stages {(d_nofov-d_enc-d_dec-d_head)*125:.2f} ms")
log("DONE")
OUT.close()
