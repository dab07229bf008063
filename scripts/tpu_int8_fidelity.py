"""Numerical deviation of the int8 weight-only mode at full config.

Completes the quantize.py story: bf16 deviation vs fp32 is measured
(scripts/tpu_bf16_dev.out); this measures int8-weight (bf16 compute)
vs plain bf16 and vs fp32 on the real chip, random weights.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ml_depth_pro_video_tpu.ckpt.quantize import quantize_vit_weights
from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG, fold_head_params, infer_fn, init_depth_pro,
)

OUT = open("/root/repo/scripts/tpu_int8_fidelity.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


cfg = DEFAULT_MONODEPTH_CONFIG
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (1, cfg.img_size, cfg.img_size, 3)) * 2 - 1

outs = {}
for name, p, prec in (
    ("fp32", params, Precision.fp32()),
    ("bf16", params, Precision.bf16()),
    ("int8w", quantize_vit_weights(params), Precision.bf16()),
):
    pf = jax.tree.map(jnp.asarray, fold_head_params(p))
    fn = jax.jit(lambda pp, xx, prec=prec: infer_fn(pp, xx, None, cfg, prec)["depth"])
    d = np.asarray(fn(pf, x))
    outs[name] = d
    log(f"{name}: depth range [{d.min():.4f}, {d.max():.4f}]")

scale = np.abs(outs["fp32"]).max()
for name in ("bf16", "int8w"):
    dev = np.abs(outs[name] - outs["fp32"]) / scale
    log(f"{name} vs fp32: median {np.median(dev)*100:.4f}%  p99 {np.quantile(dev, 0.99)*100:.4f}%  max {dev.max()*100:.4f}% of scale")
dev = np.abs(outs["int8w"] - outs["bf16"]) / scale
log(f"int8w vs bf16: median {np.median(dev)*100:.4f}%  max {dev.max()*100:.4f}% of scale")
log("DONE")
