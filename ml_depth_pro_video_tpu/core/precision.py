"""Mixed-precision policy for the TPU compute path.

The reference runs torch fp32 (or fp16 via ``precision=torch.half``,
``/root/reference/src/depth_pro/depth_pro.py:122-123``). On TPU the fast
path is bfloat16 matmuls ACCUMULATING IN BF16 — the v5e runs
fp32-accumulation matmuls at half the MXU rate (measured,
scripts/tpu_conv_acc.out; this was the single biggest perf lever) and
the measured bf16-mode deviation stays at ~0.04% median of scale; the
depth
head, FOV trigonometry and all resize matrices stay fp32 so the
``1/clamp(inverse_depth)`` output keeps <=1e-3 relative error.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy: params are stored in ``param_dtype``; the ViT and
    convolutional trunk compute in ``compute_dtype``; outputs/head math is
    always fp32."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def fp32() -> "Precision":
        return Precision(jnp.float32, jnp.float32)

    @staticmethod
    def bf16() -> "Precision":
        return Precision(jnp.float32, jnp.bfloat16)

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_out(self, x):
        return x.astype(jnp.float32)


def resolve_precision(precision) -> Precision:
    if isinstance(precision, Precision):
        return precision
    if precision in (None, "fp32", "float32"):
        return Precision.fp32()
    if precision in ("bf16", "bfloat16", "half"):
        return Precision.bf16()
    raise ValueError(f"Unknown precision {precision!r}")
