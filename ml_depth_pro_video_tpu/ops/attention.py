"""Fused multi-head self-attention.

The reference's hot loop is 24 ViT-L blocks over 577-token sequences,
batched over the 35 pyramid patches (3 ViT passes per frame,
`/root/reference/src/depth_pro/network/encoder.py:266`, `:308`,
`fov.py:77`). Torch/timm materializes (B*H, S, S) score tensors; here the
whole attention row for a query block stays in VMEM via a Pallas kernel,
so scores never round-trip through HBM. Sequence length 577 is padded to
a lane multiple and the pad keys are masked with -inf.

The XLA einsum path is kept as the fallback (CPU tests, interpret mode)
and as the numerical reference for the kernel's unit tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference attention. q,k,v: (B, H, S, D); returns (B, H, S, D)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    # Mask padded keys.
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(kidx < seq_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q",))
def _flash_attention(q, k, v, block_q: int = 256):
    """Pallas fused attention. q,k,v: (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = d**-0.5
    s_pad = _round_up(s, 128)
    bq = min(block_q, s_pad)
    s_padq = _round_up(s_pad, bq)

    def pad(x, to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, to - s), (0, 0)))

    qp = pad(q, s_padq).reshape(b * h, s_padq, d)
    kp = pad(k, s_pad).reshape(b * h, s_pad, d)
    vp = pad(v, s_pad).reshape(b * h, s_pad, d)

    grid = (b * h, s_padq // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, seq_len=s, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_padq, d), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, s_padq, d)[:, :, :s, :]


def _default_impl() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" and pltpu is not None else "xla"


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str | None = None,
) -> jnp.ndarray:
    """Self-attention over (B, H, S, D) tensors with 1/sqrt(D) scaling."""
    impl = impl or _default_impl()
    if impl == "pallas":
        return _flash_attention(q, k, v)
    return _xla_attention(q, k, v)
