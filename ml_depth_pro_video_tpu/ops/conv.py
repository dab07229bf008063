"""Convolution ops, NHWC/HWIO layout (TPU-preferred).

The reference uses torch ``nn.Conv2d`` (NCHW/OIHW) and
``nn.ConvTranspose2d(kernel_size=2, stride=2)`` at nine sites
(`/root/reference/src/depth_pro/network/encoder.py:81-122`,
`decoder.py:146-153`, `depth_pro.py:186-193`). We keep everything
channels-last so channels ride the TPU lane dimension, and implement the
2x2-stride-2 transposed convolution as a single matmul followed by a
depth-to-space reshape — exactly equivalent to torch's scatter-add
semantics for this kernel/stride combination, but MXU-shaped.
Checkpoint conversion transposes torch weights into these layouts
(see ``ckpt/convert.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int | tuple[int, int] = 1,
    padding: int | tuple[int, int] = 0,
) -> jnp.ndarray:
    """2-D convolution, x: (B,H,W,Cin), w: (kh,kw,Cin,Cout)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    # fp32 accumulation regardless of the compute dtype
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2x2(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Transposed conv with kernel 2, stride 2, padding 0.

    x: (B,H,W,Cin); w: (Cin, 2*2*Cout) flattened in (kh, kw, cout) order.
    Output: (B,2H,2W,Cout). Each input pixel independently produces its
    2x2 output block, so the op is one matmul + depth_to_space.
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[1] // 4
    y = jnp.dot(x.reshape(-1, cin), w.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(bsz, h, wd, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * wd, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dense layer, w: (Cin, Cout)."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
