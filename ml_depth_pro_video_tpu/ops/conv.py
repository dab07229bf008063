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

import numpy as np

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
    # accumulate in the compute dtype, like every matmul-form op:
    # measured perf-neutral for convs (124 TF either way,
    # scripts/tpu_conv_acc.out), parity mode computes fp32 end-to-end,
    # and a float32-preferred conv has a broken VJP on bf16 inputs
    # (mixed-dtype grads) which blocked bf16 training on TPU
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=x.dtype,
    )
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
    # accumulate in the compute dtype: on v5e an fp32-accumulate matmul
    # runs at HALF the MXU rate (66 vs 126 TF measured,
    # scripts/tpu_conv_acc.out); parity mode computes in fp32 anyway
    y = jnp.dot(x.reshape(-1, cin), w.astype(x.dtype),
                preferred_element_type=x.dtype)
    y = y.reshape(bsz, h, wd, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * wd, cout)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dense layer, w: (Cin, Cout). Accumulates in the compute dtype,
    matching the ViT matmuls: fp32-accumulate matmuls run at half the
    v5e MXU rate (scripts/tpu_conv_acc.out), and parity mode computes
    in fp32 end-to-end anyway. Convolutions also accumulate in the
    compute dtype (rate-neutral there, but a float32-preferred conv has
    a broken bf16 VJP)
    (free on the conv lowering)."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def fold_deconv2x2_conv3x3(
    wd: jnp.ndarray, bd: jnp.ndarray, wc: jnp.ndarray
) -> jnp.ndarray:
    """Fold a 2x2/s2 deconv followed by a 3x3/p1 conv into ONE 3x3 conv
    at the deconv's INPUT resolution over subpixel-packed channels.

    Both ops are linear, so their composition is a single convolution:
    output pixel (2p+a, 2q+b) of the 3x3 conv reads deconv rows
    2p+a-1..2p+a+1, each of which is produced by exactly one input row
    p+s with subpixel a' (2s+a' = a+dy). Running the composite at half
    resolution keeps the hot conv MXU-shaped (the direct 3x3 at full
    resolution with few output channels tiles poorly on TPU — measured
    34.8 ms -> ~5 ms for the Depth Pro head, scripts/tpu_r2_profile1).

    The deconv bias rides an appended ones-channel, which makes the
    composite exact INCLUDING image borders: zero-padding the ones
    channel at half resolution zeroes exactly the taps whose deconv
    rows fall outside the full-resolution image.

    wd: (C, 4*M) matmul-form deconv weight, packed (a, b, m);
    bd: (M,) deconv bias; wc: (3, 3, M, N) conv weight (HWIO).
    Returns (3, 3, C+1, 4*N) packed (a, b, n), such that

        conv2d(concat([x, ones], -1), folded, padding=1)

    followed by depth-to-space equals
    ``conv2d(conv_transpose2x2(x, wd, bd), wc, padding=1)`` minus the
    3x3 conv's own bias (add it separately, tiled over the 4 groups).
    """
    c, m4 = wd.shape
    m = m4 // 4
    n = wc.shape[-1]
    wd4 = wd.reshape(c, 2, 2, m)
    # ones-channel row: the deconv bias appears at every subpixel
    bias_row = jnp.broadcast_to(bd.reshape(1, 1, 1, m), (1, 2, 2, m))
    wd4 = jnp.concatenate([wd4, bias_row], axis=0)  # (C+1, 2, 2, M)

    # tap mapping as a constant 0/1 tensor: MAP[s, a, a', y] = 1 iff the
    # 3x3 conv tap dy = 2(s-1) + a' - a is in range and y = dy + 1 —
    # the whole fold is then ONE einsum (cheap enough to stay in-graph,
    # so training differentiates through it and inference pays ~nothing)
    tap = np.zeros((3, 2, 2, 3), wc.dtype if isinstance(wc, np.ndarray) else np.float32)
    for s in range(3):
        for a in range(2):
            for ap in range(2):
                dy = 2 * (s - 1) + ap - a
                if abs(dy) <= 1:
                    tap[s, a, ap, dy + 1] = 1.0
    tap = jnp.asarray(tap, wc.dtype)

    comp = jnp.einsum("cpqm,yxmn,sapy,tbqx->stcabn", wd4, wc, tap, tap)
    return comp.reshape(3, 3, c + 1, 4 * n)


def depth_to_space2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4*C) packed (a, b, c) -> (B, 2H, 2W, C)."""
    bsz, h, w, c4 = x.shape
    c = c4 // 4
    y = x.reshape(bsz, h, w, 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * w, c)
