"""Torch-semantics image resize as separable dense matmuls.

The reference's numerical contract depends on ``F.interpolate`` with
``align_corners=False`` at five sites (pyramid creation
``/root/reference/src/depth_pro/network/encoder.py:159-166``, the
infer() down/up-sample ``depth_pro.py:274-291``, the FOV input
downsample ``fov.py:70-76``) plus bicubic (anti-aliased) resampling in
timm's ``resample_abs_pos_embed`` and the patch-embed kernel resample
(``vit.py:51-123``), which we need offline at checkpoint-conversion
time.

Instead of translating torch's gather loops we precompute, at trace
time, the exact 1-D interpolation weight matrix for (in_size, out_size,
mode, antialias) and apply the resize as two dense matmuls — separable
filtering rides the MXU and XLA fuses the surrounding elementwise work.
All resize sites in this framework have static shapes, so the matrices
are compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_filter(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), a=-0.75 — torch/OpenCV convention."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _linear_filter(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


_FILTERS = {
    "bilinear": (_linear_filter, 1.0),
    "linear": (_linear_filter, 1.0),
    "bicubic": (_cubic_filter, 2.0),
    "cubic": (_cubic_filter, 2.0),
}


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    antialias: bool = False,
) -> np.ndarray:
    """Dense (out_size, in_size) row-stochastic interpolation matrix that
    reproduces ``torch.nn.functional.interpolate(align_corners=False)``
    (and, with ``antialias=True``, torch/PIL anti-aliased resampling)
    exactly in fp64, returned as fp32.
    """
    if mode not in _FILTERS:
        raise ValueError(f"Unsupported resize mode {mode!r}; expected one of {sorted(_FILTERS)}")
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    filt, radius = _FILTERS[mode]
    if antialias and mode in ("bicubic", "cubic"):
        # torch's anti-aliased bicubic follows PIL's kernel (a=-0.5),
        # while the non-anti-aliased path uses a=-0.75.
        filt = functools.partial(_cubic_filter, a=-0.5)
    scale = in_size / out_size
    # Anti-aliasing only applies when downscaling.
    support_scale = max(scale, 1.0) if antialias else 1.0
    support = radius * support_scale

    out_idx = np.arange(out_size, dtype=np.float64)
    center = (out_idx + 0.5) * scale - 0.5

    lo = np.floor(center - support + 1.0).astype(np.int64)
    # Number of taps is constant across rows for fixed scale.
    ntaps = int(np.ceil(2.0 * support)) + 1
    taps = lo[:, None] + np.arange(ntaps)[None, :]
    dist = (taps - center[:, None]) / support_scale
    w = filt(dist) / support_scale
    if antialias:
        # torch/PIL anti-aliased resampling truncates the kernel at the
        # image border and renormalizes over the surviving taps.
        w = np.where((taps >= 0) & (taps < in_size), w, 0.0)
    # Normalize. In non-antialias mode the linear/cubic kernels are exact
    # partitions of unity so this is a no-op; in antialias mode it matches
    # torch's border renormalization.
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum > 0, w / wsum, w)
    # Border replication for non-antialias mode: fold out-of-range tap
    # weights onto clamped indices (equivalent to torch's index clamping).
    taps_cl = np.clip(taps, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(out_idx.astype(np.int64), ntaps), taps_cl.ravel()), w.ravel())
    return mat.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    mode: str = "bilinear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NCHW-free) images to ``out_hw``.

    Accepts (..., H, W, C); resizes the two spatial dims with torch
    ``align_corners=False`` semantics.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # HIGHEST keeps these matmuls true fp32 on TPU (parity-critical, tiny).
    hi = jax.lax.Precision.HIGHEST
    if oh != h:
        mh = jnp.asarray(resize_matrix(h, oh, mode, antialias))
        xf = jnp.einsum("oh,...hwc->...owc", mh, xf, precision=hi)
    if ow != w:
        mw = jnp.asarray(resize_matrix(w, ow, mode, antialias))
        xf = jnp.einsum("ow,...hwc->...hoc", mw, xf, precision=hi)
    return xf.astype(dtype)
