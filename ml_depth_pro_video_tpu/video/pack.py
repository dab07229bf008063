"""Device-side packed depth fetch (log-domain uint16).

The streaming runner's only steady-state device→host traffic is the
depth map itself: fp32 at 1536² is 9.4 MB/frame, which dominates the
host side of the loop whenever the link is the bottleneck (measured
80.6% host stall on this environment's tunnel —
`scripts/feed_sustained.out`; on real TPU-VM hosts the same bytes still
cost PCIe bandwidth and host-copy time). The reference never faces
this: its torch pipeline materializes depth on the model's own device
and pays a `.cpu()` copy per frame (`/root/reference/
pointcloud_cleaner.py:93`, `generate_depth_maps.py:118-126`).

Packing quantizes on-chip to uint16 in LOG depth, halving the fetch:

- uniform-in-log steps give a constant RELATIVE depth error of
  ``(log(dmax) − log(dmin)) / 2·65535`` per frame. Even across the
  model's full output clamp (1e-4 … 1e4 m — `models/depth_pro.py`
  mirroring `/root/reference/src/depth_pro/depth_pro.py:293`) that is
  ≤ 1.5e-4 quantization error, and ≤ 4e-5 for a typical indoor range.
  On top of that sits the backend's fp32 ``log`` accuracy (measured
  ~6.5e-5 absolute-in-log on the TPU, exact-to-numpy on CPU), so the
  end-to-end worst case is ≤ ~2.5e-4 — still an order below the bf16
  compute path's own deviation (~4e-3, `docs/PERFORMANCE.md`), so
  packing is lossless relative to model noise;
- linear-in-depth or linear-in-inverse-depth u16 would instead put
  15–30% relative error on the near or far end of a wide-range scene.

The pack runs as one fused elementwise pass + a per-frame min/max
reduction on the un-fetched device array (composing with the on-device
temporal smoother, `video/temporal.py`), and the host unpack is a
single vectorized multiply-add + ``np.exp``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# depth values are clipped here before the log; the model's own output
# clamp (1e-4..1e4) is strictly inside, so nothing real is touched
_CLIP = (1e-6, 1e6)
_U16_MAX = 65535.0


@jax.jit
def pack_depth_u16(depth: jnp.ndarray):
    """Quantize (B, H, W) metric depth to log-domain uint16 ON DEVICE.

    Returns ``(packed u16 (B,H,W), log_min (B,), log_scale (B,))`` with
    ``depth ≈ exp(packed · log_scale + log_min)``. A constant map packs
    to zeros with ``log_scale = 0`` and unpacks exactly.
    """
    log_d = jnp.log(jnp.clip(depth.astype(jnp.float32), *_CLIP))
    lmin = jnp.min(log_d, axis=(1, 2))
    lmax = jnp.max(log_d, axis=(1, 2))
    scale = (lmax - lmin) / _U16_MAX
    # constant map: numerator is identically 0, any safe divisor works
    inv = 1.0 / jnp.where(scale > 0.0, scale, 1.0)
    u = jnp.round((log_d - lmin[:, None, None]) * inv[:, None, None])
    return u.astype(jnp.uint16), lmin, scale


def unpack_depth_u16(packed: np.ndarray, log_min: np.ndarray,
                     log_scale: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`pack_depth_u16`.

    ``packed``: (..., H, W) uint16; ``log_min``/``log_scale``: matching
    leading shape (or scalars). Returns fp32 metric depth.
    """
    packed = np.asarray(packed)
    lmin = np.asarray(log_min, np.float32)
    lscale = np.asarray(log_scale, np.float32)
    if packed.dtype != np.uint16:
        raise TypeError(f"packed must be uint16, got {packed.dtype}")
    # u16 has only 65536 possible values but a 1536² frame has 2.36M
    # pixels, so exp() through a per-frame lookup table is ~36x fewer
    # transcendentals than the elementwise form — that difference is
    # the whole packing win on a 1-core host (~200 ms/batch-of-8
    # measured). lut[u] evaluates exp(float32(u)·lscale + lmin) on
    # exactly the fp32 inputs the elementwise form would use, so the
    # result is bit-identical.
    codes = np.arange(_U16_MAX + 1, dtype=np.float32)
    flat_p = packed.reshape(-1, *packed.shape[-2:]) if packed.ndim >= 2 \
        else packed[None]
    n = flat_p.shape[0]
    if lmin.size not in (1, n) or lscale.size not in (1, n):
        raise ValueError(f"log_min/log_scale shapes {log_min.shape}/"
                         f"{log_scale.shape} do not broadcast over "
                         f"{n} frames of shape {packed.shape}")
    out = np.empty(flat_p.shape, np.float32)
    for i in range(n):
        lut = np.exp(codes * lscale.reshape(-1)[i % lscale.size]
                     + lmin.reshape(-1)[i % lmin.size])
        out[i] = lut[flat_p[i]]
    return out.reshape(packed.shape)


@functools.cache
def max_rel_error(log_range: float = float(np.log(1e4 / 1e-4))) -> float:
    """Worst-case relative QUANTIZATION error of the u16 log packing
    for a frame whose log-depth spread is ``log_range`` (default: the
    model's full output clamp 1e-4..1e4 m — the bound quoted in the
    module docstring; the wider ``_CLIP`` is a safety margin depth
    never reaches). Excludes backend fp32 log accuracy (~6.5e-5
    absolute-in-log on TPU)."""
    return float(np.expm1(log_range / (2.0 * _U16_MAX)))
