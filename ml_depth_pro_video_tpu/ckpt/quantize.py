"""Weight-only int8 quantization for the ViT matmul weights.

v5e probe results (`scripts/tpu_int8_probe.py`): int8xint8 matmuls lower
poorly through XLA here (~50 TOPs), but int8 weights dequantized to
bf16 inside the matmul run ~19% FASTER than bf16 weights (152 vs 128
TFLOPs) while halving weight HBM — the dequant fuses and the smaller
weight stream feeds the MXU better. So the quantized mode stores the
stacked ViT matmul weights as int8 with per-output-channel scales.

End-to-end at production batch the speedup vanishes (6.17 vs 6.16 fps
at batch 16; the 35*B-patch activations dominate the weight stream), so
this mode's value is the 4x smaller ViT weight footprint (int8 vs the
fp32 master copy) — e.g. to fit more resident models per chip — not
throughput.

Opt-in (``quantize_vit_weights``); measured on the chip at full config
(scripts/tpu_int8_fidelity.out), the quantization adds a median 0.0002%
of scale on top of the bf16 mode's own deviation — negligible relative
to bf16 rounding — but it is NOT the <=1e-3 fp32 parity mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_QUANT_KEYS = ("qkv_w", "proj_w", "fc1_w", "fc2_w")


def _quantize(w) -> dict:
    """(L, din, dout) fp32 -> {'q': int8, 's': fp32 (L, 1, dout)}."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.abs(w).max(axis=1, keepdims=True)  # per (layer, out-channel)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": jnp.asarray(q), "s": jnp.asarray(scale)}


def _map_vit_matmuls(params: dict, fn) -> dict:
    """Apply ``fn`` to every ViT block matmul weight leaf (encoder
    patch/image ViTs and the FOV ViT), leaving the rest untouched."""

    def quant_vit(vit_params: dict) -> dict:
        blocks = dict(vit_params["blocks"])
        for key in _QUANT_KEYS:
            blocks[key] = fn(blocks[key])
        out = dict(vit_params)
        out["blocks"] = blocks
        return out

    out = dict(params)
    enc = dict(params["encoder"])
    enc["patch_vit"] = quant_vit(enc["patch_vit"])
    enc["image_vit"] = quant_vit(enc["image_vit"])
    out["encoder"] = enc
    if "fov" in params:
        fov = dict(params["fov"])
        fov["vit"] = quant_vit(fov["vit"])
        out["fov"] = fov
    return out


def quantize_vit_weights(params: dict) -> dict:
    """Return params with every ViT block matmul weight int8-quantized
    (encoder patch/image ViTs and the FOV ViT)."""
    return _map_vit_matmuls(params, _quantize)


def quantize_vit_weights_abstract(params: dict) -> dict:
    """Shape/dtype-only variant of :func:`quantize_vit_weights` for
    abstract param trees (AOT export never needs real weights; the
    concrete quantizer runs through numpy, which cannot trace)."""
    import jax

    def q(w):
        l, _, dout = w.shape
        return {"q": jax.ShapeDtypeStruct(w.shape, jnp.int8),
                "s": jax.ShapeDtypeStruct((l, 1, dout), jnp.float32)}

    return _map_vit_matmuls(params, q)


def materialize_weight(w, dtype):
    """Dense weight for a matmul: plain array or quantized {'q','s'}.
    The dequant multiply fuses into the consuming matmul under jit."""
    if isinstance(w, dict):
        return w["q"].astype(dtype) * w["s"].astype(dtype)
    return w.astype(dtype)
