"""Offline checkpoint conversion: reference torch weights -> TPU pytree.

The reference loads a single-file torch state dict
(`/root/reference/src/depth_pro/depth_pro.py:134-149`, keys exempting
``fc_norm``) into NCHW/OIHW torch modules. We convert once, offline, to
the layouts this framework computes in:

- conv:            (O, I, kh, kw)   -> (kh, kw, I, O)          [HWIO]
- conv-transpose:  (I, O, 2, 2)     -> (I, 2*2*O)              [matmul form]
- linear:          (O, I)           -> (I, O)
- patch embed:     (D, 3, P, P)     -> (P*P*3, D)              [patchify-matmul]
- ViT blocks:      per-block tensors stacked along a leading depth axis
                   (consumed by ``lax.scan``)

The timm-checkpoint resampling the reference performs at model build
time (patch-embed kernel 14->16 with magnitude rescale and pos-embed
518->384, `network/vit.py:51-123`) is baked in here at conversion time
via the same torch-exact resize matrices used by the model.

Expected real-checkpoint backbone key schema (weights-day audit)
----------------------------------------------------------------
``depth_pro.pt`` stores the state dict of the ALREADY-RESAMPLED module
tree (the reference loads it strict=True after `resize_patch_embed` /
`resize_vit` run, `depth_pro.py:134-140`), so each of the three ViT
subtrees (``encoder.patch_encoder.``, ``encoder.image_encoder.``,
``fov.encoder.0.``) carries timm ``vit_large_patch14_dinov2`` keys at
patch 16 / img 384 (`network/vit_factory.py:53-65,94-99`):

- ``cls_token``                     (1, 1, 1024)
- ``pos_embed``                     (1, 577, 1024)   # 24*24 + cls; timm
  ``no_embed_class=False`` so the cls position IS in pos_embed
- ``patch_embed.proj.weight``       (1024, 3, 16, 16) ``.bias`` (1024,)
- per block i in 0..23 (``blocks.{i}.``):
  ``norm1.weight/.bias`` (1024,), ``attn.qkv.weight`` (3072, 1024),
  ``attn.qkv.bias`` (3072,), ``attn.proj.weight`` (1024, 1024),
  ``attn.proj.bias`` (1024,), ``ls1.gamma`` (1024,) — timm>=0.9
  LayerScale naming, NOT the DeiT-III ``gamma_1`` — ``norm2.weight/
  .bias``, ``mlp.fc1.weight`` (4096, 1024), ``mlp.fc1.bias``,
  ``mlp.fc2.weight`` (1024, 4096), ``mlp.fc2.bias``, ``ls2.gamma``
- ``norm.weight/.bias``             (1024,)

Keys that must NOT appear (and would correctly fail the strict check):
``reg_token`` (that is the ``_reg4_`` DINOv2 variant, not this preset),
``attn.q_norm/k_norm`` (Identity by default), ``head.*`` (DINOv2
pretrained_cfg has num_classes=0 so the classifier is Identity), and
``fc_norm.*`` — the reference exempts *model-side* fc_norm keys missing
from the checkpoint (`depth_pro.py:141-147`); the checkpoint itself has
none, and `_TrackedSD.leftovers` mirrors the same exemption should a
future timm save them. ``tests/test_reference_parity.py::
test_stub_backbone_matches_timm_dinov2_layout`` pins the test stub to
exactly this schema.
"""

from __future__ import annotations

import numpy as np

from ..models.vit import ViTConfig
from ..ops.resize import resize_matrix


def _np(t) -> np.ndarray:
    """torch tensor or array-like -> fp32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv(sd, key, bias=True):
    w = _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    out = {"w": w}
    if bias:
        out["b"] = _np(sd[f"{key}.bias"])
    return out


def _deconv2x2_w(sd, key) -> np.ndarray:
    w = _np(sd[f"{key}.weight"])  # (I, O, 2, 2)
    cin, cout = w.shape[0], w.shape[1]
    return w.transpose(0, 2, 3, 1).reshape(cin, 4 * cout)


def _linear(sd, key):
    return {"w": _np(sd[f"{key}.weight"]).T, "b": _np(sd[f"{key}.bias"])}


# ---------------------------------------------------------------------------
# ViT


def convert_vit(sd: dict, prefix: str, cfg: ViTConfig) -> dict:
    """Convert a timm-style ViT state dict subtree at ``prefix``."""

    def g(key):
        return _np(sd[prefix + key])

    d = cfg.embed_dim
    nh = cfg.num_heads
    hd = d // nh

    def pack_per_head(w_t):
        """torch [q|k|v] packing -> HEAD-CONTIGUOUS packing
        [h0:(q,k,v) | h1:(q,k,v) | ...]: each tensor-parallel shard then
        owns whole heads, so the (b,s,nh,3,hd) unpack inherits a column
        sharding instead of forcing a qkv all-gather (parallel/sharding)."""
        lead = w_t.shape[:-1]
        w = w_t.reshape(*lead, 3, nh, hd)
        return np.moveaxis(w, -3, -2).reshape(*lead, 3 * d)

    blocks = {k: [] for k in (
        "ln1_g", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b", "ls1",
        "ln2_g", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b", "ls2",
    )}
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        blocks["ln1_g"].append(g(p + "norm1.weight"))
        blocks["ln1_b"].append(g(p + "norm1.bias"))
        blocks["qkv_w"].append(pack_per_head(g(p + "attn.qkv.weight").T))
        blocks["qkv_b"].append(pack_per_head(g(p + "attn.qkv.bias")))
        blocks["proj_w"].append(g(p + "attn.proj.weight").T)
        blocks["proj_b"].append(g(p + "attn.proj.bias"))
        blocks["ls1"].append(g(p + "ls1.gamma"))
        blocks["ln2_g"].append(g(p + "norm2.weight"))
        blocks["ln2_b"].append(g(p + "norm2.bias"))
        blocks["fc1_w"].append(g(p + "mlp.fc1.weight").T)
        blocks["fc1_b"].append(g(p + "mlp.fc1.bias"))
        blocks["fc2_w"].append(g(p + "mlp.fc2.weight").T)
        blocks["fc2_b"].append(g(p + "mlp.fc2.bias"))
        blocks["ls2"].append(g(p + "ls2.gamma"))
    blocks = {k: np.stack(v) for k, v in blocks.items()}

    pw = g("patch_embed.proj.weight")  # (D, 3, P, P)
    pos = g("pos_embed")
    if pw.shape[-1] != cfg.patch_size:
        pw = resample_patch_embed(pw, cfg.patch_size)
    n_pos_grid = int(round((pos.shape[1] - 1) ** 0.5))
    if n_pos_grid != cfg.grid_size:
        pos = resample_pos_embed(pos, cfg.grid_size)

    return {
        "patch_embed": {
            "w": pw.transpose(2, 3, 1, 0).reshape(-1, d),
            "b": g("patch_embed.proj.bias"),
        },
        "cls_token": g("cls_token"),
        "pos_embed": pos,
        "blocks": blocks,
        "norm": {"g": g("norm.weight"), "b": g("norm.bias")},
    }


def resample_patch_embed(w: np.ndarray, new_patch: int) -> np.ndarray:
    """Bicubic-resample a (D, C, p, p) patch-embed kernel to new_patch,
    with the reference's magnitude rescale (h/nh)*(w/nw)
    (`network/vit.py:85-93`)."""
    d, c, h, wd = w.shape
    mh = resize_matrix(h, new_patch, "bicubic", antialias=False)
    mw = resize_matrix(wd, new_patch, "bicubic", antialias=False)
    out = np.einsum("oh,dchw,pw->dcop", mh.astype(np.float64), w.astype(np.float64), mw.astype(np.float64))
    out = out * (h / new_patch) * (wd / new_patch)
    return out.astype(np.float32)


def resample_pos_embed(pos: np.ndarray, new_grid: int, num_prefix: int = 1) -> np.ndarray:
    """Anti-aliased bicubic pos-embed resample, matching timm's
    ``resample_abs_pos_embed`` as used at `network/vit.py:58-64`."""
    prefix, grid = pos[:, :num_prefix], pos[:, num_prefix:]
    g = int(round(grid.shape[1] ** 0.5))
    d = grid.shape[-1]
    grid = grid.reshape(1, g, g, d).astype(np.float64)
    mh = resize_matrix(g, new_grid, "bicubic", antialias=True).astype(np.float64)
    out = np.einsum("oh,bhwd->bowd", mh, grid)
    out = np.einsum("ow,bhwd->bhod", mh, out)
    out = out.reshape(1, new_grid * new_grid, d).astype(np.float32)
    return np.concatenate([prefix, out], axis=1)


# ---------------------------------------------------------------------------
# DepthPro


def _upsample_block(sd: dict, prefix: str, n_deconv: int) -> dict:
    """project+upsample pyramid block (`encoder.py:60-93`): 1x1 conv
    projection (no bias) followed by ``n_deconv`` 2x2/s2 deconvs."""
    return {
        "proj_w": _np(sd[f"{prefix}.0.weight"]).transpose(2, 3, 1, 0),
        "deconvs": [_deconv2x2_w(sd, f"{prefix}.{1 + i}") for i in range(n_deconv)],
    }


def _fusion(sd: dict, prefix: str, deconv: bool) -> dict:
    def res(name):
        return {
            "w1": _np(sd[f"{prefix}.{name}.residual.1.weight"]).transpose(2, 3, 1, 0),
            "b1": _np(sd[f"{prefix}.{name}.residual.1.bias"]),
            "w2": _np(sd[f"{prefix}.{name}.residual.3.weight"]).transpose(2, 3, 1, 0),
            "b2": _np(sd[f"{prefix}.{name}.residual.3.bias"]),
        }

    out = {
        "res1": res("resnet1"),
        "res2": res("resnet2"),
        "out": _conv(sd, f"{prefix}.out_conv"),
        "deconv_w": _deconv2x2_w(sd, f"{prefix}.deconv") if deconv else None,
    }
    return out


class _TrackedSD:
    """State-dict view that records every consumed key so conversion can
    fail on leftovers — the reference loads strict both ways
    (`depth_pro.py:136-149`); silently dropping unconsumed tensors would
    turn a mismatched checkpoint into a wrong-but-running model."""

    def __init__(self, sd: dict):
        self.sd = sd
        self.used: set = set()

    def __getitem__(self, key):
        self.used.add(key)
        return self.sd[key]

    def __contains__(self, key):
        return key in self.sd

    def leftovers(self):
        # the reference exempts timm's unused fc_norm keys (`:141-147`)
        return sorted(k for k in set(self.sd) - self.used if "fc_norm" not in k)


def convert_depth_pro(sd: dict, cfg) -> dict:
    """Convert the full reference DepthPro state dict.

    ``cfg`` is a ``DepthProConfig`` (models/depth_pro.py); key layout
    follows the reference module tree (`depth_pro.py:154-211`,
    `encoder.py:95-130`, `decoder.py:42-72`, `fov.py:30-54`). Raises on
    unconsumed keys (strict, like the reference load).
    """
    sd = _TrackedSD(sd)
    vit_cfg = cfg.vit
    enc = {
        "patch_vit": convert_vit(sd, "encoder.patch_encoder.", vit_cfg),
        "image_vit": convert_vit(sd, "encoder.image_encoder.", vit_cfg),
        "upsample_latent0": _upsample_block(sd, "encoder.upsample_latent0", 3),
        "upsample_latent1": _upsample_block(sd, "encoder.upsample_latent1", 2),
        "upsample0": _upsample_block(sd, "encoder.upsample0", 1),
        "upsample1": _upsample_block(sd, "encoder.upsample1", 1),
        "upsample2": _upsample_block(sd, "encoder.upsample2", 1),
        "upsample_lowres": {
            "w": _deconv2x2_w(sd, "encoder.upsample_lowres"),
            "b": _np(sd["encoder.upsample_lowres.bias"]),
        },
        "fuse_lowres": _conv(sd, "encoder.fuse_lowres"),
    }

    n_levels = 5
    convs = [None]
    for i in range(1, n_levels):
        convs.append(_np(sd[f"decoder.convs.{i}.weight"]).transpose(2, 3, 1, 0))
    dec = {
        "convs": convs,
        "fusions": [_fusion(sd, f"decoder.fusions.{i}", deconv=(i != 0)) for i in range(n_levels)],
    }

    head = {
        "conv_in": _conv(sd, "head.0"),
        "deconv": {"w": _deconv2x2_w(sd, "head.1"), "b": _np(sd["head.1.bias"])},
        "conv_mid": _conv(sd, "head.2"),
        "conv_out": _conv(sd, "head.4"),
    }

    params = {"encoder": enc, "decoder": dec, "head": head}

    if cfg.use_fov_head:
        params["fov"] = {
            "vit": convert_vit(sd, "fov.encoder.0.", vit_cfg),
            "proj": _linear(sd, "fov.encoder.1"),
            "down": _conv(sd, "fov.downsample.0"),
            "head": [_conv(sd, f"fov.head.{i}") for i in (0, 2, 4)],
        }
    extra = sd.leftovers()
    if extra:
        raise ValueError(
            f"{len(extra)} checkpoint keys were not consumed by the conversion "
            f"(wrong or mismatched checkpoint?): {extra[:8]}{'...' if len(extra) > 8 else ''}"
        )
    return params


# ---------------------------------------------------------------------------
# flat npz serialization


def _flatten(tree, prefix="", out=None):
    out = {} if out is None else out
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    elif tree is None:
        out[prefix[:-1] + "#none"] = np.zeros((), np.float32)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for key, val in flat.items():
        none = key.endswith("#none")
        parts = (key[: -len("#none")] if none else key).split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = None if none else val

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_params(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str):
    with np.load(path) as f:
        return _unflatten(dict(f))


def convert_checkpoint(torch_ckpt_path: str, out_path: str, cfg=None) -> None:
    """CLI helper: ``depth_pro.pt`` -> ``depth_pro_tpu.npz``."""
    import torch

    from ..models.depth_pro import DEFAULT_MONODEPTH_CONFIG

    sd = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    params = convert_depth_pro(sd, cfg or DEFAULT_MONODEPTH_CONFIG)
    save_params(out_path, params)


def main():  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(description="Convert reference depth_pro.pt to TPU npz")
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_npz")
    args = ap.parse_args()
    convert_checkpoint(args.torch_ckpt, args.out_npz)


if __name__ == "__main__":  # pragma: no cover
    main()
