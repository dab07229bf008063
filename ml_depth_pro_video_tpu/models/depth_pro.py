"""Depth Pro model, TPU-native.

Re-implements the reference network
(`/root/reference/src/depth_pro/depth_pro.py`, `network/encoder.py`,
`network/decoder.py`, `network/fov.py`) as one functional, jittable JAX
program:

- the 3-level pyramid + sliding-window split/merge
  (`encoder.py:151-217`) becomes static slicing/concat over compile-time
  grids (5x5 / 3x3 / 1x1), all 35 patches batched through ONE ViT call;
- torch forward hooks on blocks {5,11} (`encoder.py:132-144`) become
  explicit multi-output captures from the scan-segmented ViT;
- all convs are NHWC, 2x2/s2 deconvs are matmul+depth-to-space;
- ``infer()`` preserves the exact public contract of
  `depth_pro.py:243-298`: optional resize to the network resolution,
  f_px derivation ``0.5*W/tan(0.5*fov_deg)`` with the ORIGINAL width,
  inverse-depth scaling, resize back, ``1/clamp(inv, 1e-4, 1e4)``.

Everything here is shape-static so a single XLA program covers the full
frame path; batching over frames for video is the leading dimension.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision, resolve_precision
from ..ops.conv import (
    conv2d,
    conv_transpose2x2,
    depth_to_space2x2,
    fold_deconv2x2_conv3x3,
    linear,
)
from ..ops.resize import resize2d
from .vit import ViTConfig, init_vit, vit_apply

LOGGER = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DepthProConfig:
    """Model architecture configuration (mirrors `depth_pro.py:26-46`)."""

    vit: ViTConfig = ViTConfig()
    decoder_features: int = 256
    dims_encoder: tuple = (256, 512, 1024, 1024)
    hook_block_ids: tuple = (5, 11)
    use_fov_head: bool = True
    checkpoint_uri: Optional[str] = "./checkpoints/depth_pro_tpu.npz"
    # approximation speed tier (0.0 = exact): ToMe token merging in the
    # 35-patch hot loop — after `token_merge_block` exact blocks,
    # int(ratio * 576) patch tokens are merged away (models/vit.py)
    token_merge_ratio: float = 0.0
    token_merge_block: int = 2

    @property
    def img_size(self) -> int:
        """Full network resolution = 4x the backbone resolution."""
        return self.vit.img_size * 4

    @property
    def out_size(self) -> int:
        return self.vit.grid_size


DEFAULT_MONODEPTH_CONFIG = DepthProConfig()

# --speed presets (runner / CLIs / serve): the non-exact tiers trade a
# bounded output deviation for throughput via ToMe token merging with
# proportional attention. Measured bounds (docs/PERFORMANCE.md "Speed
# tiers"): fps on-chip at full config; deviation envelope on a
# structured-feature proxy trained with the real fit() loop (random
# weights have no spatial redundancy, so their envelope is meaninglessly
# pessimistic). Final sign-off vs the real checkpoint is a weights-day
# item — apply_speed logs a notice until then.
SPEED_PRESETS = {"exact": 0.0, "balanced": 0.25, "fast": 0.5}


def apply_speed(cfg: "DepthProConfig", speed: str) -> "DepthProConfig":
    """Return ``cfg`` with the named speed preset's merge ratio set."""
    if speed not in SPEED_PRESETS:
        raise ValueError(f"speed must be one of {sorted(SPEED_PRESETS)}, got {speed!r}")
    if SPEED_PRESETS[speed] > 0:
        logging.getLogger(__name__).warning(
            "--speed %s is an APPROXIMATE tier (token merge ratio %.2f): "
            "deviation bounds in docs/PERFORMANCE.md are from a "
            "structured-feature proxy model; sign-off vs the real "
            "checkpoint pending (use --speed exact for reference parity)",
            speed, SPEED_PRESETS[speed])
    return dataclasses.replace(cfg, token_merge_ratio=SPEED_PRESETS[speed])


def model_preset(name: str = "large") -> DepthProConfig:
    """The Depth Pro model family.

    ``large`` is the reference architecture (ViT-L backbone — the only
    member with a published checkpoint,
    `/root/reference/src/depth_pro/depth_pro.py:26-46`). ``base`` and
    ``small`` keep the exact graph topology (same 1536² network
    resolution, 35-patch pyramid, DPT decoder, FOV head) at DINOv2
    B/S backbone dims — ~3×/14× fewer trunk FLOPs — as fine-tune or
    distillation targets (`train/distill.py`); their checkpoints come
    from ``depth-pro-train`` / ``depth-pro-distill``, not from Apple.
    Encoder dims follow the reference's (embed/4, embed/2, embed,
    embed) ratio; hook blocks sit at the same 1/4 and 1/2 trunk depth.
    """
    from .vit import VIT_CONFIG_DICT

    presets = {
        "large": ("dinov2l16_384", None),  # reference config verbatim
        "base": ("dinov2b16_384", "./checkpoints/depth_pro_tpu_base.npz"),
        "small": ("dinov2s16_384", "./checkpoints/depth_pro_tpu_small.npz"),
    }
    if name == "tiny":
        return tiny_config()
    if name not in presets:
        raise ValueError(f"model must be one of {sorted(presets) + ['tiny']}, "
                         f"got {name!r}")
    if name == "large":
        return DEFAULT_MONODEPTH_CONFIG
    vit_name, ckpt = presets[name]
    vit = VIT_CONFIG_DICT[vit_name]
    d = vit.embed_dim
    return DepthProConfig(
        vit=vit,
        decoder_features=d // 4,
        dims_encoder=(d // 4, d // 2, d, d),
        hook_block_ids=(vit.depth // 4 - 1, vit.depth // 2 - 1),
        checkpoint_uri=ckpt,
    )


MODEL_PRESETS = ("large", "base", "small", "tiny")


def tiny_config(use_fov_head: bool = True) -> DepthProConfig:
    """A miniature config for CPU tests and multi-chip dry runs: same
    graph topology, 512px network resolution, 2-block ViT."""
    return DepthProConfig(
        vit=ViTConfig(img_size=128, patch_size=16, embed_dim=64, depth=2, num_heads=2, mlp_ratio=2),
        decoder_features=16,
        dims_encoder=(16, 32, 64, 64),
        hook_block_ids=(0, 1),
        use_fov_head=use_fov_head,
        checkpoint_uri=None,
    )


# ---------------------------------------------------------------------------
# pyramid split / merge (static grids)


def split_patches(x: jnp.ndarray, patch: int, overlap: float) -> jnp.ndarray:
    """Sliding-window split of (B, S, S, C) into (n*n*B, patch, patch, C),
    patch-major (row-major grid) to match the reference batch layout
    (`encoder.py:170-188`)."""
    size = x.shape[1]
    stride = int(patch * (1 - overlap))
    steps = (size - patch + stride - 1) // stride + 1
    tiles = [
        x[:, j * stride : j * stride + patch, i * stride : i * stride + patch, :]
        for j in range(steps)
        for i in range(steps)
    ]
    t = jnp.stack(tiles, axis=0)
    return t.reshape((steps * steps * x.shape[0],) + tiles[0].shape[1:])


def merge_patches(x: jnp.ndarray, batch: int, padding: int) -> jnp.ndarray:
    """Inverse of split at feature resolution: trim ``padding`` from
    interior edges and stitch (`encoder.py:190-217`)."""
    n = x.shape[0] // batch
    steps = int(round(n**0.5))
    g = x.shape[1]
    x = x.reshape(steps, steps, batch, g, g, -1)
    rows = []
    for j in range(steps):
        cols = []
        for i in range(steps):
            t = x[j, i]
            t = t[:, (padding if j > 0 else 0) : g - (padding if j < steps - 1 else 0),
                  (padding if i > 0 else 0) : g - (padding if i < steps - 1 else 0), :]
            cols.append(t)
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)


def tokens_to_grid(tokens: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Drop the cls token, (B, 1+G*G, D) -> (B, G, G, D)."""
    return tokens[:, 1:, :].reshape(tokens.shape[0], grid, grid, -1)


# ---------------------------------------------------------------------------
# encoder


def _apply_upsample_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    x = conv2d(x, p["proj_w"])
    for w in p["deconvs"]:
        x = conv_transpose2x2(x, w)
    return x


def encoder_apply(params: dict, x: jnp.ndarray, cfg: DepthProConfig,
                  precision: Precision, attn_impl: str | None = None,
                  remat: bool = False, patch_vit_fn=None) -> list[jnp.ndarray]:
    """Multi-resolution encoding (`encoder.py:233-332`). x: (B, 4p, 4p, 3).

    ``patch_vit_fn(params, pyramid) -> (tokens, (h0, h1))`` overrides the
    35-patch backbone call — the latency-parallel path (parallel/
    latency.py) injects a shard_map here that splits the patch axis over
    every chip on the mesh.
    """
    vit_cfg = cfg.vit
    b = x.shape[0]
    p = vit_cfg.img_size
    g = vit_cfg.grid_size
    pad0, pad1 = g // 8, g // 4

    x = x.astype(precision.compute_dtype)
    x1 = resize2d(x, (2 * p, 2 * p))
    x2 = resize2d(x, (p, p))

    x0_patches = split_patches(x, p, overlap=0.25)   # 25B
    x1_patches = split_patches(x1, p, overlap=0.5)   # 9B
    pyramid = jnp.concatenate([x0_patches, x1_patches, x2], axis=0)  # 35B

    if patch_vit_fn is None:
        tokens, (h0, h1) = vit_apply(
            params["patch_vit"], pyramid, vit_cfg, precision,
            capture_blocks=cfg.hook_block_ids, attn_impl=attn_impl, remat=remat,
            merge_ratio=cfg.token_merge_ratio, merge_block=cfg.token_merge_block,
        )
    else:
        tokens, (h0, h1) = patch_vit_fn(params["patch_vit"], pyramid)

    n0 = 25 * b
    n1 = 9 * b
    latent0 = merge_patches(tokens_to_grid(h0[:n0], g), b, pad0)
    latent1 = merge_patches(tokens_to_grid(h1[:n0], g), b, pad0)

    feat = tokens_to_grid(tokens, g)
    x0_feat = merge_patches(feat[:n0], b, pad0)
    x1_feat = merge_patches(feat[n0 : n0 + n1], b, pad1)
    x2_feat = feat[n0 + n1 :]

    image_tokens, _ = vit_apply(params["image_vit"], x2, vit_cfg, precision,
                                attn_impl=attn_impl, remat=remat)
    global_feat = tokens_to_grid(image_tokens, g)

    latent0 = _apply_upsample_block(params["upsample_latent0"], latent0)
    latent1 = _apply_upsample_block(params["upsample_latent1"], latent1)
    x0_feat = _apply_upsample_block(params["upsample0"], x0_feat)
    x1_feat = _apply_upsample_block(params["upsample1"], x1_feat)
    x2_feat = _apply_upsample_block(params["upsample2"], x2_feat)

    global_feat = conv_transpose2x2(global_feat, params["upsample_lowres"]["w"],
                                    params["upsample_lowres"]["b"])
    fused = conv2d(jnp.concatenate([x2_feat, global_feat], axis=-1),
                   params["fuse_lowres"]["w"], params["fuse_lowres"]["b"])

    return [latent0, latent1, x0_feat, x1_feat, fused]


# ---------------------------------------------------------------------------
# decoder


def _residual(p: dict, x: jnp.ndarray, impl: str | None = None) -> jnp.ndarray:
    # fused Pallas resblock on TPU bf16 at the small (<=96^2) pyramid
    # levels: one HBM round-trip instead of five, ties XLA per-op
    # (ops/resblock.py — at 192^2+ XLA convs win and keep the path);
    # XLA composition elsewhere. ``impl="xla"`` forces the composition —
    # REQUIRED inside GSPMD-partitioned programs (latency row-sharding,
    # jit-with-sharded-params TP), where a Mosaic custom call cannot be
    # auto-partitioned (same constraint as the attention kernel).
    from ..ops.resblock import residual_block

    return residual_block(x, p["w1"], p["b1"], p["w2"], p["b2"], impl=impl)


def _fusion_apply(p: dict, x0: jnp.ndarray, x1: jnp.ndarray | None,
                  conv_impl: str | None = None) -> jnp.ndarray:
    """FeatureFusionBlock2d (`decoder.py:121-180`).

    When the 2x upsample is present, the trailing 1x1 out_conv is folded
    INTO the deconv matmul (both linear, adjacent): one matmul instead of
    matmul + a full-map 1x1 conv at the upsampled resolution."""
    x = x0
    if x1 is not None:
        x = x + _residual(p["res1"], x1, conv_impl)
    x = _residual(p["res2"], x, conv_impl)
    if p["deconv_w"] is not None:
        wd = p["deconv_w"]  # (C, 4*M) packed (a, b, m)
        wo = p["out"]["w"][0, 0]  # (M, O)
        c = wd.shape[0]
        m = wd.shape[1] // 4
        w_fold = (wd.reshape(c, 4, m) @ wo).reshape(c, -1)
        return conv_transpose2x2(x, w_fold, p["out"]["b"])
    return conv2d(x, p["out"]["w"], p["out"]["b"])


def decoder_apply(params: dict, encodings: list[jnp.ndarray],
                  conv_impl: str | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse low->high resolution (`decoder.py:74-93`). Returns
    (features, lowres_features); the latter feeds the FOV head.
    ``conv_impl="xla"`` disables the Pallas resblock (GSPMD programs)."""
    convs = params["convs"]
    fusions = params["fusions"]
    proj = [e if w is None else conv2d(e, w, padding=1) for e, w in zip(encodings, convs)]
    features = proj[-1]
    lowres = features
    features = _fusion_apply(fusions[-1], features, None, conv_impl)
    for i in range(len(proj) - 2, -1, -1):
        features = _fusion_apply(fusions[i], features, proj[i], conv_impl)
    return features, lowres


# ---------------------------------------------------------------------------
# heads


def head_apply(params: dict, x: jnp.ndarray,
               precision: Precision = Precision.fp32()) -> jnp.ndarray:
    """Depth head (`depth_pro.py:182-204`). Convs run (and accumulate)
    in the compute dtype; the final 1x1 conv producing the canonical
    inverse depth is always fp32.

    The deconv and the following 3x3 conv are both linear, so they are
    folded into ONE 3x3 conv at HALF resolution over subpixel-packed
    channels (exact, borders included — see fold_deconv2x2_conv3x3);
    ReLU and the 1x1 output conv commute with depth-to-space, so every
    heavy op runs at (img/2)^2 with >=128 channels instead of a
    badly-tiling 32-channel conv at full resolution (34.8 -> ~5 ms
    measured, scripts/tpu_r2_profile1.out)."""
    x = x.astype(precision.compute_dtype)
    x = conv2d(x, params["conv_in"]["w"], params["conv_in"]["b"], padding=1)

    # inference paths precompute the fold once (fold_head_params);
    # training folds in-graph so gradients flow to the raw weights
    wcomp = params.get("folded_wcomp")
    if wcomp is None:
        wcomp = fold_deconv2x2_conv3x3(
            params["deconv"]["w"], params["deconv"]["b"], params["conv_mid"]["w"]
        )
    cin = x.shape[-1]
    # main conv on x; the ones-channel (deconv-bias border handling)
    # becomes a separate batch-1 conv of a constant — input-independent,
    # so XLA hoists/CSEs it and the hot conv keeps a clean channel count
    h = conv2d(x, wcomp[:, :, :cin], padding=1)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    h = h + conv2d(ones, wcomp[:, :, cin:], padding=1)
    n = params["conv_mid"]["b"].shape[0]
    h = h + jnp.tile(params["conv_mid"]["b"], 4).astype(h.dtype)
    h = jax.nn.relu(h).astype(jnp.float32)

    # 1x1 output conv per packed subpixel group as ONE block-diagonal
    # matmul (keeps the lane dim at 4*N instead of a 5-D reshape)
    wo = params["conv_out"]["w"].reshape(n, -1)  # (N, n_out)
    n_out = wo.shape[-1]
    eye4 = jnp.eye(4, dtype=wo.dtype)
    wbig = jnp.einsum("gh,no->gnho", eye4, wo).reshape(4 * n, 4 * n_out)
    y = jnp.dot(h, wbig) + jnp.tile(params["conv_out"]["b"], 4)
    y = depth_to_space2x2(y)  # (B, 2H, 2W, n_out)
    return jax.nn.relu(y)


def fold_head_params(params: dict) -> dict:
    """Return a copy of the full param tree with the head's
    deconv+conv_mid fold precomputed (inference-time optimization; the
    forward uses it when present instead of folding in-graph)."""
    head = dict(params["head"])
    head["folded_wcomp"] = fold_deconv2x2_conv3x3(
        head["deconv"]["w"], head["deconv"]["b"], head["conv_mid"]["w"]
    )
    out = dict(params)
    out["head"] = head
    return out


def fov_apply(params: dict, x: jnp.ndarray, lowres: jnp.ndarray, cfg: DepthProConfig,
              precision: Precision, attn_impl: str | None = None) -> jnp.ndarray:
    """FOV estimation (`fov.py:56-82`): quarter-res image through a third
    ViT, token features projected and summed with downsampled decoder
    features, then a strided conv stack to a scalar in degrees."""
    vit_cfg = cfg.vit
    p = vit_cfg.img_size
    g = vit_cfg.grid_size
    x = resize2d(x.astype(precision.compute_dtype), (p, p))
    tokens, _ = vit_apply(params["vit"], x, vit_cfg, precision, attn_impl=attn_impl)
    t = linear(tokens.astype(jnp.float32), params["proj"]["w"], params["proj"]["b"])
    t = t[:, 1:, :].reshape(t.shape[0], g, g, -1)

    lo = jax.lax.stop_gradient(lowres).astype(jnp.float32)
    lo = conv2d(lo, params["down"]["w"], params["down"]["b"], stride=2, padding=1)
    lo = jax.nn.relu(lo)

    h = t + lo
    h = jax.nn.relu(conv2d(h, params["head"][0]["w"], params["head"][0]["b"], stride=2, padding=1))
    h = jax.nn.relu(conv2d(h, params["head"][1]["w"], params["head"][1]["b"], stride=2, padding=1))
    h = conv2d(h, params["head"][2]["w"], params["head"][2]["b"])  # k=6 valid -> (B,1,1,1)
    return h.reshape(h.shape[0])


# ---------------------------------------------------------------------------
# full model


def forward(params: dict, x: jnp.ndarray, cfg: DepthProConfig,
            precision: Precision = Precision.fp32(),
            attn_impl: str | None = None,
            compute_fov: bool = True,
            remat: bool = False,
            patch_vit_fn=None,
            constrain=None,
            conv_impl: str | None = None) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """(B, img, img, 3) -> (canonical inverse depth (B, img, img, 1),
    fov_deg (B,) or None). Mirrors `depth_pro.py:218-241`.

    ``compute_fov=False`` skips the third ViT pass — used when the
    caller supplies f_px, where fov_deg would be discarded anyway.
    ``patch_vit_fn`` / ``constrain`` are the latency-parallel hooks
    (parallel/latency.py): the former replaces the 35-patch backbone
    call, the latter applies sharding constraints to the conv-trunk
    activations so GSPMD row-shards the decoder/head. ``conv_impl``
    routes the decoder resblocks ("xla" forces the plain composition);
    when ``constrain`` shards the decoder it defaults to "xla", since a
    Mosaic kernel cannot be GSPMD-partitioned."""
    if x.shape[1] != cfg.img_size or x.shape[2] != cfg.img_size:
        raise ValueError(
            f"forward expects {cfg.img_size}x{cfg.img_size} input, got {x.shape}; "
            "use infer() for arbitrary sizes"
        )
    encodings = encoder_apply(params["encoder"], x, cfg, precision, attn_impl,
                              remat, patch_vit_fn=patch_vit_fn)
    if constrain is not None:
        encodings = [constrain(e) for e in encodings]
        if conv_impl is None:
            conv_impl = "xla"
    features, lowres = decoder_apply(params["decoder"], encodings, conv_impl)
    if constrain is not None:
        features = constrain(features)
    canonical = head_apply(params["head"], features, precision)
    fov_deg = None
    if cfg.use_fov_head and compute_fov:
        fov_deg = fov_apply(params["fov"], x, lowres, cfg, precision, attn_impl)
    return canonical, fov_deg


def infer_fn(params: dict, x: jnp.ndarray, f_px: jnp.ndarray | None, cfg: DepthProConfig,
             precision: Precision = Precision.fp32(),
             attn_impl: str | None = None,
             interpolation_mode: str = "bilinear",
             derive_missing: bool = False,
             patch_vit_fn=None,
             constrain=None,
             conv_impl: str | None = None) -> dict:
    """The `infer()` contract (`depth_pro.py:243-298`), NHWC.

    x: (B, H, W, 3) normalized; f_px: (B,) or None.
    With ``derive_missing=True``, ``f_px`` may contain NaN entries: the
    FOV head runs and only those entries are replaced by the derived
    focal length — a mixed-EXIF batch keeps the provided focals instead
    of forcing the whole batch through FOV derivation.
    ``conv_impl`` (like ``attn_impl``) must be "xla" inside
    GSPMD-partitioned programs — see ``forward``.
    Returns {"depth": (B, H, W) fp32 [m], "focallength_px": (B,)}.
    """
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    s = cfg.img_size
    needs_resize = (h != s) or (w != s)
    xi = resize2d(x, (s, s), mode=interpolation_mode) if needs_resize else x

    need_fov = f_px is None or derive_missing
    if need_fov and not cfg.use_fov_head:
        raise ValueError(
            "f_px is required for every frame when the model has no FOV head "
            "(cfg.use_fov_head=False): there is nothing to derive it from"
        )
    canonical, fov_deg = forward(params, xi, cfg, precision, attn_impl,
                                 compute_fov=need_fov,
                                 patch_vit_fn=patch_vit_fn, constrain=constrain,
                                 conv_impl=conv_impl)
    canonical = canonical[..., 0].astype(jnp.float32)  # (B, s, s)

    if need_fov:
        fov_rad = jnp.deg2rad(fov_deg.astype(jnp.float32))
        derived = 0.5 * w / jnp.tan(0.5 * fov_rad)
        if f_px is None:
            f_px = derived
        else:
            given = jnp.asarray(f_px, jnp.float32).reshape(b)
            f_px = jnp.where(jnp.isnan(given), derived, given)
    else:
        f_px = jnp.asarray(f_px, jnp.float32).reshape(b)

    inverse_depth = canonical * (w / f_px)[:, None, None]
    if needs_resize:
        inverse_depth = resize2d(inverse_depth[..., None], (h, w), mode=interpolation_mode)[..., 0]
    depth = 1.0 / jnp.clip(inverse_depth, 1e-4, 1e4)
    return {"depth": depth, "focallength_px": f_px}


# ---------------------------------------------------------------------------
# params init / loading


def init_depth_pro(rng: jax.Array, cfg: DepthProConfig) -> dict:
    """Random init with the reference's structural zeros (final head bias
    zero-init, `depth_pro.py:207`)."""
    keys = jax.random.split(rng, 16)
    d = cfg.vit.embed_dim
    df = cfg.decoder_features
    dims = cfg.dims_encoder

    def conv_w(key, kh, kw, i, o):
        fan_in = kh * kw * i
        return (jax.random.normal(key, (kh, kw, i, o)) * fan_in**-0.5).astype(jnp.float32)

    def deconv_w(key, i, o):
        return (jax.random.normal(key, (i, 4 * o)) * (4 * i) ** -0.5).astype(jnp.float32)

    k = iter(jax.random.split(keys[0], 64))

    def upsample(i_dim, o_dim, n, int_dim=None):
        int_dim = int_dim or o_dim
        return {
            "proj_w": conv_w(next(k), 1, 1, i_dim, int_dim),
            "deconvs": [deconv_w(next(k), int_dim if j == 0 else o_dim, o_dim) for j in range(n)],
        }

    enc = {
        "patch_vit": init_vit(keys[1], cfg.vit),
        "image_vit": init_vit(keys[2], cfg.vit),
        "upsample_latent0": upsample(d, df, 3, int_dim=dims[0]),
        "upsample_latent1": upsample(d, dims[0], 2),
        "upsample0": upsample(d, dims[1], 1),
        "upsample1": upsample(d, dims[2], 1),
        "upsample2": upsample(d, dims[3], 1),
        "upsample_lowres": {"w": deconv_w(next(k), d, dims[3]), "b": jnp.zeros((dims[3],))},
        "fuse_lowres": {"w": conv_w(next(k), 1, 1, 2 * dims[3], dims[3]), "b": jnp.zeros((dims[3],))},
    }

    dec_dims = (df,) + tuple(dims)

    def fusion(key, deconv):
        kk = iter(jax.random.split(key, 8))
        def res():
            return {
                "w1": conv_w(next(kk), 3, 3, df, df), "b1": jnp.zeros((df,)),
                "w2": conv_w(next(kk), 3, 3, df, df), "b2": jnp.zeros((df,)),
            }
        return {
            "res1": res(), "res2": res(),
            "deconv_w": deconv_w(next(kk), df, df) if deconv else None,
            "out": {"w": conv_w(next(kk), 1, 1, df, df), "b": jnp.zeros((df,))},
        }

    dec = {
        "convs": [None] + [conv_w(next(k), 3, 3, dim, df) for dim in dec_dims[1:]],
        "fusions": [fusion(next(k), deconv=(i != 0)) for i in range(len(dec_dims))],
    }

    head = {
        "conv_in": {"w": conv_w(next(k), 3, 3, df, df // 2), "b": jnp.zeros((df // 2,))},
        "deconv": {"w": deconv_w(next(k), df // 2, df // 2), "b": jnp.zeros((df // 2,))},
        "conv_mid": {"w": conv_w(next(k), 3, 3, df // 2, 32), "b": jnp.zeros((32,))},
        "conv_out": {"w": conv_w(next(k), 1, 1, 32, 1), "b": jnp.zeros((1,))},
    }

    params = {"encoder": enc, "decoder": dec, "head": head}
    if cfg.use_fov_head:
        params["fov"] = {
            "vit": init_vit(keys[3], cfg.vit),
            "proj": {"w": (jax.random.normal(next(k), (d, df // 2)) * d**-0.5).astype(jnp.float32),
                     "b": jnp.zeros((df // 2,))},
            "down": {"w": conv_w(next(k), 3, 3, df, df // 2), "b": jnp.zeros((df // 2,))},
            # final valid conv consumes the full remaining grid (6x6 for
            # the 24-token grid, `fov.py:45`; grid//4 in general)
            "head": [
                {"w": conv_w(next(k), 3, 3, df // 2, df // 4), "b": jnp.zeros((df // 4,))},
                {"w": conv_w(next(k), 3, 3, df // 4, df // 8), "b": jnp.zeros((df // 8,))},
                {"w": conv_w(next(k), max(cfg.vit.grid_size // 4, 1), max(cfg.vit.grid_size // 4, 1), df // 8, 1),
                 "b": jnp.zeros((1,))},
            ],
        }
    return params


# ---------------------------------------------------------------------------
# public API


class DepthPro:
    """Resident compiled Depth Pro model.

    Unlike the reference's per-frame model rebuild
    (`pointcloud_cleaner.py:50-124`), one instance holds device-resident
    params and caches jitted programs per input signature.
    """

    def __init__(self, params: dict, cfg: DepthProConfig,
                 precision: Precision = Precision.fp32(),
                 attn_impl: str | None = None):
        if "folded_wcomp" not in params.get("head", {}):
            params = fold_head_params(params)
        self.params = params
        self.cfg = cfg
        self.precision = precision
        self.attn_impl = attn_impl
        self._jit_cache: dict = {}

    @property
    def img_size(self) -> int:
        return self.cfg.img_size

    def _get_jitted(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def forward(self, x: jnp.ndarray):
        """(B, img, img, 3) -> (canonical inverse depth, fov_deg)."""
        fn = self._get_jitted(
            ("forward",),
            lambda p, xx: forward(p, xx, self.cfg, self.precision, self.attn_impl),
        )
        return fn(self.params, x)

    def infer(self, x, f_px=None, interpolation_mode: str = "bilinear") -> dict:
        """Depth inference on (H, W, 3) or (B, H, W, 3) normalized input.

        Also accepts torch-style (3, H, W) / (B, 3, H, W) for drop-in
        compatibility with reference callers (`depth_pro.py:243-269`).
        Returns {"depth", "focallength_px"} with the batch dim squeezed
        when the input was unbatched.
        """
        x = jnp.asarray(x)
        chw = x.shape[-1] != 3 and x.shape[-3] == 3
        if not chw and x.shape[-3] == 3 and x.shape[-2] != 3:
            # (3, H, 3)-shaped input is genuinely ambiguous between CHW
            # with W=3 and HWC with H=3; we assume HWC — say so
            logging.getLogger(__name__).warning(
                "ambiguous input shape %s: assuming HWC (channels-last); "
                "pass channels-last explicitly to silence", x.shape)
        if chw:
            x = jnp.moveaxis(x, -3, -1)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        has_f = f_px is not None
        if has_f:
            f_arr = jnp.atleast_1d(jnp.asarray(f_px, jnp.float32))
            f_arr = jnp.broadcast_to(f_arr, (x.shape[0],))
        mode = interpolation_mode
        key = ("infer", x.shape, has_f, mode)
        fn = self._get_jitted(
            key,
            (lambda p, xx, ff: infer_fn(p, xx, ff, self.cfg, self.precision, self.attn_impl, mode))
            if has_f
            else (lambda p, xx: infer_fn(p, xx, None, self.cfg, self.precision, self.attn_impl, mode)),
        )
        out = fn(self.params, x, f_arr) if has_f else fn(self.params, x)
        if squeeze:
            out = {"depth": out["depth"][0], "focallength_px": out["focallength_px"][0]}
        return out


def _make_transform(precision: Precision):
    """Equivalent of the reference transform stack (`depth_pro.py:125-132`):
    uint8 HWC -> fp32 [0,1] -> Normalize(0.5, 0.5) -> compute dtype
    (the reference's ConvertImageDtype stage; also halves the transfer
    in bf16 mode)."""

    def transform(img: np.ndarray) -> jnp.ndarray:
        arr = np.asarray(img)
        x = arr.astype(np.float32)
        if arr.dtype == np.uint8:
            x = x / 255.0
        x = (x - 0.5) / 0.5
        return jnp.asarray(x, dtype=precision.compute_dtype)

    return transform


def load_checkpoint(cfg: DepthProConfig):
    """Load converted params for ``cfg.checkpoint_uri``. Accepts our .npz
    or a reference .pt (converted on the fly)."""
    uri = cfg.checkpoint_uri
    if uri is None or not os.path.exists(uri):
        return None
    if uri.endswith(".pt") or uri.endswith(".pth"):
        import torch

        from ..ckpt.convert import convert_depth_pro

        sd = torch.load(uri, map_location="cpu", weights_only=True)
        return convert_depth_pro(sd, cfg)
    from ..ckpt.convert import load_params

    return load_params(uri)


def create_model_and_transforms(
    config: DepthProConfig = DEFAULT_MONODEPTH_CONFIG,
    device=None,
    precision="fp32",
    attn_impl: str | None = None,
    rng_seed: int = 0,
):
    """Create a DepthPro model + input transform (public API parity with
    `depth_pro.py:72-151`, including the ``device``/``precision``
    arguments). Loads ``config.checkpoint_uri`` when present; otherwise
    random-initializes (with a warning) so the pipeline runs in
    checkpoint-less environments.
    """
    prec = resolve_precision(precision)
    params = load_checkpoint(config)
    if params is None:
        if config.checkpoint_uri is not None:
            LOGGER.warning(
                "Checkpoint %s not found; using random init.", config.checkpoint_uri
            )
        params = init_depth_pro(jax.random.PRNGKey(rng_seed), config)
    if device is not None:
        params = jax.device_put(params, device)
    else:
        params = jax.tree.map(jnp.asarray, params)
    model = DepthPro(params, config, prec, attn_impl)
    return model, _make_transform(prec)
