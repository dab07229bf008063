"""DINOv2-style ViT backbone, TPU-native.

Replaces the reference's timm ViT-L + forward-hook machinery
(`/root/reference/src/depth_pro/network/vit.py:13-35`,
`encoder.py:132-144`): instead of hooks on blocks {5, 11}, the forward
pass is split into scan segments at the capture points and returns the
intermediate token maps explicitly, in one traced program.

Architecture (preset ``dinov2l16_384`` after the reference's offline
patch-embed 14->16 / pos-embed 518->384 resampling,
`vit_factory.py:53-65`): patch embed conv 16x16/s16 (expressed as
patchify + matmul, which is MXU-shaped), cls token, learned pos embed,
24 pre-norm blocks with LayerScale, exact GELU, eps=1e-6 LayerNorms,
and a final LayerNorm (timm ``forward_features`` semantics).

Block parameters are stacked along a leading depth axis and consumed by
``lax.scan`` — one compiled block body instead of 24 unrolled copies.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.precision import Precision
from ..ops.attention import attention_packed
from ..ops.norm import layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT backbone configuration (default: dinov2l16_384)."""

    img_size: int = 384
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid_size * self.grid_size + 1


# preset registry (parity with the reference's VIT_CONFIG_DICT,
# `network/vit_factory.py:53-65`; the timm 518/14 -> 384/16 resampling
# happens offline in ckpt/convert.py)
VIT_CONFIG_DICT = {
    "dinov2l16_384": ViTConfig(
        img_size=384, patch_size=16, embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4
    ),
    # DINOv2 base/small at the same 384/16 geometry — backbones for the
    # smaller Depth Pro family (models/depth_pro.py::model_preset).
    # No public Depth Pro checkpoint exists for these; they are
    # fine-tune/distillation targets (train/distill.py). timm dinov2
    # vit_base/vit_small checkpoints convert through the same
    # ckpt/convert.py schema (key names are size-independent).
    "dinov2b16_384": ViTConfig(
        img_size=384, patch_size=16, embed_dim=768, depth=12, num_heads=12, mlp_ratio=4
    ),
    "dinov2s16_384": ViTConfig(
        img_size=384, patch_size=16, embed_dim=384, depth=12, num_heads=6, mlp_ratio=4
    ),
}


def init_vit(rng: jax.Array, cfg: ViTConfig) -> dict:
    """Random-init ViT params (trunc-normal-free simple init; real use
    loads converted reference weights)."""
    d, l = cfg.embed_dim, cfg.depth
    p3 = cfg.patch_size * cfg.patch_size * 3
    hidden = cfg.mlp_ratio * d
    keys = jax.random.split(rng, 8)

    def nrm(key, shape, scale):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(jnp.float32)

    return {
        "patch_embed": {"w": nrm(keys[0], (p3, d), p3**-0.5), "b": jnp.zeros((d,))},
        "cls_token": nrm(keys[1], (1, 1, d), 0.02),
        "pos_embed": nrm(keys[2], (1, cfg.num_tokens, d), 0.02),
        "blocks": {
            "ln1_g": jnp.ones((l, d)),
            "ln1_b": jnp.zeros((l, d)),
            "qkv_w": nrm(keys[3], (l, d, 3 * d), d**-0.5),
            "qkv_b": jnp.zeros((l, 3 * d)),
            "proj_w": nrm(keys[4], (l, d, d), d**-0.5),
            "proj_b": jnp.zeros((l, d)),
            "ls1": jnp.full((l, d), 1e-5),
            "ln2_g": jnp.ones((l, d)),
            "ln2_b": jnp.zeros((l, d)),
            "fc1_w": nrm(keys[5], (l, d, hidden), d**-0.5),
            "fc1_b": jnp.zeros((l, hidden)),
            "fc2_w": nrm(keys[6], (l, hidden, d), hidden**-0.5),
            "fc2_b": jnp.zeros((l, d)),
            "ls2": jnp.full((l, d), 1e-5),
        },
        "norm": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, S, S, 3) -> (B, G*G, patch*patch*3), (kh, kw, c)-ordered."""
    b, h, w, c = x.shape
    g_h, g_w = h // patch, w // patch
    x = x.reshape(b, g_h, patch, g_w, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g_h * g_w, patch * patch * c)


def _block(x: jnp.ndarray, bp: dict, cfg: ViTConfig, attn_impl: str | None,
           key_bias: jnp.ndarray | None = None) -> jnp.ndarray:
    from ..ckpt.quantize import materialize_weight as _w

    b, s, d = x.shape
    nh = cfg.num_heads
    cdt = x.dtype

    h = layer_norm(x, bp["ln1_g"], bp["ln1_b"], cfg.layer_norm_eps)
    qkv = jnp.dot(h, _w(bp["qkv_w"], cdt), preferred_element_type=cdt) + bp["qkv_b"].astype(cdt)
    attn = attention_packed(qkv, nh, impl=attn_impl, key_bias=key_bias)
    attn = jnp.dot(attn, _w(bp["proj_w"], cdt), preferred_element_type=cdt) + bp["proj_b"].astype(cdt)
    x = x + bp["ls1"].astype(cdt) * attn

    h = layer_norm(x, bp["ln2_g"], bp["ln2_b"], cfg.layer_norm_eps)
    h = jnp.dot(h, _w(bp["fc1_w"], cdt), preferred_element_type=cdt) + bp["fc1_b"].astype(cdt)
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, _w(bp["fc2_w"], cdt), preferred_element_type=cdt) + bp["fc2_b"].astype(cdt)
    return x + bp["ls2"].astype(cdt) * h


def _scan_blocks(x, stacked, lo, hi, cfg, attn_impl, remat=False,
                 key_bias=None):
    """Run blocks [lo, hi) via lax.scan over the stacked param axis.

    ``remat=True`` checkpoints each block (activations rematerialized in
    the backward pass — O(sqrt) memory for training at 1536px).
    ``key_bias`` (B, S): per-key attention score bias applied in every
    block of the segment (ToMe proportional attention)."""
    if hi == lo:
        return x
    seg = jax.tree.map(lambda a: a[lo:hi], stacked)
    block = _block
    if remat:
        block = jax.checkpoint(_block, static_argnums=(2, 3))

    def body(carry, bp):
        return block(carry, bp, cfg, attn_impl, key_bias), None

    x, _ = jax.lax.scan(body, x, seg)
    return x


# ---------------------------------------------------------------------------
# token merging (ToMe-style approximation speed tier)


def compute_token_merge(tokens: jnp.ndarray, ratio: float):
    """Bipartite soft matching over the patch tokens (ToMe, Bolya et al.
    ICLR 2023 — see PAPERS.md; cls token protected).

    Patch tokens alternate into sets A/B; each A token's best cosine
    match in B is found, and the ``r = int(ratio * n_patch)`` most
    similar A tokens are merged (averaged) into their matches. Returns
    ``(merged_tokens (B, S-r, D), gather_map (B, S), log_sizes
    (B, S-r))`` where the gather map reconstructs a full-length sequence
    by duplicating each merged token back to its source positions and
    ``log_sizes`` is the log of how many original tokens each merged
    token represents — the per-key score bias of ToMe's PROPORTIONAL
    attention (round 4; the fused kernel takes it via
    `ops/attention.py::flash_attention_packed_bias`). ``None`` if r < 1.

    One deliberate deviation from the paper remains: similarity is
    measured on the tokens themselves (ToMeSD's choice; attention keys
    live inside the scanned block body).
    """
    b, s, d = tokens.shape
    n = s - 1
    na = (n + 1) // 2
    nb = n - na
    r = min(int(ratio * n), na)
    if r < 1 or nb < 1:
        return None

    xs = tokens[:, 1:]
    a, bb = xs[:, 0::2], xs[:, 1::2]
    an = a / (jnp.linalg.norm(a.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6)
    bn = bb / (jnp.linalg.norm(bb.astype(jnp.float32), axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum("bad,bcd->bac", an, bn, preferred_element_type=jnp.float32)
    best_val = jnp.max(sim, axis=-1)
    best_idx = jnp.argmax(sim, axis=-1)                      # (B, na)
    order = jnp.argsort(-best_val, axis=-1)                  # (B, na)
    merged_rank, kept_rank = order[:, :r], order[:, r:]

    dst = jnp.take_along_axis(best_idx, merged_rank, axis=1)  # (B, r)
    a_sel = jnp.take_along_axis(a, merged_rank[..., None], axis=1)
    batch = jnp.arange(b)[:, None]
    sum_b = bb.astype(jnp.float32).at[batch, dst].add(a_sel.astype(jnp.float32))
    cnt = jnp.ones((b, nb), jnp.float32).at[batch, dst].add(1.0)
    b_merged = (sum_b / cnt[..., None]).astype(tokens.dtype)
    a_kept = jnp.take_along_axis(a, kept_rank[..., None], axis=1)

    merged = jnp.concatenate([tokens[:, :1], a_kept, b_merged], axis=1)

    # inverse gather map: original position -> merged-sequence index
    a_pos = 1 + 2 * jnp.arange(na)
    b_pos = 2 + 2 * jnp.arange(nb)
    gmap = jnp.zeros((b, s), jnp.int32)
    gmap = gmap.at[batch, a_pos[kept_rank]].set(1 + jnp.arange(na - r, dtype=jnp.int32))
    gmap = gmap.at[batch, a_pos[merged_rank]].set((1 + (na - r) + dst).astype(jnp.int32))
    gmap = gmap.at[:, b_pos].set(1 + (na - r) + jnp.arange(nb, dtype=jnp.int32))

    # log token sizes for proportional attention: cls and kept-A tokens
    # represent themselves (log 1 = 0), each B token represents itself
    # plus whatever merged into it
    log_sizes = jnp.concatenate(
        [jnp.zeros((b, 1 + na - r), jnp.float32), jnp.log(cnt)], axis=1)
    return merged, gmap, log_sizes


def unmerge_tokens(tokens: jnp.ndarray, gmap: jnp.ndarray) -> jnp.ndarray:
    """(B, S-r, D) + gather map -> (B, S, D), duplicating merged tokens
    back to every source position."""
    return jnp.take_along_axis(tokens, gmap[..., None], axis=1)


def vit_apply(
    params: dict,
    x: jnp.ndarray,
    cfg: ViTConfig,
    precision: Precision = Precision.fp32(),
    capture_blocks: Sequence[int] = (),
    attn_impl: str | None = None,
    remat: bool = False,
    merge_ratio: float = 0.0,
    merge_block: int = 2,
) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Forward pass.

    Args:
      x: (B, img, img, 3) normalized image batch (NHWC).
      capture_blocks: 0-based block indices whose *outputs* to return
        (reference hooks capture after blocks 5 and 11,
        `encoder.py:133-138`).
      merge_ratio: > 0 enables the ToMe speed tier — after
        ``merge_block`` exact blocks, ``int(ratio * n_patch)`` tokens
        are merged away and the remaining blocks run on the shorter
        sequence; captures and the final tokens are unmerged back to
        full length (duplicated features in merged regions).

    Returns:
      (final tokens after the last LayerNorm, [captured token maps]),
      each (B, 1+G*G, D).
    """
    cdt = precision.compute_dtype
    b = x.shape[0]

    tokens = patchify(x.astype(cdt), cfg.patch_size)
    tokens = jnp.dot(tokens, params["patch_embed"]["w"].astype(cdt), preferred_element_type=cdt)
    tokens = tokens + params["patch_embed"]["b"].astype(cdt)
    cls = jnp.broadcast_to(params["cls_token"].astype(cdt), (b, 1, cfg.embed_dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + params["pos_embed"].astype(cdt)

    captures = []
    gmap = None
    key_bias = None
    lo = 0

    def merge_now(t):
        m = compute_token_merge(t, merge_ratio)
        return (t, None, None) if m is None else m

    # merge exactly once, and only if blocks remain afterwards (merging
    # after the last block would degrade output while saving nothing)
    mb = min(max(merge_block, 0), cfg.depth) if merge_ratio > 0.0 else None
    merge_pending = mb is not None and mb < cfg.depth
    for idx in sorted(capture_blocks):
        if merge_pending and mb <= idx:
            tokens = _scan_blocks(tokens, params["blocks"], lo, mb, cfg, attn_impl, remat)
            lo = mb
            tokens, gmap, key_bias = merge_now(tokens)
            merge_pending = False
        tokens = _scan_blocks(tokens, params["blocks"], lo, idx + 1, cfg, attn_impl,
                              remat, key_bias)
        captures.append(unmerge_tokens(tokens, gmap) if gmap is not None else tokens)
        lo = idx + 1
    if merge_pending and max(mb, lo) < cfg.depth:
        mb = max(mb, lo)
        tokens = _scan_blocks(tokens, params["blocks"], lo, mb, cfg, attn_impl, remat)
        lo = mb
        tokens, gmap, key_bias = merge_now(tokens)
    tokens = _scan_blocks(tokens, params["blocks"], lo, cfg.depth, cfg, attn_impl,
                          remat, key_bias)

    tokens = layer_norm(tokens, params["norm"]["g"], params["norm"]["b"], cfg.layer_norm_eps)
    if gmap is not None:
        tokens = unmerge_tokens(tokens, gmap)
    return tokens, captures


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
