"""ViT backbone parity vs a timm-style torch ViT (the reference backbone
semantics: pre-norm blocks, LayerScale, exact GELU, eps=1e-6, final norm).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from torch_oracle import TorchViT

from ml_depth_pro_video_tpu.ckpt.convert import (
    convert_vit,
    load_params,
    resample_patch_embed,
    save_params,
)
from ml_depth_pro_video_tpu.models.vit import ViTConfig, init_vit, vit_apply

CFG = ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=3, num_heads=4, mlp_ratio=2)


@pytest.fixture(scope="module")
def torch_vit():
    torch.manual_seed(0)
    m = TorchViT(CFG)
    # Randomize LayerScale so it's a real parity check.
    with torch.no_grad():
        for blk in m.blocks:
            blk.ls1["gamma"].copy_(torch.rand_like(blk.ls1["gamma"]) * 0.1)
            blk.ls2["gamma"].copy_(torch.rand_like(blk.ls2["gamma"]) * 0.1)
    return m.eval()


def test_vit_forward_and_captures_match_torch(torch_vit):
    sd = {k: v for k, v in torch_vit.state_dict().items()}
    params = convert_vit(sd, "", CFG)
    x = np.random.default_rng(1).standard_normal((2, 3, CFG.img_size, CFG.img_size)).astype(np.float32)
    with torch.no_grad():
        t_out, t_caps = torch_vit(torch.from_numpy(x), capture=(0, 1))
    j_out, j_caps = vit_apply(
        {k: jnp.asarray(v) if not isinstance(v, dict) else v for k, v in params.items()},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        CFG,
        capture_blocks=(0, 1),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), rtol=2e-4, atol=2e-4)
    assert len(j_caps) == 2
    for jc, tc in zip(j_caps, t_caps):
        np.testing.assert_allclose(np.asarray(jc), tc.numpy(), rtol=2e-4, atol=2e-4)


def test_param_roundtrip(tmp_path, torch_vit):
    sd = torch_vit.state_dict()
    params = convert_vit(sd, "", CFG)
    path = str(tmp_path / "vit.npz")
    save_params(path, {"vit": params, "lst": [np.ones(3), None]})
    loaded = load_params(path)
    np.testing.assert_array_equal(loaded["vit"]["blocks"]["qkv_w"], params["blocks"]["qkv_w"])
    assert loaded["lst"][1] is None
    np.testing.assert_array_equal(loaded["lst"][0], np.ones(3))


def test_resample_patch_embed_matches_reference_semantics():
    """kernel 14->16 bicubic + magnitude rescale (vit.py:85-93)."""
    w = np.random.default_rng(2).standard_normal((4, 3, 14, 14)).astype(np.float32)
    out = resample_patch_embed(w, 16)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(w), size=(16, 16), mode="bicubic", align_corners=False
    ).numpy() * (14 / 16) * (14 / 16)
    np.testing.assert_allclose(out, t, rtol=1e-4, atol=1e-5)


def test_init_vit_shapes():
    import jax

    params = init_vit(jax.random.PRNGKey(0), CFG)
    assert params["blocks"]["qkv_w"].shape == (CFG.depth, CFG.embed_dim, 3 * CFG.embed_dim)
    assert params["pos_embed"].shape == (1, CFG.num_tokens, CFG.embed_dim)
    out, caps = vit_apply(params, jnp.zeros((1, 32, 32, 3)), CFG, capture_blocks=(1,))
    assert out.shape == (1, CFG.num_tokens, CFG.embed_dim)
    assert len(caps) == 1


def test_weight_only_quantization_close_to_fp32():
    import jax

    from ml_depth_pro_video_tpu.ckpt.quantize import quantize_vit_weights

    cfg = CFG
    params = init_vit(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 32, 32, 3)), jnp.float32)
    ref, _ = vit_apply(params, x, cfg)
    fake_model = {"encoder": {"patch_vit": params, "image_vit": params}}
    qparams = quantize_vit_weights(fake_model)["encoder"]["patch_vit"]
    assert qparams["blocks"]["qkv_w"]["q"].dtype == jnp.int8
    got, _ = vit_apply(qparams, x, cfg)
    rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.02, rel


# ---------------------------------------------------------------------------
# token merging (ToMe speed tier)


def test_token_merge_roundtrip_properties():
    """compute_token_merge/unmerge_tokens invariants: cls is never
    merged, kept tokens survive exactly, merged positions receive the
    mean of their pair, shapes are static (S - r)."""
    import jax

    from ml_depth_pro_video_tpu.models.vit import compute_token_merge, unmerge_tokens

    rng = np.random.default_rng(0)
    b, s, d = 3, 17, 8  # 16 patch tokens: na=8, nb=8
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    ratio = 0.25  # r = 4
    merged, gmap, log_sizes = compute_token_merge(x, ratio)
    r = 4
    assert merged.shape == (b, s - r, d)
    assert gmap.shape == (b, s)
    full = unmerge_tokens(merged, gmap)
    assert full.shape == (b, s, d)
    # cls exact
    np.testing.assert_array_equal(np.asarray(full[:, 0]), np.asarray(x[:, 0]))
    # every unmerged position is either its original value (kept) or a
    # 2+-token mean; at most 2*r positions may deviate
    diff = np.abs(np.asarray(full) - np.asarray(x)).max(axis=-1)
    assert (diff > 1e-6).sum(axis=1).max() <= 2 * r
    # B tokens that received no merge are exact: at least nb - r of them
    b_pos = 2 + 2 * np.arange(8)
    exact_b = (diff[:, b_pos] < 1e-6).sum(axis=1)
    assert (exact_b >= 8 - r).all()


def test_token_merge_duplicates_are_lossless():
    """Identical A/B pairs merge losslessly: mean(t, t) == t."""
    from ml_depth_pro_video_tpu.models.vit import compute_token_merge, unmerge_tokens

    rng = np.random.default_rng(1)
    base = rng.standard_normal((1, 9, 4)).astype(np.float32)
    # make each A token (odd positions 1,3,5,7) equal its B neighbor
    x = base.copy()
    for a, bb in ((1, 2), (3, 4), (5, 6), (7, 8)):
        x[:, a] = x[:, bb]
    merged, gmap, _ = compute_token_merge(jnp.asarray(x), 0.5)  # r = 4 = all of A
    full = unmerge_tokens(merged, gmap)
    np.testing.assert_allclose(np.asarray(full), x, rtol=1e-6, atol=1e-6)


def test_token_merge_full_a_set_edge():
    """ratio large enough to merge the WHOLE A set (kept set empty)."""
    from ml_depth_pro_video_tpu.models.vit import compute_token_merge, unmerge_tokens

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 17, 8)).astype(np.float32))
    merged, gmap, _ = compute_token_merge(x, 0.99)  # r = min(15, na=8) = 8
    assert merged.shape == (2, 9, 8)  # cls + 8 b tokens
    assert unmerge_tokens(merged, gmap).shape == (2, 17, 8)


def test_vit_apply_merge_preserves_shapes_and_bounds_deviation():
    """vit_apply with the merge tier returns full-length captures and
    final tokens; deviation vs exact is finite and nonzero (it IS an
    approximation), and shrinks as the ratio drops."""
    import jax

    from ml_depth_pro_video_tpu.models.vit import init_vit

    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=4, mlp_ratio=2)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    exact, caps_e = vit_apply(params, x, cfg, capture_blocks=(1, 2))
    devs = []
    for ratio in (0.5, 0.25):
        fast, caps_f = vit_apply(params, x, cfg, capture_blocks=(1, 2),
                                 merge_ratio=ratio, merge_block=2)
        assert fast.shape == exact.shape
        assert all(cf.shape == ce.shape for cf, ce in zip(caps_f, caps_e))
        assert np.isfinite(np.asarray(fast)).all()
        # capture at block 1 precedes the merge point -> EXACT
        np.testing.assert_allclose(np.asarray(caps_f[0]), np.asarray(caps_e[0]),
                                   rtol=1e-5, atol=1e-5)
        dev = float(jnp.abs(fast - exact).mean() / (jnp.abs(exact).mean() + 1e-9))
        devs.append(dev)
    # nonzero (it IS an approximation) and bounded; strict monotonicity
    # in the ratio is NOT guaranteed by ToMe, so not asserted
    assert all(0.0 < d < 10.0 for d in devs)


def test_infer_fn_speed_fast_runs_tiny():
    """apply_speed plumbs the merge tier through infer_fn end to end."""
    import jax

    from ml_depth_pro_video_tpu.models.depth_pro import (
        apply_speed,
        infer_fn,
        init_depth_pro,
        tiny_config,
    )

    cfg = apply_speed(tiny_config(), "fast")
    assert cfg.token_merge_ratio > 0
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    out = infer_fn(params, x, None, cfg)
    assert out["depth"].shape == (1, cfg.img_size, cfg.img_size)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_token_merge_noop_ratio_is_exact():
    """Regression (round-3 review): a ratio too small to merge one token
    (int(ratio*n) < 1) must leave the forward EXACTLY equal to the exact
    path — the failed-merge state must not rewind the block cursor and
    re-apply blocks at the next capture point."""
    import jax

    from ml_depth_pro_video_tpu.models.vit import init_vit

    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=6, num_heads=4, mlp_ratio=2)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    exact, caps_e = vit_apply(params, x, cfg, capture_blocks=(2, 4))
    noop, caps_n = vit_apply(params, x, cfg, capture_blocks=(2, 4),
                             merge_ratio=0.05, merge_block=1)  # r = int(.05*16) = 0
    np.testing.assert_array_equal(np.asarray(noop), np.asarray(exact))
    for a, b in zip(caps_n, caps_e):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_after_last_block_is_skipped():
    """Regression (round-3 review): merge_block >= depth would merge
    AFTER the final block — pure quality loss, zero compute saved — and
    must be skipped entirely."""
    import jax

    from ml_depth_pro_video_tpu.models.vit import init_vit

    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=4, mlp_ratio=2)
    params = init_vit(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    exact, _ = vit_apply(params, x, cfg)
    out, _ = vit_apply(params, x, cfg, merge_ratio=0.5, merge_block=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exact))
    # ... while a merge point with blocks remaining does approximate
    out2, _ = vit_apply(params, x, cfg, merge_ratio=0.5, merge_block=1)
    assert np.abs(np.asarray(out2) - np.asarray(exact)).max() > 0


def test_token_merge_log_sizes():
    """log_sizes: cls/kept-A are log(1)=0; each B token's size is 1 +
    (number of A tokens merged into it); sum of sizes == original count."""
    from ml_depth_pro_video_tpu.models.vit import compute_token_merge

    rng = np.random.default_rng(4)
    b, s, d = 2, 17, 8
    x = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    merged, gmap, log_sizes = compute_token_merge(x, 0.25)  # r = 4
    sizes = np.exp(np.asarray(log_sizes))
    assert log_sizes.shape == merged.shape[:2]
    np.testing.assert_allclose(sizes[:, :1 + 8 - 4], 1.0, atol=1e-6)
    # total represented tokens = original patch+cls count
    np.testing.assert_allclose(sizes.sum(axis=1), s, rtol=1e-6)


def test_proportional_attention_bias_equals_duplicate_keys():
    """The per-key log-size bias must make attention over a merged
    sequence EXACTLY equal attention over the sequence with that key
    physically duplicated size-times (the identity proportional
    attention rests on: exp(s + log n) = n * exp(s))."""
    from ml_depth_pro_video_tpu.ops.attention import xla_attention_packed

    rng = np.random.default_rng(5)
    b, s, nh, hd = 1, 6, 2, 4
    d = nh * hd
    qkv = rng.standard_normal((b, s, 3 * d)).astype(np.float32)

    # duplicate key/value of token 3 (sequence s+1, query set unchanged):
    # attention FROM each original query must match the biased version.
    dup = np.concatenate([qkv, qkv[:, 3:4]], axis=1)
    out_dup = np.asarray(xla_attention_packed(jnp.asarray(dup), nh))[:, :s]

    bias = np.zeros((b, s), np.float32)
    bias[:, 3] = np.log(2.0)
    out_bias = np.asarray(
        xla_attention_packed(jnp.asarray(qkv), nh, key_bias=jnp.asarray(bias)))

    # query rows other than the duplicated token's own row see identical
    # distributions; row 3 differs only through its own (identical) value
    np.testing.assert_allclose(out_bias, out_dup, rtol=1e-5, atol=1e-6)


def test_vit_apply_merge_proportional_attention_changes_output():
    """With merging active the proportional-attention bias is applied
    (output differs from a bias-less merged pass) and stays finite."""
    import unittest.mock as mock

    import jax

    from ml_depth_pro_video_tpu.models import vit as vit_mod
    from ml_depth_pro_video_tpu.models.vit import init_vit

    cfg = ViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=4,
                    num_heads=4, mlp_ratio=2)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    with_bias, _ = vit_mod.vit_apply(params, x, cfg, merge_ratio=0.5)

    orig = vit_mod.compute_token_merge

    def no_sizes(tokens, ratio):
        m = orig(tokens, ratio)
        if m is None:
            return None
        return m[0], m[1], jnp.zeros_like(m[2])  # zero bias

    with mock.patch.object(vit_mod, "compute_token_merge", no_sizes):
        no_bias, _ = vit_mod.vit_apply(params, x, cfg, merge_ratio=0.5)

    assert np.isfinite(np.asarray(with_bias)).all()
    assert np.abs(np.asarray(with_bias) - np.asarray(no_bias)).max() > 1e-6
