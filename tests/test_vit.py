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
