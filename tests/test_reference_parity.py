"""Parity against the ACTUAL reference torch modules.

Round-1 parity was anchored to `torch_oracle.py`, a hand-written mirror.
These tests remove that single point of failure: the real
`DepthProEncoder`/`MultiresConvDecoder`/`FOVNetwork`/`DepthPro` classes
from `/root/reference/src/depth_pro` are instantiated with a tiny
timm-layout stub backbone, their state dict feeds `ckpt/convert.py`
unmodified, and the JAX model is compared against their forward/infer
outputs at the real topology (backbone 384/grid 24, input 1536).
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.ckpt.convert import convert_depth_pro
from ml_depth_pro_video_tpu.models.depth_pro import forward, infer_fn, tiny_config

from reference_modules import build_reference_model
from torch_oracle import TorchDepthPro


def _grid24_config(use_fov_head=True):
    """Tiny channel dims at the REAL spatial topology (the reference
    encoder hardcodes 384px patches / merge paddings 3 and 6,
    `encoder.py:176,279-302`, so grid must be 24 and input 1536)."""
    cfg = tiny_config(use_fov_head=use_fov_head)
    return dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, img_size=384, patch_size=16, embed_dim=32),
    )


CFG = _grid24_config()


@pytest.fixture(scope="module")
def ref_pair():
    torch.manual_seed(7)
    model = build_reference_model(CFG)
    params = jax.tree.map(jnp.asarray, convert_depth_pro(model.state_dict(), CFG))
    return model, params


def test_oracle_state_dict_layout_matches_reference(ref_pair):
    """The hand-written oracle's key layout == the real module tree's —
    this license lets the fast tiny-scale tests keep using the oracle."""
    model, _ = ref_pair
    torch.manual_seed(0)
    oracle = TorchDepthPro(CFG)
    ref_keys = set(model.state_dict().keys())
    oracle_keys = set(oracle.state_dict().keys())
    assert ref_keys == oracle_keys
    for k in ref_keys:
        assert tuple(model.state_dict()[k].shape) == tuple(oracle.state_dict()[k].shape), k


@pytest.mark.slow
def test_forward_parity_vs_reference_modules(ref_pair):
    model, params = ref_pair
    rng = np.random.default_rng(21)
    x = rng.standard_normal((1, 3, CFG.img_size, CFG.img_size)).astype(np.float32)
    with torch.no_grad():
        t_canon, t_fov = model(torch.from_numpy(x))
    j_canon, j_fov = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), CFG)
    np.testing.assert_allclose(
        np.asarray(j_canon)[..., 0], t_canon.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_fov), t_fov.numpy().reshape(-1), rtol=1e-3, atol=1e-4
    )


def test_infer_parity_vs_reference_modules(ref_pair):
    """infer() contract vs the reference implementation
    (`depth_pro.py:243-298`): resize to 1536, f_px derivation from the
    estimated FOV with the ORIGINAL width, resize back, clamp."""
    model, params = ref_pair
    rng = np.random.default_rng(22)
    x = rng.standard_normal((1, 3, 460, 620)).astype(np.float32)
    t_out = model.infer(torch.from_numpy(x))
    j_out = infer_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)), None, CFG)
    np.testing.assert_allclose(
        np.asarray(j_out["focallength_px"]).reshape(()),
        t_out["focallength_px"].numpy(),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["depth"])[0], t_out["depth"].numpy(), rtol=2e-3, atol=1e-6
    )


@pytest.mark.slow
def test_infer_parity_vs_reference_modules_given_fpx(ref_pair):
    model, params = ref_pair
    rng = np.random.default_rng(23)
    x = rng.standard_normal((1, 3, CFG.img_size, CFG.img_size)).astype(np.float32)
    t_out = model.infer(torch.from_numpy(x), f_px=torch.tensor(777.0))
    j_out = infer_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.array([777.0]), CFG)
    np.testing.assert_allclose(
        np.asarray(j_out["depth"])[0], t_out["depth"].numpy(), rtol=1e-3, atol=1e-6
    )


def test_real_tree_convert_npz_roundtrip(ref_pair, tmp_path):
    """The converted REAL module tree survives the npz save/load used by
    checkpoint deployment (ckpt/convert.py::save_params/load_params)."""
    import numpy as np

    from ml_depth_pro_video_tpu.ckpt.convert import load_params, save_params

    _, params = ref_pair
    path = str(tmp_path / "real_tree.npz")
    save_params(path, jax.tree.map(lambda a: np.asarray(a), params))
    loaded = load_params(path)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b[jax.tree_util.keystr(k)])


def _timm_dinov2_expected_shapes(d=1024, depth=24, grid=24, mlp_ratio=4):
    """Key->shape schema of timm `vit_large_patch14_dinov2` after the
    reference's 14->16 / 518->384 resample — the exact backbone subtree
    layout `depth_pro.pt` stores (see the audit note in ckpt/convert.py)."""
    exp = {
        "cls_token": (1, 1, d),
        "pos_embed": (1, grid * grid + 1, d),
        "patch_embed.proj.weight": (d, 3, 16, 16),
        "patch_embed.proj.bias": (d,),
        "norm.weight": (d,),
        "norm.bias": (d,),
    }
    for i in range(depth):
        p = f"blocks.{i}."
        exp.update({
            p + "norm1.weight": (d,), p + "norm1.bias": (d,),
            p + "attn.qkv.weight": (3 * d, d), p + "attn.qkv.bias": (3 * d,),
            p + "attn.proj.weight": (d, d), p + "attn.proj.bias": (d,),
            p + "ls1.gamma": (d,),
            p + "norm2.weight": (d,), p + "norm2.bias": (d,),
            p + "mlp.fc1.weight": (mlp_ratio * d, d), p + "mlp.fc1.bias": (mlp_ratio * d,),
            p + "mlp.fc2.weight": (d, mlp_ratio * d), p + "mlp.fc2.bias": (d,),
            p + "ls2.gamma": (d,),
        })
    return exp


def test_stub_backbone_matches_timm_dinov2_layout():
    """Audit the hand-written stub backbone's timm-style key naming
    against the documented `vit_large_patch14_dinov2` schema at FULL
    ViT-L dimensions (VERDICT r2 missing #1b). Quirks asserted: ls{1,2}
    .gamma LayerScale naming, pos_embed includes the cls slot, and no
    reg_token / q_norm / k_norm / head / fc_norm keys (DINOv2 preset has
    no registers and num_classes=0; fc_norm only ever appears model-side
    and is exempted by the reference load, `depth_pro.py:141-147`)."""
    from ml_depth_pro_video_tpu.models.vit import ViTConfig

    from reference_modules import StubTimmBackbone

    expected = _timm_dinov2_expected_shapes()
    sd = StubTimmBackbone(ViTConfig()).state_dict()
    assert set(sd) == set(expected)
    for k, shape in expected.items():
        assert tuple(sd[k].shape) == shape, k
    forbidden = ("reg_token", "q_norm", "k_norm", "fc_norm", "head.")
    assert not [k for k in sd if any(f in k for f in forbidden)]


@pytest.mark.skipif(
    "RUN_SLOW" not in __import__("os").environ,
    reason="full-ViT-L-dims parity is minutes-long on one CPU core; RUN_SLOW=1",
)
def test_full_dims_forward_parity_vs_reference_modules():
    """Weights-day derisk (VERDICT r2 missing #1a): instantiate the REAL
    reference module tree at FULL flagship dimensions (embed 1024, depth
    24, heads 16, decoder 256 — `vit_factory.py:53-65`, `depth_pro.py:
    26-46`) with random init, push its state dict through ckpt/convert.py
    unmodified, and compare one fp32 forward at 1536^2. Catches any
    dim-dependent converter/layout bug (head packing, deconv reshape,
    per-head qkv reorder) that the tiny-dims tests cannot see. The
    infer() wrapper math on top of forward is dimension-independent and
    is covered at tiny dims above."""
    import dataclasses as _dc

    from ml_depth_pro_video_tpu.models.depth_pro import DEFAULT_MONODEPTH_CONFIG

    cfg = _dc.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
    torch.manual_seed(11)
    model = build_reference_model(cfg)
    params = jax.tree.map(jnp.asarray, convert_depth_pro(model.state_dict(), cfg))
    rng = np.random.default_rng(31)
    x = rng.standard_normal((1, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    with torch.no_grad():
        t_canon, t_fov = model(torch.from_numpy(x))
    j_canon, j_fov = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(
        np.asarray(j_fov), t_fov.numpy().reshape(-1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_canon)[..., 0], t_canon.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )


def test_convert_rejects_unconsumed_keys(ref_pair):
    """Strict conversion (reference loads strict both ways,
    `depth_pro.py:136-149`): an extra tensor in the checkpoint raises
    instead of being silently dropped."""
    import pytest
    import torch

    from ml_depth_pro_video_tpu.ckpt.convert import convert_depth_pro

    model, _ = ref_pair
    sd = dict(model.state_dict())
    sd["encoder.some_future_module.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="not consumed"):
        convert_depth_pro(sd, CFG)
