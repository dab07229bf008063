"""End-to-end numerical parity: JAX DepthPro vs the torch oracle.

This is the BASELINE north-star check (<=1e-3 relative depth error vs a
torch fp32 reference) exercised at tiny scale with random weights —
every wiring detail (split/merge layout, hook captures, decoder fusion
order, FOV path, infer() math) must match for this to pass.
"""

import dataclasses
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.ckpt.convert import convert_depth_pro
from ml_depth_pro_video_tpu.models.depth_pro import (
    DepthPro,
    forward,
    infer_fn,
    tiny_config,
)
from torch_oracle import TorchDepthPro

CFG = tiny_config()


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = TorchDepthPro(CFG).eval()
    params = jax.tree.map(jnp.asarray, convert_depth_pro(oracle.state_dict(), CFG))
    return oracle, params


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).standard_normal((1, 3, h, w)).astype(np.float32)


def test_forward_parity(pair):
    oracle, params = pair
    x = _rand_img(CFG.img_size, CFG.img_size)
    with torch.no_grad():
        t_canon, t_fov = oracle(torch.from_numpy(x))
    j_canon, j_fov = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), CFG)
    np.testing.assert_allclose(
        np.asarray(j_canon)[..., 0], t_canon.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(j_fov), t_fov.numpy().reshape(-1), rtol=1e-3, atol=1e-4)


def test_infer_parity_with_resize_and_fpx_derivation(pair):
    oracle, params = pair
    x = _rand_img(140, 250, seed=3)
    t_out = oracle.infer(torch.from_numpy(x))
    j_out = infer_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)), None, CFG)
    np.testing.assert_allclose(
        np.asarray(j_out["focallength_px"]).reshape(()), t_out["focallength_px"].numpy(),
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(j_out["depth"])[0], t_out["depth"].numpy(), rtol=2e-3, atol=1e-6
    )


def test_infer_parity_given_fpx(pair):
    oracle, params = pair
    x = _rand_img(CFG.img_size, CFG.img_size, seed=4)
    t_out = oracle.infer(torch.from_numpy(x), f_px=torch.tensor(333.0))
    j_out = infer_fn(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.array([333.0]), CFG)
    np.testing.assert_allclose(
        np.asarray(j_out["depth"])[0], t_out["depth"].numpy(), rtol=1e-3, atol=1e-6
    )


def test_model_class_jit_cache(pair):
    _, params = pair
    model = DepthPro(params, CFG)
    x = jnp.asarray(_rand_img(64, 64, seed=5).transpose(0, 2, 3, 1))[0]
    o1 = model.infer(x)
    o2 = model.infer(x)
    assert len(model._jit_cache) == 1
    np.testing.assert_array_equal(np.asarray(o1["depth"]), np.asarray(o2["depth"]))
    assert o1["depth"].shape == (64, 64)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow: set RUN_SLOW=1")
def test_forward_parity_grid24():
    """Parity at the REAL token grid (24x24 -> merge paddings 3 and 6,
    `encoder.py:279-302`), with tiny channel dims to keep CPU time sane."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        vit=dataclasses.replace(cfg.vit, img_size=384, patch_size=16),
    )
    assert cfg.out_size == 24 and cfg.img_size == 1536
    torch.manual_seed(1)
    oracle = TorchDepthPro(cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_depth_pro(oracle.state_dict(), cfg))
    x = _rand_img(cfg.img_size, cfg.img_size, seed=11)
    with torch.no_grad():
        t_canon, t_fov = oracle(torch.from_numpy(x))
    j_canon, j_fov = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(
        np.asarray(j_canon)[..., 0], t_canon.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(j_fov), t_fov.numpy().reshape(-1), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_batched_infer_matches_per_frame(pair):
    """Batch-layout correctness: the 35-patch split/merge must not mix
    frames — infer on a 2-frame batch equals two single-frame infers."""
    _, params = pair
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, CFG.img_size, CFG.img_size, 3)).astype(np.float32)
    batched = infer_fn(params, jnp.asarray(x), None, CFG)
    for i in range(2):
        solo = infer_fn(params, jnp.asarray(x[i : i + 1]), None, CFG)
        np.testing.assert_allclose(
            np.asarray(batched["depth"][i]), np.asarray(solo["depth"][0]),
            rtol=2e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batched["focallength_px"][i]),
            np.asarray(solo["focallength_px"][0]), rtol=2e-5,
        )


def test_no_fov_config_parity():
    """use_fov_head=False path: conversion + forward parity (fov absent)."""
    cfg = dataclasses.replace(tiny_config(), use_fov_head=False)
    torch.manual_seed(2)
    oracle = TorchDepthPro(cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_depth_pro(oracle.state_dict(), cfg))
    assert "fov" not in params
    x = _rand_img(cfg.img_size, cfg.img_size, seed=6)
    with torch.no_grad():
        t_canon, t_fov = oracle(torch.from_numpy(x))
    j_canon, j_fov = forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    assert t_fov is None and j_fov is None
    np.testing.assert_allclose(
        np.asarray(j_canon)[..., 0], t_canon.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )


def test_split_patches_layout():
    """Each split tile equals the direct slice; patch-major batch order."""
    from ml_depth_pro_video_tpu.models.depth_pro import split_patches

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 512, 512, 3)).astype(np.float32)
    tiles = np.asarray(split_patches(jnp.asarray(x), 128, overlap=0.25))
    assert tiles.shape == (5 * 5 * 2, 128, 128, 3)
    stride = 96
    for j in range(5):
        for i in range(5):
            for b in range(2):
                expected = x[b, j * stride : j * stride + 128, i * stride : i * stride + 128]
                np.testing.assert_array_equal(tiles[(j * 5 + i) * 2 + b], expected)


def test_merge_patches_positions():
    """Merged output places each patch's kept region at the right spot."""
    from ml_depth_pro_video_tpu.models.depth_pro import merge_patches

    g, pad, steps, batch = 8, 1, 3, 2
    # encode (patch_index, row, col) into channel values
    tiles = np.zeros((steps * steps * batch, g, g, 1), np.float32)
    for p in range(steps * steps):
        for b in range(batch):
            tiles[p * batch + b, :, :, 0] = p * 100 + b
    out = np.asarray(merge_patches(jnp.asarray(tiles), batch, pad))
    side = steps * g - 2 * (steps - 1) * pad
    assert out.shape == (batch, side, side, 1)
    # first kept block comes from patch 0, last from patch 8
    assert out[0, 0, 0, 0] == 0
    assert out[1, -1, -1, 0] == 800 + 1
    # interior boundary: after patch 0's kept width (g - pad), patch 1 starts
    assert out[0, 0, g - pad, 0] == 100


def test_infer_requires_fpx_without_fov_head():
    """use_fov_head=False with no f_px must raise a clear error instead
    of dereferencing fov_deg=None (regression)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.models.depth_pro import (
        infer_fn, init_depth_pro, tiny_config,
    )

    cfg = tiny_config(use_fov_head=False)
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    with pytest.raises(ValueError, match="f_px is required"):
        infer_fn(params, x, None, cfg, Precision.fp32())
    out = infer_fn(params, x, jnp.asarray([300.0]), cfg, Precision.fp32())
    assert out["depth"].shape == (1, cfg.img_size, cfg.img_size)
