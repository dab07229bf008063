"""Op-level numerical parity vs torch (the reference's compute substrate).

The reference model's numerics are defined by torch kernels; every op we
re-express for TPU is validated here against torch CPU fp32/fp64.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ml_depth_pro_video_tpu.ops import (
    conv2d,
    conv_transpose2x2,
    layer_norm,
    multi_head_attention,
    resize2d,
)
from ml_depth_pro_video_tpu.ops.conv import linear

RNG = np.random.default_rng(0)


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize(
    "in_size,out_size,mode,antialias",
    [
        (1536, 768, "bilinear", False),
        (1536, 384, "bilinear", False),
        (96, 1536, "bilinear", False),
        (17, 24, "bilinear", False),
        (37, 24, "bicubic", True),
        (14, 16, "bicubic", False),
        (24, 37, "bicubic", True),
        (100, 100, "bilinear", False),
        (31, 7, "bilinear", True),
    ],
)
def test_resize_matches_torch(in_size, out_size, mode, antialias):
    x = RNG.standard_normal((1, 3, in_size, 5)).astype(np.float32)
    t = F.interpolate(
        torch.from_numpy(x),
        size=(out_size, 5),
        mode=mode,
        align_corners=False,
        antialias=antialias,
    ).numpy()
    j = resize2d(jnp.asarray(to_nhwc(x)), (out_size, 5), mode=mode, antialias=antialias)
    np.testing.assert_allclose(to_nchw(np.asarray(j)), t, rtol=1e-5, atol=1e-5)


def test_resize_both_axes():
    x = RNG.standard_normal((2, 3, 48, 80)).astype(np.float32)
    t = F.interpolate(torch.from_numpy(x), size=(96, 40), mode="bilinear", align_corners=False).numpy()
    j = resize2d(jnp.asarray(to_nhwc(x)), (96, 40))
    np.testing.assert_allclose(to_nchw(np.asarray(j)), t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad",
    [(8, 16, 3, 1, 1), (8, 4, 1, 1, 0), (6, 5, 3, 2, 1), (4, 1, 6, 1, 0)],
)
def test_conv2d_matches_torch(cin, cout, k, stride, pad):
    x = RNG.standard_normal((2, cin, 12, 12)).astype(np.float32)
    w = (RNG.standard_normal((cout, cin, k, k)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(cout).astype(np.float32)
    t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=stride, padding=pad).numpy()
    w_hwio = np.transpose(w, (2, 3, 1, 0))
    j = conv2d(jnp.asarray(to_nhwc(x)), jnp.asarray(w_hwio), jnp.asarray(b), stride=stride, padding=pad)
    np.testing.assert_allclose(to_nchw(np.asarray(j)), t, rtol=1e-4, atol=1e-4)


def test_conv_transpose2x2_matches_torch():
    cin, cout = 8, 5
    x = RNG.standard_normal((2, cin, 7, 9)).astype(np.float32)
    w = (RNG.standard_normal((cin, cout, 2, 2)) * 0.1).astype(np.float32)
    b = RNG.standard_normal(cout).astype(np.float32)
    t = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=2).numpy()
    # (cin, cout, kh, kw) -> (cin, kh*kw*cout) flattened (kh, kw, cout)
    w_flat = np.transpose(w, (0, 2, 3, 1)).reshape(cin, 4 * cout)
    j = conv_transpose2x2(jnp.asarray(to_nhwc(x)), jnp.asarray(w_flat), jnp.asarray(b))
    np.testing.assert_allclose(to_nchw(np.asarray(j)), t, rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch():
    d = 64
    x = RNG.standard_normal((3, 17, d)).astype(np.float32)
    g = RNG.standard_normal(d).astype(np.float32)
    b = RNG.standard_normal(d).astype(np.float32)
    ln = torch.nn.LayerNorm(d, eps=1e-6)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(g))
        ln.bias.copy_(torch.from_numpy(b))
        t = ln(torch.from_numpy(x)).numpy()
    j = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(j), t, rtol=1e-5, atol=1e-5)


def test_linear_matches_torch():
    x = RNG.standard_normal((4, 10)).astype(np.float32)
    w = RNG.standard_normal((7, 10)).astype(np.float32)  # torch (out, in)
    b = RNG.standard_normal(7).astype(np.float32)
    t = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    j = linear(jnp.asarray(x), jnp.asarray(w.T), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(j), t, rtol=1e-5, atol=1e-5)


def test_attention_matches_torch_sdpa():
    b, h, s, d = 2, 4, 33, 16
    q = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    k = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    v = RNG.standard_normal((b, h, s, d)).astype(np.float32)
    t = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    j = multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl="xla")
    np.testing.assert_allclose(np.asarray(j), t, rtol=1e-4, atol=1e-4)


def test_flash_attention_packed_interpret_matches_xla():
    """Run the actual Pallas kernel in interpret mode on CPU."""
    from ml_depth_pro_video_tpu.ops.attention import (
        flash_attention_packed,
        xla_attention_packed,
    )

    qkv = RNG.standard_normal((2, 33, 3 * 64)).astype(np.float32)
    ref = xla_attention_packed(jnp.asarray(qkv), 4)
    got = flash_attention_packed(jnp.asarray(qkv), 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fold_deconv_conv3x3_exact_with_borders():
    """The folded half-resolution conv == deconv2x2 -> conv3x3, exactly,
    including image borders (the ones-channel carries the deconv bias
    into only the in-bounds taps)."""
    import numpy as np

    from ml_depth_pro_video_tpu.ops.conv import (
        conv2d,
        conv_transpose2x2,
        depth_to_space2x2,
        fold_deconv2x2_conv3x3,
    )

    rng = np.random.default_rng(0)
    c, m, n = 5, 7, 3
    x = jnp.asarray(rng.standard_normal((2, 6, 4, c)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((c, 4 * m)), jnp.float32)
    bd = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((3, 3, m, n)), jnp.float32)
    bc = jnp.asarray(rng.standard_normal((n,)), jnp.float32)

    ref = conv2d(conv_transpose2x2(x, wd, bd), wc, bc, padding=1)

    folded = fold_deconv2x2_conv3x3(wd, bd, wc)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    h = conv2d(jnp.concatenate([x, ones], axis=-1), folded, padding=1)
    h = h + jnp.tile(bc, 4)
    out = depth_to_space2x2(h)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_attention_packed_small_d_falls_back_to_xla():
    """Packed dims that are not lane multiples (tiny configs on a real
    TPU) must take the XLA path — the Pallas block spec requires the
    D-wide column slice to be 128-divisible. Regression: depth-pro-train
    --tiny on the chip crashed in pallas_call with d=64."""
    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.ops.attention import attention_packed, xla_attention_packed

    qkv = (jax.random.normal(jax.random.PRNGKey(0), (3, 65, 3 * 64)) * 0.3).astype(jnp.bfloat16)
    # impl="pallas" forced: the d%128 guard must reroute to XLA (no crash
    # on any backend), and values must match the reference path
    out = attention_packed(qkv, num_heads=2, impl="pallas")
    ref = xla_attention_packed(qkv, num_heads=2)
    assert jnp.allclose(out, ref).item()


def test_flash_attention_packed_head_grouped_interpret():
    """The head-grouped grid (fp32 parity path) computes the identical
    result: each program sees only its head group's contiguous qkv
    columns."""
    from ml_depth_pro_video_tpu.ops.attention import (
        flash_attention_packed,
        xla_attention_packed,
    )

    qkv = RNG.standard_normal((2, 33, 3 * 4 * 64)).astype(np.float32)
    ref = xla_attention_packed(jnp.asarray(qkv), 4)
    for bh in (1, 2, 4):
        got = flash_attention_packed(jnp.asarray(qkv), 4, interpret=True,
                                     block_heads=bh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=f"bh={bh}")


def test_fp32_block_heads_budget():
    """fp32 head-group picker: ViT-L (16 heads, hd 64, S 577) must find
    a lane-aligned group that fits the VMEM budget; full-width must NOT
    be chosen (that is the configuration that OOMs the 16 MB scope)."""
    from ml_depth_pro_video_tpu.ops.attention import _fp32_block_heads

    bh = _fp32_block_heads(16, 64, 577)
    assert bh is not None and 16 % bh == 0
    assert (64 * bh) % 128 == 0
    assert bh < 16  # full-width fp32 would exceed the budget
    # tiny configs (hd too small for lane alignment) -> None -> XLA path
    assert _fp32_block_heads(2, 32, 65) is None


def test_flash_attention_packed_bias_interpret_matches_xla():
    """The bias-kernel variant (ToMe proportional attention, round 4) in
    interpret mode vs the XLA reference, full-width AND head-grouped."""
    from ml_depth_pro_video_tpu.ops.attention import (
        flash_attention_packed_bias,
        xla_attention_packed,
    )

    qkv = RNG.standard_normal((2, 33, 3 * 64)).astype(np.float32)
    bias = (RNG.random((2, 33)) * 2).astype(np.float32)  # log-size-like
    ref = xla_attention_packed(jnp.asarray(qkv), 4, key_bias=jnp.asarray(bias))
    got = flash_attention_packed_bias(jnp.asarray(qkv), jnp.asarray(bias), 4,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    got2 = flash_attention_packed_bias(jnp.asarray(qkv), jnp.asarray(bias), 4,
                                       interpret=True, block_heads=2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_resblock_interpret_matches_xla():
    """The fused decoder resblock kernel (round 4) in interpret mode vs
    the XLA composition, including image borders (zero-padded h) and
    multi-tile row splits."""
    from ml_depth_pro_video_tpu.ops.resblock import _pick_tile, residual_block

    rng = np.random.default_rng(7)
    for (B, H, W, C) in [(2, 16, 16, 128), (1, 24, 20, 128)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.1,
                        jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05,
                         jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05,
                         jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1, jnp.bfloat16)
        b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1, jnp.bfloat16)
        ref = residual_block(x, w1, b1, w2, b2, impl="xla")
        got = residual_block(x, w1, b1, w2, b2, interpret=True)
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        err = float(jnp.max(jnp.abs((got - ref).astype(jnp.float32)))) / scale
        assert err < 0.02, (B, H, W, C, err)  # bf16 tap-accumulation band

    # tile split exercised explicitly: T chosen < H
    assert _pick_tile(96, 96, 256) < 96


def test_fused_resblock_gradient_via_xla_backward():
    """The custom VJP recomputes through the XLA math — grads must match
    the pure-XLA composition's."""
    import jax

    from ml_depth_pro_video_tpu.ops import resblock as rb

    rng = np.random.default_rng(8)
    C = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 8, C)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    b1 = jnp.zeros((C,), jnp.bfloat16)
    b2 = jnp.zeros((C,), jnp.bfloat16)

    # route through the diff wrapper with the kernel monkeypatched to the
    # XLA reference (the kernel itself needs a TPU; interpret mode inside
    # grad is what the wrapper avoids) — this checks the VJP plumbing
    import unittest.mock as mock

    def fake_pallas(x, w1f, b1r, w2f, b2r, interpret=False):
        return rb._xla_residual(x, w1f.reshape(3, 3, C, C), b1r[0],
                                w2f.reshape(3, 3, C, C), b2r[0])

    with mock.patch.object(rb, "_resblock_pallas", fake_pallas):
        g1 = jax.grad(lambda x: rb._resblock_diff(
            x, w1.reshape(9, C, C), b1[None], w2.reshape(9, C, C),
            b2[None]).astype(jnp.float32).sum())(x)
    g2 = jax.grad(lambda x: rb._xla_residual(
        x, w1, b1, w2, b2).astype(jnp.float32).sum())(x)
    np.testing.assert_allclose(np.asarray(g1.astype(jnp.float32)),
                               np.asarray(g2.astype(jnp.float32)),
                               rtol=2e-2, atol=2e-2)
