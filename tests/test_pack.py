"""Packed depth fetch (video/pack.py): quantization bound, runner
integration, smoothing composition, CLI flag."""

import numpy as np
import pytest

from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.video.pack import (
    max_rel_error,
    pack_depth_u16,
    unpack_depth_u16,
)
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner


def _frames(n, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, h, w, 3)) * 255).astype(np.uint8)


def test_roundtrip_bound_wide_range():
    rng = np.random.default_rng(1)
    # log-uniform over the model's full output clamp — the worst case
    d = np.exp(rng.uniform(np.log(1e-4), np.log(1e4), (3, 32, 40))
               ).astype(np.float32)
    u, lmin, lscale = pack_depth_u16(d)
    out = unpack_depth_u16(np.asarray(u), np.asarray(lmin), np.asarray(lscale))
    rel = np.abs(out - d) / d
    # quantization bound for THIS frame's log spread (<= the full-clip
    # bound 1.5e-4) plus an allowance for the backend's fp32 log
    # accuracy (~6.5e-5 absolute-in-log measured on TPU; exact on CPU)
    spread = np.log(d.max(axis=(1, 2)) / d.min(axis=(1, 2)))
    bound = np.expm1(spread / (2 * 65535.0))[:, None, None]
    assert np.all(rel <= bound + 1e-4)
    assert max_rel_error() < 1.6e-4


def test_roundtrip_constant_and_narrow():
    # constant map: exact (scale 0); narrow range: tiny error
    d = np.full((1, 8, 8), 3.7, np.float32)
    u, lmin, lscale = pack_depth_u16(d)
    assert np.asarray(u).max() == 0 and float(np.asarray(lscale)[0]) == 0.0
    out = unpack_depth_u16(np.asarray(u), np.asarray(lmin), np.asarray(lscale))
    np.testing.assert_allclose(out, d, rtol=1e-6)

    d = np.linspace(2.0, 2.5, 64, dtype=np.float32).reshape(1, 8, 8)
    u, lmin, lscale = pack_depth_u16(d)
    out = unpack_depth_u16(np.asarray(u), np.asarray(lmin), np.asarray(lscale))
    assert np.abs(out / d - 1).max() < 3e-6


def test_lut_unpack_bit_identical_to_elementwise():
    # unpack_depth_u16 routes exp() through a 65536-entry per-frame LUT
    # (~36x fewer transcendentals at 1536²); the LUT evaluates the very
    # same fp32 expression, so the output must be BIT-identical
    rng = np.random.default_rng(7)
    u = rng.integers(0, 65536, (3, 17, 23)).astype(np.uint16)
    lmin = rng.uniform(-2, 0, 3).astype(np.float32)
    lscale = rng.uniform(0, 1e-4, 3).astype(np.float32)
    direct = np.exp(u.astype(np.float32) * lscale[:, None, None]
                    + lmin[:, None, None])
    out = unpack_depth_u16(u, lmin, lscale)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, direct)

    # scalar lmin/lscale broadcast over frames; 2-D packed works
    out2 = unpack_depth_u16(u, lmin[0], lscale[0])
    np.testing.assert_array_equal(
        out2, np.exp(u.astype(np.float32) * lscale[0] + lmin[0]))
    out3 = unpack_depth_u16(u[0], lmin[0], lscale[0])
    np.testing.assert_array_equal(out3, out2[0])

    with pytest.raises(ValueError, match="broadcast"):
        unpack_depth_u16(u, lmin[:2], lscale)
    with pytest.raises(TypeError, match="uint16"):
        unpack_depth_u16(u.astype(np.uint8), lmin, lscale)


def test_runner_packed_stream_matches_unpacked():
    frames = _frames(5)
    plain = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    packed = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, fetch_pack="u16")
    a = list(plain.depth_stream(list(frames)))
    b = list(packed.depth_stream(list(frames)))
    assert len(a) == len(b) == 5
    for ra, rb in zip(a, b):
        assert rb["depth"].dtype == np.float32
        rel = np.abs(rb["depth"] - ra["depth"]) / np.abs(ra["depth"])
        assert rel.max() < 2e-4
        assert rb["focallength_px"] == pytest.approx(ra["focallength_px"])


def test_runner_packed_composes_with_smoothing():
    frames = _frames(6, seed=3)
    kw = dict(cfg=tiny_config(), precision="fp32", batch_size=2,
              temporal_smooth=0.7)
    sm = DepthVideoRunner(**kw)
    sm_packed = DepthVideoRunner(**kw, fetch_pack="u16")
    a = list(sm.depth_stream(list(frames)))
    b = list(sm_packed.depth_stream(list(frames)))
    for ra, rb in zip(a, b):
        rel = np.abs(rb["depth"] - ra["depth"]) / np.abs(ra["depth"])
        assert rel.max() < 2e-4


def test_fetch_pack_validation_and_multihost_guard():
    with pytest.raises(ValueError, match="fetch_pack"):
        DepthVideoRunner(cfg=tiny_config(), fetch_pack="u8")
    import jax

    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) > 1:
        r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                             batch_size=2, mesh=make_mesh(tp=1),
                             fetch_pack="u16")
        with pytest.raises(ValueError, match="single-host"):
            next(iter(r.depth_stream_multihost([_frames(1)[0]])))


def test_maps_cli_packed_fetch(tmp_path):
    from PIL import Image

    from ml_depth_pro_video_tpu.cli.generate_depth_maps import (
        generate_depth_maps,
    )

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i, f in enumerate(_frames(2)):
        Image.fromarray(f).save(frames_dir / f"f_{i:03d}.png")
    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, fetch_pack="u16")
    written = generate_depth_maps(str(frames_dir), str(tmp_path / "out"),
                                  runner=runner, save_npz=True)
    assert len(written) == 2
    import glob

    npz = sorted(glob.glob(str(tmp_path / "out" / "*.npz")))
    assert len(npz) == 2
    with np.load(npz[0]) as z:
        assert z["depth"].dtype == np.float32 and z["depth"].min() > 0
