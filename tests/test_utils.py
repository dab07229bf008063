"""Utility subsystem tests: stage timers, ETA, io parity helpers."""

import numpy as np
from PIL import Image

from ml_depth_pro_video_tpu.io.image import extract_exif, fpx_from_f35, load_rgb
from ml_depth_pro_video_tpu.utils.profiling import ETAReporter, StageTimer


def test_stage_timer_accumulates():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["b"]["count"] == 1
    assert "a" in t.report()


def test_eta_reporter():
    r = ETAReporter(total=4)
    msg = r.step()
    assert "[1/4]" in msg and "ETA" in msg


def test_fpx_from_f35():
    # 35mm full frame diagonal is sqrt(36^2+24^2); a 50mm lens on a
    # 1000x667 image scales by the diagonal ratio
    f = fpx_from_f35(1000, 667, 50)
    expected = 50 * np.sqrt(1000**2 + 667**2) / np.sqrt(36**2 + 24**2)
    np.testing.assert_allclose(f, expected)


def test_load_rgb_grayscale_and_alpha(tmp_path):
    g = Image.fromarray((np.arange(64, dtype=np.uint8).reshape(8, 8)))
    p = str(tmp_path / "g.png")
    g.save(p)
    img, icc, f_px = load_rgb(p)
    assert img.shape == (8, 8, 3)
    assert f_px is None
    rgba = Image.fromarray(np.zeros((4, 4, 4), np.uint8), mode="RGBA")
    p2 = str(tmp_path / "a.png")
    rgba.save(p2)
    img2, _, _ = load_rgb(p2)
    assert img2.shape == (4, 4, 3)


def test_load_rgb_exif_rotation(tmp_path):
    from PIL import Image as PILImage

    arr = np.zeros((4, 8, 3), np.uint8)
    arr[0, :, 0] = 255  # red stripe on top
    im = PILImage.fromarray(arr)
    exif = im.getexif()
    exif[274] = 6  # orientation: rotate 270
    p = str(tmp_path / "rot.jpg")
    im.save(p, exif=exif)
    img, _, _ = load_rgb(p)
    # rotated: 4x8 -> 8x4
    assert img.shape[:2] == (8, 4)


def test_negative_exif_f35_yields_no_focal(tmp_path, monkeypatch):
    """Corrupt EXIF (f_35mm <= 0) must fall back to f_px=None (FOV
    estimation), not a negative focal length — reference `utils.py:106`."""
    from PIL import Image

    import ml_depth_pro_video_tpu.io.image as io_image

    path = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)
    for bad in (-50, 0, None):
        monkeypatch.setattr(io_image, "extract_exif",
                            lambda img, b=bad: {"FocalLengthIn35mmFilm": b})
        _, _, f_px = io_image.load_rgb(path)
        assert f_px is None, bad
    monkeypatch.setattr(io_image, "extract_exif",
                        lambda img: {"FocalLengthIn35mmFilm": 28})
    _, _, f_px = io_image.load_rgb(path)
    assert f_px is not None and f_px > 0


def test_compilation_cache_policy(tmp_path, monkeypatch):
    """Persistent-cache wiring (utils/compile_cache.py): off on CPU by
    default, on with an explicit dir/force, idempotent, env opt-out."""
    import os

    import jax

    from ml_depth_pro_video_tpu.utils import compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("DEPTH_PRO_COMPILE_CACHE", raising=False)
        # CPU backend, no env, no force: disabled (test processes would
        # churn entries for interpreter-speed programs)
        monkeypatch.setattr(cc, "_state", {"configured": False, "dir": None})
        assert cc.enable_compilation_cache() is None

        # explicit dir + force: configured, directory created
        monkeypatch.setattr(cc, "_state", {"configured": False, "dir": None})
        d = cc.enable_compilation_cache(str(tmp_path / "cache"), force=True)
        assert d is not None and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # idempotent: the first successful call wins
        assert cc.enable_compilation_cache("/somewhere/else") == d

        # env opt-out beats force
        monkeypatch.setattr(cc, "_state", {"configured": False, "dir": None})
        monkeypatch.setenv("DEPTH_PRO_COMPILE_CACHE", "off")
        assert cc.enable_compilation_cache(force=True) is None

        # env dir force-enables even on CPU (the CI/dryrun hook)
        monkeypatch.setattr(cc, "_state", {"configured": False, "dir": None})
        monkeypatch.setenv("DEPTH_PRO_COMPILE_CACHE", str(tmp_path / "envc"))
        d2 = cc.enable_compilation_cache()
        assert d2 == str(tmp_path / "envc") and os.path.isdir(d2)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
