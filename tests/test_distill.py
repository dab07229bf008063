"""Model family presets + teacher->student distillation."""

import functools
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG,
    infer_fn,
    init_depth_pro,
    model_preset,
    tiny_config,
)
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner


def test_model_preset_registry():
    assert model_preset("large") is DEFAULT_MONODEPTH_CONFIG
    assert model_preset("tiny") == tiny_config()
    with pytest.raises(ValueError, match="model must be one of"):
        model_preset("huge")
    for name, embed, depth in (("base", 768, 12), ("small", 384, 12)):
        cfg = model_preset(name)
        d = cfg.vit.embed_dim
        assert d == embed and cfg.vit.depth == depth
        # reference dim ratios and hook placement (1/4, 1/2 of trunk)
        assert cfg.dims_encoder == (d // 4, d // 2, d, d)
        assert cfg.decoder_features == d // 4
        assert cfg.hook_block_ids == (depth // 4 - 1, depth // 2 - 1)
        assert cfg.img_size == 1536  # same network resolution as large
        assert cfg.checkpoint_uri != DEFAULT_MONODEPTH_CONFIG.checkpoint_uri


@pytest.mark.parametrize("name", ["small", "base"])
def test_model_family_full_graph_traces(name):
    """Abstract-trace the FULL small/base inference graph at production
    dims (init + infer at 1536²) — validates every shape contract of the
    new presets without paying the compute."""
    cfg = model_preset(name)
    from ml_depth_pro_video_tpu.core.precision import resolve_precision

    prec = resolve_precision("fp32")
    params = jax.eval_shape(
        functools.partial(init_depth_pro, cfg=cfg), jax.random.PRNGKey(0))
    x = jax.ShapeDtypeStruct((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    out = jax.eval_shape(lambda p, im: infer_fn(p, im, None, cfg, prec),
                         params, x)
    assert out["depth"].shape == (1, 1536, 1536)
    assert out["focallength_px"].shape == (1,)


def test_tp_head_divisibility_guard():
    """6-head family members must reject tp sizes that would split a
    head across shards (silent gather-heavy GSPMD otherwise)."""
    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.train.step import make_sharded_train_step

    mesh = make_mesh(tp=4)  # small has 6 heads: 6 % 4 != 0
    with pytest.raises(ValueError, match="must divide num_heads"):
        make_sharded_train_step({}, model_preset("small"), mesh)


@pytest.fixture(scope="module")
def teacher():
    return DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)


@pytest.fixture(scope="module")
def frames_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(3)
    for i in range(4):
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(str(d / f"f_{i:04d}.png"))
    return str(d)


def test_distill_labels_resume(teacher, frames_dir, tmp_path):
    from ml_depth_pro_video_tpu.train.distill import distill_labels

    labels = str(tmp_path / "labels")
    n = distill_labels(frames_dir, labels, teacher_runner=teacher)
    assert n == 4
    for i in range(4):
        assert os.path.exists(os.path.join(labels, f"f_{i:04d}.png"))
        with np.load(os.path.join(labels, f"f_{i:04d}_depth.npz")) as f:
            assert f["depth"].shape == (48, 64)
            assert np.isfinite(f["depth"]).all() and (f["depth"] > 0).all()
    # resume: everything is already labeled
    assert distill_labels(frames_dir, labels, teacher_runner=teacher) == 0


def test_distill_labels_from_video(teacher, tmp_path):
    from ml_depth_pro_video_tpu.effects.parallax import write_video
    from ml_depth_pro_video_tpu.train.distill import distill_labels

    rng = np.random.default_rng(5)
    frames = (rng.random((3, 48, 64, 3)) * 255).astype(np.uint8)
    vid = str(tmp_path / "clip.mp4")
    write_video(vid, frames, fps=4)
    labels = str(tmp_path / "labels")
    assert distill_labels(vid, labels, teacher_runner=teacher) == 3
    assert len([f for f in os.listdir(labels) if f.endswith(".npz")]) == 3
    assert distill_labels(vid, labels, teacher_runner=teacher) == 0


@pytest.mark.slow
def test_distill_end_to_end_tiny(teacher, frames_dir, tmp_path):
    """Teacher labels + student fit on the cache: two SGD steps run and
    the state advances (the student here is the tiny config — the
    real presets differ only in dims)."""
    from ml_depth_pro_video_tpu.train.distill import distill

    state = distill(frames_dir, str(tmp_path / "labels"),
                    student_cfg=tiny_config(), teacher_runner=teacher,
                    batch_size=2, epochs=1, lr=1e-5, warmup_steps=0,
                    log_every=1, dp=1)
    assert int(state.step) == 2
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(state.params))
