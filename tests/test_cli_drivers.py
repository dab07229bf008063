"""End-to-end CLI driver tests (tiny model, CPU): image -> pointcloud,
image -> cleaned cloud, image -> mesh."""

import os

import numpy as np
import pytest
from PIL import Image

from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner


@pytest.fixture(scope="module")
def runner():
    return DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=1)


@pytest.fixture(scope="module")
def image_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("img")
    rng = np.random.default_rng(0)
    p = str(d / "photo_0001.png")
    Image.fromarray((rng.random((100, 140, 3)) * 255).astype(np.uint8)).save(p)
    return p


def test_img_to_pointcloud_ply_and_ground(runner, image_path, tmp_path):
    from ml_depth_pro_video_tpu.cli.img_to_pointcloud import create_normalized_pointcloud
    from ml_depth_pro_video_tpu.geom.pointcloud import read_ply

    out = str(tmp_path / "cloud.ply")
    create_normalized_pointcloud(image_path, out, ground_params_dir=str(tmp_path),
                                 runner=runner)
    assert os.path.exists(out)
    assert os.path.exists(tmp_path / "ground.json")
    cloud = read_ply(out)
    assert len(cloud) > 1000
    assert cloud.colors is not None
    # ground at y ~ 0 after normalization
    assert np.percentile(cloud.points[:, 1], 1) > -0.2


def test_cleaner_driver(runner, image_path, tmp_path):
    from ml_depth_pro_video_tpu.cli.pointcloud_cleaner import (
        process_image_to_clean_pointcloud,
    )

    # random-weight depth yields ray-aligned streaks that the shadow
    # cleaner legitimately removes; disable it (angle 0 keeps all cells)
    ply, cloud = process_image_to_clean_pointcloud(
        image_path, str(tmp_path), runner=runner, preview=True,
        nb_points=5, radius=0.5, max_shadow_angle=0.0,
    )
    assert os.path.exists(ply)
    assert os.path.exists(str(tmp_path / "photo_0001_clean_preview.png"))
    assert len(cloud) > 0


def test_mesh_driver(runner, image_path, tmp_path):
    from ml_depth_pro_video_tpu.cli.pointcloud_to_mesh import process_image_to_mesh

    out = str(tmp_path / "mesh.obj")
    path, mesh = process_image_to_mesh(
        image_path, out, method="simple", voxel_size=0.3,
        nb_points=3, radius=1.0, max_shadow_angle=0.0, runner=runner,
    )
    assert os.path.exists(path)
    assert len(mesh.faces) > 10


def test_depth_to_floorplan_driver(runner, image_path, tmp_path):
    from ml_depth_pro_video_tpu.cli.depth_to_floorplan import depth_image_to_floorplan

    out = depth_image_to_floorplan(image_path, str(tmp_path), runner=runner,
                                   height_threshold=None)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_run_cli_npz_is_metric_depth_and_mirrors_subdirs(tmp_path, monkeypatch):
    """depth-pro-run contract (reference cli/run.py:86-95): npz key
    'depth' holds METRIC depth, and directory outputs mirror the input's
    relative subdirectories (no flatten collisions)."""
    import numpy as np
    from PIL import Image

    import ml_depth_pro_video_tpu.video.runner as runner_mod
    from ml_depth_pro_video_tpu.cli import run as run_cli

    frames = tmp_path / "frames"
    (frames / "a").mkdir(parents=True)
    (frames / "b").mkdir(parents=True)
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    for sub in ("a", "b"):
        Image.fromarray(img).save(frames / sub / "0001.png")

    class StubRunner:
        def __init__(self, **kw):
            pass

        def depth_stream(self, items):
            for p in items:
                yield {"key": str(p), "depth": np.full((16, 16), 7.5),
                       "focallength_px": 300.0, "image": img}

    monkeypatch.setattr(runner_mod, "DepthVideoRunner", StubRunner)
    out = tmp_path / "out"
    run_cli.main(["-i", str(frames), "-o", str(out), "--skip-display"])
    for sub in ("a", "b"):
        with np.load(out / sub / "0001.npz") as z:
            np.testing.assert_allclose(z["depth"], 7.5)  # metric, not 1/7.5
        assert (out / sub / "0001.jpg").exists()


def test_colorize_depth_reference_orientation_and_nan_robust():
    """Reference semantics (`generate_depth_maps.py:29-44`): NO
    inversion (near = low normalized value) and nan-robust
    normalization; all-non-finite maps degrade instead of crashing."""
    import numpy as np

    from ml_depth_pro_video_tpu.cli.generate_depth_maps import colorize_depth

    d = np.array([[1.0, 10.0]])
    g16 = colorize_depth(d, "gray16")
    assert g16[0, 0] == 0 and g16[0, 1] == 65535  # near = 0, like the reference
    inv = colorize_depth(d, "gray16", invert=True)
    assert inv[0, 0] == 65535

    weird = np.array([[np.nan, 1.0, np.inf]])
    out = colorize_depth(weird, "gray16")
    assert out.dtype == np.uint16  # no crash, values in range
    allnan = colorize_depth(np.full((2, 2), np.nan), "gray16")
    assert allnan.shape == (2, 2)
