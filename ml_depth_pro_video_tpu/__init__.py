"""ml-depth-pro-video, rebuilt TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
tdj28/ml-depth-pro-video (Apple Depth Pro + video point-cloud tooling):
sharp monocular metric depth, video batch pipelines, point-cloud
geometry post-processing, floor plans, meshes and 3D parallax effects.

Public API mirrors the reference package surface
(`/root/reference/src/depth_pro/__init__.py:4-5`):

    from ml_depth_pro_video_tpu import create_model_and_transforms, load_rgb
"""

__version__ = "0.1.0"

_EXPORTS = {
    "create_model_and_transforms": ("ml_depth_pro_video_tpu.models.depth_pro", "create_model_and_transforms"),
    "DepthPro": ("ml_depth_pro_video_tpu.models.depth_pro", "DepthPro"),
    "DepthProConfig": ("ml_depth_pro_video_tpu.models.depth_pro", "DepthProConfig"),
    "DEFAULT_MONODEPTH_CONFIG": ("ml_depth_pro_video_tpu.models.depth_pro", "DEFAULT_MONODEPTH_CONFIG"),
    "load_rgb": ("ml_depth_pro_video_tpu.io.image", "load_rgb"),
}


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
