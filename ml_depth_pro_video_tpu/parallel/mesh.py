"""Device mesh construction.

The reference's only parallelism is a multiprocessing worker pool with
one model replica per process (`pointcloud_pipeline.py:629-714`). The
TPU-native equivalent is SPMD over a ``jax.sharding.Mesh``: frames are
data-parallel over the ``dp`` axis (params replicated), and the ViT can
additionally be tensor-parallel over ``tp`` (heads/MLP sharded, XLA
inserts the all-reduces over ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh. ``dp`` defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp > n or dp == 0 or tp == 0:
        raise ValueError(f"mesh {dp}x{tp} needs {max(dp, 1) * max(tp, 1)} devices, have {n}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame/batch) dim over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def round_batch_to_dp(batch_size: int, mesh: Mesh) -> int:
    """Round ``batch_size`` UP to a multiple of the mesh's dp degree.

    ``P("dp")`` sharding needs the leading dim divisible by dp; rounding
    at construction beats crashing at the first ``device_put`` minutes
    into a run. One rule shared by the inference runner and the trainer
    so the two paths cannot drift."""
    import logging

    dp = mesh.shape.get("dp", 1)
    if batch_size % dp:
        rounded = ((batch_size + dp - 1) // dp) * dp
        logging.getLogger(__name__).info(
            "batch_size %d -> %d (multiple of dp=%d)", batch_size, rounded, dp)
        return rounded
    return batch_size


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
