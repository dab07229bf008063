"""shard_map-based SPMD execution.

GSPMD can auto-partition pure-XLA programs, but a ``pallas_call`` (the
flash-attention kernel) is not auto-partitionable — the idiomatic
multi-chip path is ``shard_map``: every chip runs the complete per-frame
program on its slice of the batch, with no cross-chip communication in
the forward pass (params replicated, batch split over ``dp``).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_dp_infer(infer_fn, mesh: Mesh, n_batch_args: int = 1):
    """Wrap ``infer_fn(params, *batch_args) -> pytree`` for data-parallel
    execution over the mesh's ``dp`` axis: params replicated, each of the
    ``n_batch_args`` trailing arguments sharded on its leading dim.
    Batch size must be a multiple of the dp size."""

    wrapped = shard_map(
        infer_fn,
        mesh=mesh,
        in_specs=(P(),) + (P("dp"),) * n_batch_args,
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(wrapped)
