"""Parameter sharding rules (tensor parallelism for the ViT trunk).

Megatron-style TP expressed as GSPMD annotations — for the MLP: fc1
columns shard over ``tp``, fc2 rows shard (contracting dim), so XLA
inserts exactly one all-reduce per MLP. The MLP is ~2/3 of each block's
matmul FLOPs.

The ATTENTION weights stay replicated on purpose. The qkv projection is
stored PACKED as (L, d, 3d) with columns ordered [q | k | v]; a plain
column shard P(None, None, 'tp') cuts across the q/k/v sections and the
head boundaries, so the (b, s, 3, nh, hd) unpack cannot inherit the
sharding — GSPMD stays correct but inserts an all-gather of qkv and
runs attention replicated anyway (verified on a fake 8-device mesh: 5
all-gathers, 0 all-reduces). Until the packing is made head-contiguous,
honestly replicating qkv/proj costs nothing in compute and avoids the
per-block qkv all-gather. Everything not matched (convs, norms,
embeddings, decoder/head/fov) is replicated — the conv trunk is <10% of
FLOPs and DP-parallel over frames anyway.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# stacked ViT block param name -> PartitionSpec (leading axis = depth L)
_TP_RULES = {
    "fc1_w": P(None, None, "tp"),
    "fc1_b": P(None, "tp"),
    "fc2_w": P(None, "tp", None),
}
# quantized weights {'q': int8 (L, din, dout), 's': (L, 1, dout)} shard
# like their parent when the parent has a column rule (last dim); row
# rules don't apply cleanly to the per-output-channel scale, and the
# only row-ruled weight (fc2_w) must then stay replicated when quantized
_TP_QUANT_RULES = {
    "fc1_w": {"q": P(None, None, "tp"), "s": P(None, None, "tp")},
}


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """Build a NamedSharding pytree matching ``params``."""

    def spec_for(path) -> P:
        if tensor_parallel and mesh.shape.get("tp", 1) > 1:
            keys = [p.key for p in path if hasattr(p, "key")]
            # only stacked ViT block params (under a "blocks" subtree)
            if "blocks" in keys:
                if keys[-1] in _TP_RULES:
                    return _TP_RULES[keys[-1]]
                # int8-quantized leaf: {'q','s'} under the weight name
                if (len(keys) >= 2 and keys[-1] in ("q", "s")
                        and keys[-2] in _TP_QUANT_RULES):
                    return _TP_QUANT_RULES[keys[-2]][keys[-1]]
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params
    )


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """Place params on the mesh according to the TP rules."""
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
