"""Parameter sharding rules (tensor parallelism for the ViT trunk).

Megatron-style TP expressed as GSPMD annotations: qkv / fc1 columns are
sharded over ``tp`` (heads split), proj / fc2 rows are sharded
(contracting dim), so XLA inserts exactly one all-reduce per attention
and one per MLP. ViT block params are stacked (L, ...) so the rules
apply to the trailing dims. Everything not matched (convs, norms,
embeddings, decoder/head/fov) is replicated — the conv trunk is <10% of
FLOPs and DP-parallel over frames anyway.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# stacked ViT block param name -> PartitionSpec (leading axis = depth L)
_TP_RULES = {
    "qkv_w": P(None, None, "tp"),
    "qkv_b": P(None, "tp"),
    "fc1_w": P(None, None, "tp"),
    "fc1_b": P(None, "tp"),
    "proj_w": P(None, "tp", None),
    "fc2_w": P(None, "tp", None),
}


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """Build a NamedSharding pytree matching ``params``."""

    def spec_for(path) -> P:
        if tensor_parallel and mesh.shape.get("tp", 1) > 1:
            keys = [p.key for p in path if hasattr(p, "key")]
            # only stacked ViT block params (under a "blocks" subtree)
            if "blocks" in keys and keys[-1] in _TP_RULES:
                return _TP_RULES[keys[-1]]
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path)), params
    )


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True):
    """Place params on the mesh according to the TP rules."""
    shardings = param_shardings(params, mesh, tensor_parallel)
    return jax.tree.map(jax.device_put, params, shardings)
