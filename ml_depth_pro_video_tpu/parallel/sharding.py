"""Parameter sharding rules (tensor parallelism for the ViT trunk).

Megatron-style TP expressed as GSPMD annotations: qkv / fc1 columns
shard over ``tp``, proj / fc2 rows shard (contracting dim), so XLA
inserts exactly one all-reduce per attention and one per MLP.

This works because the qkv projection is packed HEAD-CONTIGUOUSLY —
columns ordered [h0:(q,k,v) | h1:(q,k,v) | ...] (ckpt/convert.py) — so
a column shard hands each tp chip WHOLE heads and the attention-side
(b, s, nh, 3, hd) unpack inherits the sharding. (With the torch
[q|k|v] section packing, the same annotation cut across sections and
GSPMD all-gathered qkv and replicated attention: 5 all-gathers, 0
all-reduces measured.) Requires num_heads % tp == 0 (ViT-L: 16 heads).
ViT block params are stacked (L, ...) so the rules apply to the
trailing dims. Everything not matched (convs, norms, embeddings,
decoder/head/fov) is replicated — the conv trunk is <10% of FLOPs and
DP-parallel over frames anyway.

GSPMD contract: a plain-jit program over TP-sharded params must route
every Mosaic kernel through its XLA fallback — pass ``attn_impl="xla"``
AND ``conv_impl="xla"`` to ``infer_fn``/``forward`` (a pallas_call
custom call cannot be auto-partitioned). `make_sharded_train_step` and
`__graft_entry__.dryrun_multichip`'s TP programs do this; shard_map
paths (DP inference, the latency patch-ViT) keep the Pallas kernels
because each device traces a complete per-shard program.
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
# int8-quantized weights {'q': (L, din, dout) int8, 's': (L, 1, dout)}:
# column-ruled weights shard with their per-output-channel scale; the
# row-ruled ones (proj/fc2) stay replicated when quantized (the scale
# is per OUTPUT channel and cannot follow a contracting-dim shard)
_TP_QUANT_RULES = {
    "qkv_w": {"q": P(None, None, "tp"), "s": P(None, None, "tp")},
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
