"""Probe: AOT-compile the PRODUCTION-dims (ViT-L, 1536^2) multi-chip
programs on a fake 8-device CPU mesh (VERDICT r3 next-round #3).

No parameters are materialized and nothing executes — params enter as
sharded ShapeDtypeStructs and each program is jit(...).lower(...).
compile()d, proving the full-dims DP / TP / latency (sp) programs are
compilable for an 8-device mesh and auditing their HLO collectives.

Run: python scripts/fulldims_compile_probe.py | tee scripts/fulldims_compile_probe.out
"""

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp

from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG,
    infer_fn,
    init_depth_pro,
)
from ml_depth_pro_video_tpu.parallel.mesh import batch_sharding, make_mesh
from ml_depth_pro_video_tpu.parallel.sharding import param_shardings
from ml_depth_pro_video_tpu.parallel.latency import make_latency_infer, make_sp_mesh
from ml_depth_pro_video_tpu.parallel.spmd import make_dp_infer
from jax.sharding import NamedSharding, PartitionSpec as P


def collective_counts(hlo: str) -> dict:
    return {
        op: len(re.findall(rf"\b{op}\b", hlo))
        for op in ("all-gather", "all-reduce", "collective-permute",
                   "all-to-all", "reduce-scatter")
    }


def main():
    n = 8
    cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
    abstract = jax.eval_shape(lambda: init_depth_pro(jax.random.PRNGKey(0), cfg))
    print(f"params: {sum(v.size for v in jax.tree.leaves(abstract)) / 1e6:.1f} M")

    # --- DP (shard_map over dp axis, params replicated) ---
    mesh = make_mesh(dp=n, tp=1)
    rep = NamedSharding(mesh, P())
    p_dp = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), abstract)
    x_dp = jax.ShapeDtypeStruct((n, cfg.img_size, cfg.img_size, 3),
                                jnp.float32, sharding=batch_sharding(mesh))
    fn = make_dp_infer(
        lambda p, x: infer_fn(p, x, None, cfg, Precision.bf16())["depth"], mesh)
    t0 = time.perf_counter()
    with mesh:
        compiled = fn.lower(p_dp, x_dp).compile()
    print(f"dp compile ok in {time.perf_counter() - t0:.1f}s; "
          f"collectives: {collective_counts(compiled.as_text())}")

    # --- TP (GSPMD Megatron rules, dp=4 x tp=2) ---
    mesh = make_mesh(dp=n // 2, tp=2)
    shardings = param_shardings(abstract, mesh)
    p_tp = jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        abstract, shardings)
    x_tp = jax.ShapeDtypeStruct((n // 2, cfg.img_size, cfg.img_size, 3),
                                jnp.float32, sharding=batch_sharding(mesh))
    jitted = jax.jit(lambda p, x: infer_fn(p, x, None, cfg, Precision.bf16())["depth"])
    t0 = time.perf_counter()
    with mesh:
        compiled = jitted.lower(p_tp, x_tp).compile()
    counts = collective_counts(compiled.as_text())
    print(f"tp compile ok in {time.perf_counter() - t0:.1f}s; collectives: {counts}")

    # --- latency / sp (patch-sharded ViT + row-sharded conv trunk) ---
    sp_mesh = make_sp_mesh()
    rep = NamedSharding(sp_mesh, P())
    p_sp = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep), abstract)
    x_sp = jax.ShapeDtypeStruct((1, cfg.img_size, cfg.img_size, 3),
                                jnp.float32, sharding=rep)
    lat = make_latency_infer(cfg, sp_mesh, Precision.bf16())
    t0 = time.perf_counter()
    with sp_mesh:
        compiled = lat.lower(p_sp, x_sp).compile()
    counts = collective_counts(compiled.as_text())
    print(f"sp compile ok in {time.perf_counter() - t0:.1f}s; collectives: {counts}")


if __name__ == "__main__":
    main()
