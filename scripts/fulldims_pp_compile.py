"""AOT-compile the PRODUCTION-dims (ViT-L, 1536^2) GPipe pp train step
on a fake 8-device CPU mesh (dp=2 x pp=4) and audit its collectives.

Abstract-params mode: no weights are materialized — measures whether a
full-dims pp compile is cheap enough to wire into
__graft_entry__._certify_full_dims (and what the program's collective
profile is).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG,
    init_depth_pro,
)
from ml_depth_pro_video_tpu.parallel.pipeline import (  # noqa: E402
    make_pp_mesh,
    make_pp_train_step,
)

cfg = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
mesh = make_pp_mesh(dp=2, pp=4)

t0 = time.perf_counter()
abstract = jax.eval_shape(lambda: init_depth_pro(jax.random.PRNGKey(0), cfg))
with mesh:
    state, step = make_pp_train_step(abstract, cfg, mesh, microbatches=5,
                                     precision=Precision.bf16(),
                                     optimizer=optax.sgd(1e-4))
    print(f"abstract state build {time.perf_counter() - t0:.1f}s", flush=True)
    images = jax.ShapeDtypeStruct((2, cfg.img_size, cfg.img_size, 3),
                                  jnp.float32)
    depth = jax.ShapeDtypeStruct((2, cfg.img_size, cfg.img_size), jnp.float32)
    t0 = time.perf_counter()
    lowered = step.lower(state, images, depth)
    print(f"lower {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile {time.perf_counter() - t0:.1f}s", flush=True)

import __graft_entry__ as g  # noqa: E402

cols = g._collect_collectives(compiled.as_text())
counts = {k: len(v) for k, v in cols.items() if v}
big_ag = [(b // 1_000_000, s) for b, s in cols["all-gather"]
          if b >= 32 * 1024 * 1024]
print("collectives:", counts)
print("all-gathers >=32MB:", big_ag)
print("DONE")
