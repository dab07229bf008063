"""Real-TPU check of the AOT export path (ckpt/export.py): export the
tiny program ON the TPU platform (Mosaic custom calls included),
serialize, deserialize, execute, and compare against the jitted path.

Writes scripts/tpu_export_check.out.
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ml_depth_pro_video_tpu.ckpt.export import export_infer, load_exported  # noqa: E402
from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    fold_head_params,
    infer_fn,
    init_depth_pro,
    tiny_config,
)

out_lines = []


def log(s):
    print(s, flush=True)
    out_lines.append(s)


cfg = tiny_config()
log(f"devices: {jax.devices()}")

with tempfile.NamedTemporaryFile(suffix=".jaxexp", delete=False) as f:
    path = f.name
exported = export_infer(cfg, "fp32", batch_size=1, path=path)
log(f"exported platforms={exported.platforms}")

ex = load_exported(path, cfg, "fp32")
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
# CONDITION the output away from the 1/clip(inverse_depth) pole: at
# random init many canonical pixels sit near 0, where depth = 1/x
# amplifies platform recompile noise (the StableHLO roundtrip may pick
# different bf16-pass fusions on TPU) into percent-scale depth diffs —
# measured 4.4e-2 unconditioned vs harmless canonical-space noise.
params["head"]["conv_out"]["w"] = params["head"]["conv_out"]["w"] * 0.01
params["head"]["conv_out"]["b"] = jnp.full((1,), 0.5, jnp.float32)
params = jax.tree.map(jnp.asarray, fold_head_params(params))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 256, (1, cfg.img_size, cfg.img_size, 3),
                             dtype=np.uint8))
out = np.asarray(ex.call(params, x)["depth"])
# the reference MUST be the jitted program: eager op-by-op dispatch on
# TPU rounds differently than the fused jit (measured 2e-2 apart —
# that gap is eager-vs-jit, not the export roundtrip)
ref_jit = jax.jit(lambda p, v: infer_fn(
    p, v.astype(jnp.float32) / 127.5 - 1.0, None, cfg,
    Precision.fp32())["depth"])
ref = np.asarray(ref_jit(params, x))
rel = float(np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9))
log(f"TPU exported-vs-jit max rel diff (conditioned head): {rel:.2e}")
assert np.isfinite(out).all()
assert rel < 5e-3, rel

import time  # noqa: E402

# dispatch cost sanity: exported .call vs jit steady-state
for name, fn in (("jit", jax.jit(lambda p, v: infer_fn(
        p, v.astype(jnp.float32) / 127.5 - 1.0, None, cfg,
        Precision.fp32())["depth"])), ("exported", lambda p, v: ex.call(p, v)["depth"])):
    r = np.asarray(fn(params, x))  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        r = np.asarray(fn(params, x))
    log(f"{name}: {(time.perf_counter() - t0) / 5 * 1000:.1f} ms/call (tiny, tunnel-bound)")

log("DONE")
with open("/root/repo/scripts/tpu_export_check.out", "w") as f:
    f.write("\n".join(out_lines) + "\n")
