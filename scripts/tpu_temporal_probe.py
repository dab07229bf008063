"""On-chip cost of the device-side temporal smoother at production dims
(video/temporal.py::smooth_batch — lax.scan of the EMA update over a
(8, 1536, 1536) batch). Expectation: negligible next to the ~1.3 s
model batch; this probe pins the number for docs/PERFORMANCE.md."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.video.temporal import smooth_batch

OUT = open("/root/repo/scripts/tpu_temporal_probe.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


B, H, W = 8, 1536, 1536
key = jax.random.PRNGKey(0)
depths = 2.0 + jax.random.uniform(key, (B, H, W), jnp.float32)
state = depths[0]

# one warm call compiles; state stays on device between calls as in the
# runner's collect loop
st, sm = smooth_batch(state, depths, B, alpha=0.8)
float(jnp.sum(sm))  # sync

iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    st, sm = smooth_batch(st, depths, B, alpha=0.8)
float(jnp.sum(sm))  # scalar host fetch sync (block_until_ready unreliable here)
dt = (time.perf_counter() - t0) / iters
log(f"smooth_batch (8,1536,1536) fp32: {dt*1000:.2f} ms/batch = "
    f"{dt*1000/B:.3f} ms/frame (incl ~4 ms dispatch overhead)")
log(f"device: {jax.devices()[0]}")
log("done")
OUT.close()
