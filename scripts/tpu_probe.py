"""Self-terminating tunnel liveness probe: writes OK to scripts/tpu_probe.out."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

t0 = time.time()
v = float(jnp.ones((4, 4)).sum())
with open("/root/repo/scripts/tpu_probe.out", "w") as f:
    f.write(f"OK {v} {time.time()-t0:.1f}s {time.strftime('%H:%M:%S')}\n")
