"""Fast TPU-tunnel liveness check: run a trivial op with a hard exit.

Exit 0 = tunnel healthy; nonzero/timeout = wedged (do NOT launch heavy
TPU work; killing a heavy job mid-op re-wedges the tunnel ~15 min).
Usage: timeout 90 python scripts/tpu_ping.py && <heavy job>
"""
import sys
import time

t0 = time.perf_counter()
import jax
import jax.numpy as jnp

x = float(jnp.ones((8, 8)).sum())
dev = jax.devices()[0]
print(f"ping ok: {dev} sum={x:.0f} in {time.perf_counter() - t0:.1f}s")
sys.exit(0)
