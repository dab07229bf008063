"""Isolate device compute vs tunnel fetch for one 36-frame parallax
chunk at 1536^2 (round-3): device renders 54 ms/frame; the e2e 0.5
s/frame is the axon tunnel's ~13 MB/s large-transfer rate, not compute."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from ml_depth_pro_video_tpu.effects import parallax as par

rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((1536, 1536, 3)).astype(np.float32) * 255)
dn = jnp.asarray(rng.random((1536, 1536)).astype(np.float32))
ts = jnp.asarray(2 * np.pi * np.arange(36, dtype=np.float32) / 150)

fn = jax.jit(lambda i, d, t: par._parallax_chunk(i, d, 0.05, t, "circle").sum())
o = fn(img, dn, ts); _ = int(o)
t0 = time.perf_counter()
for _i in range(3):
    o = fn(img, dn, ts)
_ = int(o)
print(f"device-only 36-frame chunk: {(time.perf_counter()-t0)/3:.2f} s = {(time.perf_counter()-t0)/3/36*1e3:.0f} ms/frame")

full = jax.jit(lambda i, d, t: par._parallax_chunk(i, d, 0.05, t, "circle"))
o = full(img, dn, ts); _ = int(jnp.asarray(o)[0, 0, 0, 0])
t0 = time.perf_counter()
for _i in range(3):
    _ = np.asarray(full(img, dn, ts))
print(f"chunk + fetch: {(time.perf_counter()-t0)/3:.2f} s = {(time.perf_counter()-t0)/3/36*1e3:.0f} ms/frame")
