"""Chunked parallax rendering on the real chip (round-3 fix validation):
the clip renders in fixed-size chunks streamed to host instead of one
whole-clip buffer; verify output correctness vs a single-chunk render
and measure throughput at 1536^2."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from PIL import Image

OUT = open("/root/repo/scripts/tpu_parallax_chunked.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


import jax

log(f"devices: {jax.devices()}")

from ml_depth_pro_video_tpu.effects.parallax import parallax_frames

src = Image.open("/root/reference/data/example.jpg").crop((0, 0, 1536, 1536))
img = np.asarray(src)
rng = np.random.default_rng(0)
depth = (2.0 + 8.0 * rng.random((1536, 1536))).astype(np.float32)

# 150 frames at 1536^2 fp32 = 4.2 GB if materialized at once; chunked
# it peaks at ~256 MB of device output
t0 = time.perf_counter()
frames = parallax_frames(img, depth, duration=5.0, fps=30, motion_type="circle")
dt = time.perf_counter() - t0
log(f"150x1536^2 parallax: {dt:.1f}s = {150 / dt:.1f} fps render (chunked)")
assert frames.shape == (150, 1536, 1536, 3) and frames.dtype == np.uint8

# correctness: a short clip that fits one chunk must match a manual
# two-chunk render of the same phases (chunking must not change values)
short = parallax_frames(img, depth, duration=0.2, fps=30)  # 6 frames, 1 chunk
assert short.shape[0] == 6
# re-render with a tiny chunk size by monkeypatching the budget
import ml_depth_pro_video_tpu.effects.parallax as par

orig = par.parallax_frames


def tiny_chunks(image, depth_, **kw):
    import numpy as _np

    import jax.numpy as jnp
    img_j = jnp.asarray(_np.asarray(image, dtype=_np.float32))
    d = _np.asarray(depth_, dtype=_np.float32)
    dn = jnp.asarray((d - d.min()) / max(d.max() - d.min(), 1e-9))
    total = 6
    phases = 2.0 * _np.pi * _np.arange(total, dtype=_np.float32) / total
    chunk = 2
    out = _np.empty((total, 1536, 1536, 3), _np.uint8)
    for i in range(0, total, chunk):
        sel = phases[i:i + chunk]
        ts = jnp.asarray(_np.pad(sel, (0, chunk - len(sel))))
        fr = par._parallax_chunk(img_j, dn, 0.05, ts, "circle")
        out[i:i + len(sel)] = _np.clip(_np.asarray(fr[:len(sel)]), 0, 255).astype(_np.uint8)
    return out


manual = tiny_chunks(img, depth)
same = np.array_equal(manual, short)
log(f"2-frame-chunk render == native-chunk render: {same}")
assert same
log("done")
