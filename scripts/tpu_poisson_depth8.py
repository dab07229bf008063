"""Poisson depth-8 (256^3) vs depth-7 (128^3): surface-error metric.

Synthetic unit sphere with outward normals; error = mean | |v| - 1 |
over reconstructed vertices. The CG solve runs jitted on the TPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_poisson_depth8.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.geom.mesh import poisson_reconstruct  # noqa: E402

rng = np.random.default_rng(0)
n = 60_000
v = rng.standard_normal((n, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
pts = v  # unit sphere samples
normals = -v  # reference convention: normals toward camera at origin

for depth in (6, 7, 8):
    t0 = time.perf_counter()
    mesh = poisson_reconstruct(pts, normals, depth=depth)
    dt = time.perf_counter() - t0
    r = np.linalg.norm(mesh.vertices, axis=1)
    err = np.abs(r - 1.0)
    log(f"depth={depth} ({2**depth}^3): verts={len(mesh.vertices)} "
        f"faces={len(mesh.faces)} mean_err={err.mean()*1000:.2f}mm "
        f"p95_err={np.percentile(err, 95)*1000:.2f}mm time={dt:.1f}s")

log("DONE")
OUT.close()
