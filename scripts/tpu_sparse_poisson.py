"""Sparse narrow-band Poisson at depth 9 with the coarse solve on TPU.

Sphere benchmark matching scripts/tpu_poisson_depth8.py: mean |r-1|
surface error and wall time at depth 8 (dense 256^3, TPU CG) vs depth 9
(sparse band at 512^3; the 256^3 coarse solve rides the TPU, the band
CG runs on host threads).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ml_depth_pro_video_tpu.geom.mesh import estimate_normals, poisson_reconstruct

OUT = open("/root/repo/scripts/tpu_sparse_poisson.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


rng = np.random.default_rng(0)
n = 60_000
v = rng.standard_normal((n, 3))
v /= np.linalg.norm(v, axis=1, keepdims=True)
normals = estimate_normals(v, radius=0.05, camera=(0, 0, 0))

for depth in (8, 9):
    t0 = time.time()
    mesh = poisson_reconstruct(v, -normals, depth=depth)
    dt = time.time() - t0
    r = np.linalg.norm(mesh.vertices, axis=1)
    err = np.abs(r - 1.0)
    log(f"depth {depth}: {len(mesh.vertices)} verts {len(mesh.faces)} faces, "
        f"mean err {err.mean()*1000:.3f} mm, p95 {np.quantile(err, 0.95)*1000:.3f} mm, {dt:.0f}s")
log("DONE")
