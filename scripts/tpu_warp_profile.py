"""Where do 3.8 s/frame of 1536^2 parallax go? Device gather vs tunnel
fetch vs alternative gather formulations."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_warp_profile.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


log(f"devices: {jax.devices()}")

H = W = 1536
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
mapx = jnp.asarray((rng.random((H, W)) * (W - 1)).astype(np.float32))
mapy = jnp.asarray((rng.random((H, W)) * (H - 1)).astype(np.float32))


def timeit(f, *args, iters=3):
    o = f(*args)
    _ = float(jnp.asarray(o).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        o = f(*args)
    _ = float(jnp.asarray(o).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


# current formulation: 2-D advanced indexing, 4 corner gathers
from ml_depth_pro_video_tpu.effects.parallax import bilinear_sample

j_cur = jax.jit(lambda im, mx, my: bilinear_sample(im, mx, my).mean())
log(f"current 2D-index bilinear (device only): {timeit(j_cur, img, mapx, mapy):.0f} ms/frame")


# flat linear-index take
def bilinear_flat(image, map_x, map_y):
    h, w, c = image.shape
    flat = image.reshape(-1, c)
    x = jnp.clip(map_x, 0.0, w - 1.0)
    y = jnp.clip(map_y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = jnp.take(flat, y0 * w + x0, axis=0)
    v01 = jnp.take(flat, y0 * w + x1, axis=0)
    v10 = jnp.take(flat, y1 * w + x0, axis=0)
    v11 = jnp.take(flat, y1 * w + x1, axis=0)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


j_flat = jax.jit(lambda im, mx, my: bilinear_flat(im, mx, my).mean())
log(f"flat take bilinear (device only):       {timeit(j_flat, img, mapx, mapy):.0f} ms/frame")

# separable row-then-column two-stage gather (exact for bilinear: first
# interpolate along x into a (H, W) image at fractional x per target
# column... only valid when map_x depends solely on x? NOT for arbitrary
# maps — skipped; arbitrary maps need true gathers.

# one-hot matmul formulation (gather as MXU matmul) is O(H*W * W) = huge;
# skipped.

# fetch cost: device->host of one fp32 frame
one = jax.jit(lambda im: im * 1.0)(img)
t0 = time.perf_counter()
for _ in range(3):
    _ = np.asarray(one)
log(f"fetch 1536^2 fp32 frame: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms")

# uint8 output variant: cast on device before fetch (4x less tunnel)
j_u8 = jax.jit(lambda im, mx, my: jnp.clip(bilinear_flat(im, mx, my), 0, 255).astype(jnp.uint8))
o = j_u8(img * 255, mapx, mapy)
t0 = time.perf_counter()
for _ in range(3):
    _ = np.asarray(j_u8(img * 255, mapx, mapy))
log(f"flat-take + uint8 cast + fetch: {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms/frame e2e")

# host reference: cv2.remap
try:
    import cv2

    im8 = (np.asarray(img) * 255).astype(np.uint8)
    mx = np.asarray(mapx)
    my = np.asarray(mapy)
    t0 = time.perf_counter()
    for _ in range(3):
        _ = cv2.remap(im8, mx, my, cv2.INTER_LINEAR)
    log(f"cv2.remap on host (1 core):             {(time.perf_counter() - t0) / 3 * 1e3:.0f} ms/frame")
except Exception as exc:
    log(f"cv2 unavailable: {exc}")

log("done")
