"""Bound the 8-chip host feed (VERDICT r2 next #4).

Drives the REAL `DepthVideoRunner.depth_stream` on the 8-virtual-device
CPU mesh with the model replaced by a trivial fixed-output stub, so the
measured rate is the HOST FEED path alone: decode -> uint8 stack ->
device_put -> P("dp") shard -> dispatch -> depth fetch. This turns the
only unmeasured term of the v5e-8 `8 x 6.16 = 49 fps` projection into a
number.

Three feeds, worst to best case:
  - png:   1536^2 PNG files (decode-bound; this host has ONE core)
  - jpeg:  1536^2 JPEG files (faster decode)
  - array: pre-decoded uint8 ndarrays (isolates stack+put+shard+fetch)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402

OUT = open("/root/repo/scripts/feed_ceiling_8dev.out", "w")


def log(m):
    OUT.write(m + "\n")
    OUT.flush()


log(f"devices: {len(jax.devices())} {jax.devices()[0].platform}")

from ml_depth_pro_video_tpu.models.depth_pro import DEFAULT_MONODEPTH_CONFIG, tiny_config  # noqa: E402
from ml_depth_pro_video_tpu.parallel.mesh import make_mesh  # noqa: E402
from ml_depth_pro_video_tpu.video import runner as runner_mod  # noqa: E402


def stub_infer_fn(params, x, f_px, cfg, precision=None, derive_missing=False):
    """Fixed-output stand-in for the model: materializes the real-shaped
    (B, H, W) depth output without ViT compute. The x[:, 0, 0, 0] use
    keeps the input live (the feed's device_put is not DCE'd) while the
    full normalization/compute is."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    depth = jnp.full((b, h, w), 1.0, jnp.float32) * (1.0 + 0.0 * x[:, :1, :1, 0])
    return {"depth": depth, "focallength_px": jnp.full((b,), 1000.0, jnp.float32)}


runner_mod.infer_fn = stub_infer_fn

frames_dir = "/tmp/feed_frames"
os.makedirs(frames_dir, exist_ok=True)
src = Image.open("/root/reference/data/example.jpg").crop((0, 0, 1536, 1536))
src.save(f"{frames_dir}/frame.png")
src.save(f"{frames_dir}/frame.jpg", quality=92)
arr = np.asarray(src)

N = 64
mesh = make_mesh(dp=8, tp=1)
# cfg only shapes the (never-run) model init — tiny keeps setup instant
runner = runner_mod.DepthVideoRunner(
    cfg=tiny_config(), precision="bf16", batch_size=8, mesh=mesh)

with mesh:
    for name, items in (
        ("array", [arr] * N),
        ("jpeg", [f"{frames_dir}/frame.jpg"] * N),
        ("png", [f"{frames_dir}/frame.png"] * N),
    ):
        # warmup (compile the stub program + prime caches)
        _ = list(runner.depth_stream(items[:8]))
        t0 = time.perf_counter()
        out = list(runner.depth_stream(items))
        dt = time.perf_counter() - t0
        assert len(out) == N and out[0]["depth"].shape == (1536, 1536)
        log(f"{name:5s} feed: {N} frames in {dt:.2f}s = {N / dt:.1f} fps "
            f"({dt / N * 1e3:.0f} ms/frame) at batch 8 over dp=8")

# the parallel-decode loader (decode_workers=4) — thread-oversubscribed
# on this 1-core host, so this only demonstrates the mechanism; the
# per-frame decode cost above divides by the worker count on a real
# multi-core TPU-VM host
runner4 = runner_mod.DepthVideoRunner(
    cfg=tiny_config(), precision="bf16", batch_size=8, mesh=mesh,
    decode_workers=4)
with mesh:
    items = [f"{frames_dir}/frame.png"] * N
    _ = list(runner4.depth_stream(items[:8]))
    t0 = time.perf_counter()
    out = list(runner4.depth_stream(items))
    dt = time.perf_counter() - t0
    assert len(out) == N
    log(f"png   feed, decode_workers=4: {N / dt:.1f} fps ({dt / N * 1e3:.0f} ms/frame)")

log(f"note: ONE host core here; the loader is a single thread either "
    f"way, but PNG/JPEG decode and the uint8 stack would overlap device "
    f"compute on a real multi-core TPU-VM host")
log("done")
