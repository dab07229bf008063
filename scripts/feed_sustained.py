"""Sustained-throughput harness (VERDICT r3 #5): stream pre-decoded
in-RAM uint8 frames through the REAL `DepthVideoRunner.depth_stream`
loop on the real TPU for ~60 s and report

  - sustained fps (runner machinery + device compute end-to-end),
  - host-stall fraction vs the pure-jit kernel rate (bench.py's 6.15
    fps/chip): stall% = 1 - sustained/pure,
  - per-worker decode scaling of the runner's bounded decode pool
    (JPEG bytes -> arrays at 1/2/4/8 workers; on this 1-core VM the
    scaling is flat BY CONSTRUCTION — the point is the measured
    ms/frame per worker so real multi-core hosts can be sized:
    cores_needed = decode_ms_per_frame * target_fps / 1000).

Env: FEED_SECONDS (default 60), FEED_BATCH (default 8).
Writes scripts/feed_sustained.out.
"""
import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/feed_sustained.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    import jax

    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    seconds = float(os.environ.get("FEED_SECONDS", "60"))
    batch = int(os.environ.get("FEED_BATCH", "8"))
    log(f"devices: {jax.devices()}  batch={batch}  window={seconds:.0f}s")

    runner = DepthVideoRunner(batch_size=batch, precision="bf16")
    s = runner.cfg.img_size

    # ring of pre-decoded frames (distinct contents so nothing caches)
    rng = np.random.default_rng(0)
    ring = [rng.integers(0, 255, (s, s, 3), dtype=np.uint8) for _ in range(16)]

    def frames(n):
        for i in range(n):
            yield ring[i % len(ring)]

    # warmup: compile + first batches through the full loop
    for _ in runner.depth_stream(frames(2 * batch)):
        pass

    def window(secs):
        done = 0
        t0 = time.perf_counter()
        stream = runner.depth_stream(frames(10 ** 9))
        for r in stream:
            done += 1
            if done % batch == 0 and time.perf_counter() - t0 > secs:
                break
        dt = time.perf_counter() - t0
        stream.close()  # shut the prefetch thread down cleanly
        return done, dt

    # sustained window: run whole batches until the clock runs out
    done, dt = window(seconds)
    fps = done / dt
    log(f"sustained (pipeline_depth={runner.pipeline_depth}): "
        f"{done} frames in {dt:.1f}s = {fps:.2f} fps")
    runner.pipeline_depth = 1
    d1, t1 = window(seconds / 2)
    log(f"sustained (pipeline_depth=1): {d1} frames in {t1:.1f}s "
        f"= {d1 / t1:.2f} fps")
    runner.pipeline_depth = 2

    # pure-kernel rate for the stall fraction (same batch, same params,
    # no runner machinery): reuse the runner's own jitted fn
    x = np.stack([ring[i % len(ring)] for i in range(batch)])
    import jax.numpy as jnp

    xd = jnp.asarray(x)
    r = runner._infer(xd, None) if hasattr(runner, "_infer") else None
    if r is None:
        log("pure-jit reference unavailable (runner internals changed); "
            "compare against bench.py")
        pure = None
    else:
        jax.tree.leaves(r)[0].block_until_ready()
        t0 = time.perf_counter()
        iters = max(3, int(seconds / 4 * fps / batch))
        for _ in range(iters):
            r = runner._infer(xd, None)
        float(jnp.mean(jax.tree.leaves(r)[0]).astype(jnp.float32))
        pure = batch * iters / (time.perf_counter() - t0)
        log(f"pure-jit: {pure:.2f} fps -> host-stall "
            f"{max(0.0, 1 - fps / pure) * 100:.1f}%")

    # stall attribution: raw per-frame transfer terms over this host's
    # link (the axon tunnel caps host<->device at ~70 MB/s; a real
    # TPU-VM PCIe link moves these in ~1 ms)
    up = jnp.asarray(ring[0])  # warm path
    up.block_until_ready()
    t0 = time.perf_counter()
    for i in range(8):
        jnp.asarray(ring[i % len(ring)]).block_until_ready()
    up_ms = (time.perf_counter() - t0) / 8 * 1000
    log(f"uint8 frame upload: {up_ms:.0f} ms/frame "
        f"({ring[0].nbytes / 1e6:.1f} MB)")
    d = runner._infer(jnp.asarray(np.stack(ring[:batch])), None)
    depth_dev = d["depth"] if isinstance(d, dict) else jax.tree.leaves(d)[0]
    depth_dev.block_until_ready()
    t0 = time.perf_counter()
    host = np.asarray(depth_dev)
    fetch_ms = (time.perf_counter() - t0) * 1000 / batch
    log(f"depth batch fetch: {fetch_ms:.0f} ms/frame "
        f"({host.nbytes / batch / 1e6:.1f} MB)")
    if pure:
        serial = up_ms + fetch_ms + 1000.0 / pure
        log(f"serial bound (upload + compute + fetch, no overlap): "
            f"{serial:.0f} ms/frame = {1000 / serial:.2f} fps -> runner "
            f"machinery + unoverlapped share: {1000 / fps - serial:+.0f} ms/frame")

    # decode scaling: the runner pool's JPEG decode ms/frame per worker,
    # for BOTH pool types (VERDICT r4 #6: thread scaling flattens past 2
    # workers — numpy conversion/EXIF hold the GIL even though the codec
    # releases it; the process pool is the hedge on real multi-core
    # hosts, at a ~7 MB/frame pickle return cost)
    import os
    import tempfile

    from PIL import Image

    from ml_depth_pro_video_tpu.video.runner import _load_frame

    td = tempfile.mkdtemp(prefix="feed_decode_")
    paths = []
    for i in range(8):
        p = os.path.join(td, f"f{i}.jpg")
        Image.fromarray(ring[i % len(ring)]).save(p, format="JPEG", quality=90)
        paths.append(p)
    n = 32
    for pool_kind in ("thread", "process"):
        for workers in (1, 2, 4, 8):
            if pool_kind == "thread":
                from concurrent.futures import ThreadPoolExecutor as _PX

                px = _PX(workers)
            else:
                import multiprocessing
                from concurrent.futures import ProcessPoolExecutor as _QX

                px = _QX(workers,
                         mp_context=multiprocessing.get_context("spawn"))
            with px:
                # warm the pool (spawn cost excluded — it's one-time)
                list(px.map(_load_frame, paths[:workers]))
                t0 = time.perf_counter()
                list(px.map(_load_frame, [paths[i % 8] for i in range(n)]))
                dt = (time.perf_counter() - t0) / n
            log(f"decode {pool_kind} pool {workers} workers: "
                f"{dt * 1000:.1f} ms/frame ({1 / dt:.1f} fps ceiling)")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
