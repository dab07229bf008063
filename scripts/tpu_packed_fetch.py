"""Packed-fetch probe: sustained `depth_stream` throughput on the real
TPU with fetch_pack='none' vs 'u16' (video/pack.py), plus raw fetch
ms/frame for each representation.

Context: scripts/feed_sustained.out measured 80.6% host stall in the
streaming loop on this environment's tunnel (~70 MB/s host<->device);
the fp32 depth fetch is 9.4 MB/frame at 1536^2. Log-u16 packing halves
that; this probe measures what the halving buys end-to-end.

Env: PACK_SECONDS (default 45), PACK_BATCH (default 8).
Writes scripts/tpu_packed_fetch.out.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_packed_fetch.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    seconds = float(os.environ.get("PACK_SECONDS", "45"))
    batch = int(os.environ.get("PACK_BATCH", "8"))
    log(f"devices: {jax.devices()}  batch={batch}  window={seconds:.0f}s")

    rng = np.random.default_rng(0)

    # ONE runner for both windows: fetch_pack is consulted per
    # depth_stream call, so swapping the attribute reuses the compiled
    # infer program (the second window then costs zero extra compile)
    t0 = time.perf_counter()
    runner = DepthVideoRunner(batch_size=batch, precision="bf16")
    s = runner.cfg.img_size
    ring = [rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
            for _ in range(16)]

    def frames(n):
        for i in range(n):
            yield ring[i % len(ring)]

    for _ in runner.depth_stream(frames(2 * batch)):  # warmup/compile
        pass
    log(f"compile+warmup: {time.perf_counter() - t0:.0f}s")

    def window(fetch_pack):
        runner.fetch_pack = fetch_pack
        done = 0
        t0 = time.perf_counter()
        stream = runner.depth_stream(frames(10 ** 9))
        for _ in stream:
            done += 1
            if done % batch == 0 and time.perf_counter() - t0 > seconds:
                break
        dt = time.perf_counter() - t0
        stream.close()
        return done / dt

    def raw_fetch(fetch_pack):
        # raw fetch cost of this representation (device->host only)
        x = jnp.asarray(np.stack(ring[:batch]))
        out = runner._infer(x, None)
        depth_dev = out["depth"]
        if fetch_pack == "u16":
            from ml_depth_pro_video_tpu.video.pack import pack_depth_u16
            u, lmin, lscale = pack_depth_u16(depth_dev)
            float(jnp.sum(lmin))  # sync
            t0 = time.perf_counter()
            host = np.asarray(u)
            np.asarray(lmin), np.asarray(lscale)
        else:
            float(jnp.mean(depth_dev[:, 0, 0]))  # sync
            t0 = time.perf_counter()
            host = np.asarray(depth_dev)
        ms = (time.perf_counter() - t0) * 1000 / batch
        log(f"raw depth fetch {fetch_pack!r}: {ms:.0f} ms/frame "
            f"({host.nbytes / batch / 1e6:.1f} MB/frame)")

    # warm the pack-kernel compile
    runner.fetch_pack = "u16"
    for _ in runner.depth_stream(frames(batch)):
        pass

    # the tunnel's bandwidth DRIFTS minute-to-minute (measured 30-70
    # MB/s), so back-to-back single windows confound drift with the
    # packing effect: interleave none/u16 windows and compare medians
    fps = {"none": [], "u16": []}
    for rep in range(3):
        for mode in ("none", "u16"):
            f = window(mode)
            fps[mode].append(f)
            log(f"rep {rep} fetch_pack={mode!r}: {f:.2f} fps sustained")
    med = {m: sorted(v)[len(v) // 2] for m, v in fps.items()}
    log(f"median sustained: none={med['none']:.2f} u16={med['u16']:.2f} "
        f"fps -> speedup {med['u16'] / med['none']:.2f}x")
    raw_fetch("none")
    raw_fetch("u16")
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
