"""Sustained load test of the HTTP serving layer (`serve/server.py`).

The serving layer's correctness (batching, misroutes, mixed
resolutions) is covered by tests/test_serve.py; this script measures
what production cares about: client-observed latency percentiles,
sustained request throughput, error rate, and how well the `_Batcher`
coalesces concurrent requests into full device batches — and compares
the served throughput against the same runner driven directly
(`depth_stream`), i.e. the overhead of the whole HTTP + queue + resize
layer.

The reference has no serving story at all (SURVEY.md §1: "no serving
layer"); this harness substantiates the beyond-reference claim with
numbers rather than a feature bullet.

Usage:
  # CPU smoke (tiny model, fake devices fine):
  python scripts/serve_loadtest.py --cpu --model tiny --clients 8 --duration 20
  # real-TPU full model:
  python scripts/serve_loadtest.py --model large --clients 16 --duration 60 \
      --max_batch 8 --size 1536

Prints a human summary plus ONE machine-readable JSON line (tag
SERVE_LOADTEST).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _png_bytes(size: int, seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def _post(url: str, body: bytes, timeout: float = 600.0) -> dict:
    req = urllib.request.Request(url + "/v1/depth", data=body,
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--model", default="tiny",
                    help="tiny | large | base | small")
    ap.add_argument("--precision", default=None,
                    help="default: fp32 for tiny, bf16 otherwise")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--duration", type=float, default=30.0,
                    help="seconds of sustained load (after warmup)")
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--max_wait_ms", type=float, default=30.0)
    ap.add_argument("--size", type=int, default=None,
                    help="posted image side (default: the model's "
                         "img_size, so no host resize)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS=cpu; this flag uses "
                         "jax.config)")
    ap.add_argument("--no_baseline", action="store_true",
                    help="skip the direct depth_stream comparison run")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ml_depth_pro_video_tpu.models.depth_pro import (
        model_preset,
        tiny_config,
    )
    from ml_depth_pro_video_tpu.serve.server import create_server
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    cfg = tiny_config() if args.model == "tiny" else model_preset(args.model)
    precision = args.precision or ("fp32" if args.model == "tiny" else "bf16")
    runner = DepthVideoRunner(cfg=cfg, precision=precision,
                              batch_size=args.max_batch)
    server = create_server(port=0, runner=runner, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"
    threading.Thread(target=server.serve_forever, daemon=True).start()

    size = args.size or int(cfg.img_size)
    bodies = [_png_bytes(size, seed) for seed in range(args.clients)]

    # warmup: compile the full-batch program and every partial tail the
    # batcher can form, then let the steady-state window start clean
    print(f"warmup ({args.max_batch} parallel then 1 single)...", flush=True)
    t0 = time.perf_counter()
    warm = [threading.Thread(target=_post, args=(url, bodies[0]))
            for _ in range(args.max_batch)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()
    _post(url, bodies[0])
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    stop_at = time.perf_counter() + args.duration
    latencies: list[float] = []
    errors = [0]
    lock = threading.Lock()

    def client(i: int) -> None:
        body = bodies[i]
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            try:
                _post(url, body)
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
            except Exception:  # noqa: BLE001
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    wall0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - wall0

    lat = np.sort(np.asarray(latencies))
    n = len(lat)
    if n == 0:
        raise SystemExit("no successful requests — see server log")
    p = lambda q: float(lat[min(int(q * n), n - 1)])  # noqa: E731
    served_fps = n / wall

    # batch coalescing from the server's own metrics endpoint
    with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
        metrics_text = r.read().decode()

    def _metric(name: str) -> float:
        m = re.search(rf"^{name}(?:{{[^}}]*}})? ([0-9.e+-]+)$",
                      metrics_text, re.M)
        return float(m.group(1)) if m else float("nan")

    batch_sum = _metric("depthpro_batch_frames_total")
    batch_count = _metric("depthpro_batches_total")
    mean_batch = batch_sum / batch_count if batch_count else float("nan")

    base_fps = None
    if not args.no_baseline:
        # the same runner driven directly, same number of frames: the
        # difference is the full HTTP + queue + PNG-decode + resize cost
        frames = [np.asarray(
            (np.random.default_rng(s).random((size, size, 3)) * 255)
            .astype(np.uint8)) for s in range(args.max_batch)]
        n_base = max(int(served_fps * min(args.duration, 20)),
                     2 * args.max_batch)
        items = [frames[i % len(frames)] for i in range(n_base)]
        list(runner.depth_stream(items[:args.max_batch]))  # warm
        b0 = time.perf_counter()
        n_got = sum(1 for _ in runner.depth_stream(items))
        base_fps = n_got / (time.perf_counter() - b0)

    print(f"\nclients={args.clients} duration={wall:.1f}s "
          f"model={args.model} size={size} max_batch={args.max_batch} "
          f"max_wait={args.max_wait_ms}ms")
    print(f"requests: {n} ok, {errors[0]} errors -> {served_fps:.2f} req/s")
    print(f"latency: p50 {p(0.5)*1e3:.0f} ms  p90 {p(0.9)*1e3:.0f} ms  "
          f"p99 {p(0.99)*1e3:.0f} ms  max {lat[-1]*1e3:.0f} ms")
    print(f"batching: mean batch {mean_batch:.2f} / {args.max_batch}")
    if base_fps:
        print(f"direct depth_stream on the same runner: {base_fps:.2f} fps "
              f"-> serving overhead {(1 - served_fps / base_fps) * 100:.1f}%")
    record = {
        "tag": "SERVE_LOADTEST", "model": args.model, "size": size,
        "clients": args.clients, "duration_s": round(wall, 2),
        "requests_ok": n, "errors": errors[0],
        "req_per_s": round(served_fps, 3),
        "p50_ms": round(p(0.5) * 1e3, 1), "p90_ms": round(p(0.9) * 1e3, 1),
        "p99_ms": round(p(0.99) * 1e3, 1),
        "mean_batch": round(mean_batch, 2), "max_batch": args.max_batch,
        "direct_fps": round(base_fps, 3) if base_fps else None,
    }
    print(json.dumps(record))
    server.shutdown()


if __name__ == "__main__":
    main()
