"""Production-path probes on the real chip: paths tested on CPU but
never exercised on TPU at full scale."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_prod_paths.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, fold_head_params, infer_fn, init_depth_pro,
)

cfg = DEFAULT_MONODEPTH_CONFIG
params0 = init_depth_pro(jax.random.PRNGKey(0), cfg)

# 1. infer() at real photo dimensions (resize path, 2268x3024 like example.jpg)
try:
    p = fold_head_params(params0)
    x = jnp.zeros((1, 2268, 3024, 3), jnp.float32)
    fi = jax.jit(lambda pp, xx: infer_fn(pp, xx, None, cfg, Precision.bf16())["depth"])
    d = fi(p, x)
    float(jnp.sum(d))
    t0 = time.perf_counter()
    d = fi(p, x)
    float(jnp.sum(d))
    log(f"infer at 2268x3024 (resize path): OK {(time.perf_counter()-t0)*1000:.0f} ms, "
        f"out {d.shape}")
except Exception as e:  # noqa: BLE001
    log(f"resize-path infer FAILED: {type(e).__name__}: {str(e)[:250]}")

# 2. quantized (int8 weight-only ViT) full-scale inference
try:
    from ml_depth_pro_video_tpu.ckpt.quantize import quantize_vit_weights

    qparams = fold_head_params(quantize_vit_weights(params0))
    x = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
    fq = jax.jit(lambda pp, xx: infer_fn(pp, xx, None, cfg, Precision.bf16())["depth"])
    d = fq(qparams, x)
    float(jnp.sum(d))
    t0 = time.perf_counter()
    d = fq(qparams, x)
    float(jnp.sum(d))
    log(f"int8-weight infer b2: OK {(time.perf_counter()-t0)*1000:.0f} ms")
except Exception as e:  # noqa: BLE001
    log(f"quantized infer FAILED: {type(e).__name__}: {str(e)[:250]}")

# 3. latency-parallel path on ONE real device (sp=1 degenerate mesh)
try:
    from ml_depth_pro_video_tpu.parallel.latency import make_latency_infer, make_sp_mesh

    lat = make_latency_infer(cfg, make_sp_mesh(), Precision.bf16())
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    d = lat(fold_head_params(params0), x)["depth"]
    float(jnp.sum(d))
    log("latency-parallel infer on sp=1 real mesh: OK")
except Exception as e:  # noqa: BLE001
    log(f"latency sp=1 FAILED: {type(e).__name__}: {str(e)[:250]}")

# 4. HTTP serving end-to-end on the chip (full-size JPEG request)
try:
    import io
    import threading
    import urllib.request

    from PIL import Image

    from ml_depth_pro_video_tpu.serve.server import create_server
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    runner = DepthVideoRunner(precision="bf16", batch_size=1)
    srv = create_server("127.0.0.1", 18500, runner=runner)
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    img = Image.open("/root/reference/data/example.jpg")
    img = img.resize((img.width // 2, img.height // 2))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")

    with urllib.request.urlopen("http://127.0.0.1:18500/healthz", timeout=30) as r:
        log(f"healthz: {r.read().decode()[:80]}")
    req = urllib.request.Request("http://127.0.0.1:18500/v1/depth",
                                 data=buf.getvalue(), method="POST")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=600) as r:
        body = r.read().decode()
    log(f"serve POST /v1/depth (real jpeg, cold): OK {(time.perf_counter()-t0):.1f} s "
        f"{body[:120]}")
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=120) as r:
        r.read()
    log(f"serve POST warm: {(time.perf_counter()-t0)*1000:.0f} ms")
    srv.shutdown()
except Exception as e:  # noqa: BLE001
    log(f"serve e2e FAILED: {type(e).__name__}: {str(e)[:250]}")

log("DONE")
OUT.close()
