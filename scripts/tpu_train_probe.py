"""Full-scale training-step probe on the real chip: does one fine-tuning
step at 1536^2 with remat fit and run, and at what step time?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OUT = open("/root/repo/scripts/tpu_train_probe.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


from ml_depth_pro_video_tpu.core.precision import Precision  # noqa: E402
from ml_depth_pro_video_tpu.models.depth_pro import (  # noqa: E402
    DEFAULT_MONODEPTH_CONFIG, init_depth_pro,
)
from ml_depth_pro_video_tpu.train.step import (  # noqa: E402
    TrainState, make_optimizer, train_step,
)
import functools  # noqa: E402

cfg = DEFAULT_MONODEPTH_CONFIG
params = init_depth_pro(jax.random.PRNGKey(0), cfg)
optimizer = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=1000)
state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

step = jax.jit(
    functools.partial(train_step, cfg=cfg, optimizer=optimizer,
                      precision=Precision.bf16()),
    donate_argnums=(0,),
)

for B in (1, 2):
    try:
        images = jnp.zeros((B, cfg.img_size, cfg.img_size, 3), jnp.float32)
        depth = jnp.ones((B, cfg.img_size, cfg.img_size), jnp.float32)
        state, loss = step(state, images, depth)
        float(loss)  # sync
        t0 = time.perf_counter()
        for _ in range(3):
            state, loss = step(state, images, depth)
        lv = float(loss)
        dt = (time.perf_counter() - t0) / 3
        log(f"train step b{B} @1536^2 ViT-L remat: {dt*1000:.0f} ms/step "
            f"loss={lv:.4f} ({B/dt:.2f} img/s/chip)")
    except Exception as e:  # noqa: BLE001
        log(f"train step b{B} FAILED: {type(e).__name__}: {str(e)[:300]}")
        break

log("DONE")
OUT.close()
