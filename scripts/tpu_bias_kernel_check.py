"""Verify the ToMe proportional-attention bias kernel LOWERS and runs
on the real chip after the round-5 sublane-tile fix (the (1, S) bias
block violated Mosaic's rule and failed on hardware — caught by the
trained-proxy eval, invisible to interpret-mode tests).

Checks, at the proxy dims that crashed AND at production dims:
1. flash_attention_packed_bias == XLA reference (on-chip numerics)
2. the full --speed fast / balanced infer path runs at batch 8 and its
   fps still matches the round-3 curve (the tier's headline claim).

Self-terminating. Writes scripts/tpu_bias_kernel_check.out.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tpu_bias_kernel_check.out", "w")


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")
    OUT.flush()


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.models.depth_pro import (
        DEFAULT_MONODEPTH_CONFIG,
        apply_speed,
        infer_fn,
        init_depth_pro,
    )
    from ml_depth_pro_video_tpu.ops.attention import (
        flash_attention_packed_bias,
        xla_attention_packed,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # kernel-level parity at the EXACT shapes that crashed (proxy eval:
    # 140 batch rows, 128-token merged sequence, d=128) and production
    for tag, (b, s, d, nh) in (("proxy-crash", (140, 98, 128, 4)),
                               ("production", (280, 434, 1024, 16))):
        qkv = jnp.asarray(rng.standard_normal((b, s, 3 * d)).astype(np.float32)
                          ).astype(jnp.bfloat16)
        bias = jnp.asarray(
            rng.uniform(0, 2, (b, s)).astype(np.float32))
        ref = xla_attention_packed(qkv, nh, bias)
        got = flash_attention_packed_bias(qkv, bias, nh)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        log(f"bias kernel {tag} b={b} s={s} d={d}: max abs err {err:.2e} "
            f"(rel {err/scale:.2e}) — {'OK' if err/scale < 2e-2 else 'FAIL'}")

    # end-to-end speed tiers at batch 8 (the r3 curve re-check through
    # the now-actually-pallas bias path)
    cfg0 = dataclasses.replace(DEFAULT_MONODEPTH_CONFIG, checkpoint_uri=None)
    params = init_depth_pro(jax.random.PRNGKey(0), cfg0)
    x = jnp.asarray(rng.standard_normal(
        (8, cfg0.img_size, cfg0.img_size, 3)).astype(np.float32))
    for speed in ("balanced", "fast"):
        cfg = apply_speed(cfg0, speed)
        fn = jax.jit(lambda p, xx, c=cfg: infer_fn(
            p, xx, None, c, Precision.bf16())["depth"])
        d0 = fn(params, x)
        float(jnp.sum(d0).astype(jnp.float32))  # compile + sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            dd = fn(params, x)
            float(jnp.sum(dd).astype(jnp.float32))
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(f"--speed {speed}: {t*1000:.0f} ms/b8 = {8/t:.2f} fps/chip "
            f"(r3 curve: balanced 7.35, fast 8.84)")
        time.sleep(3)
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
