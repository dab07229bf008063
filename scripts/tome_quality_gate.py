"""ToMe quality gate WITHOUT real weights (VERDICT r3 #2).

Random-init deviation numbers are meaningless (random features have no
spatial redundancy, so merging averages unrelated tokens — the measured
0.29-0.50 envelope is pessimistic by construction). This script makes a
model whose features DO exhibit spatial redundancy by fitting a
mid-size proxy config on synthetic structured scenes (the real training
loop, on the real chip), then measures the merge-ratio deviation curve
on held-out scenes — with the round-4 proportional-attention bias
active — plus the same curve at random init for contrast.

Proxy model: 8-block ViT (embed 128) at 512 px network resolution —
same topology as the flagship (pyramid, hooks, merge point after 2
blocks, 22/24 = 6/8 of blocks run on the merged sequence).

Run (TPU): python scripts/tome_quality_gate.py
Env: TOME_STEPS (default 480), TOME_SCENES (default 96).
Writes scripts/tome_quality_gate.out.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = open("/root/repo/scripts/tome_quality_gate.out", "w")


def log(m):
    print(m)
    OUT.write(m + "\n")
    OUT.flush()


# ---------------------------------------------------------------------------
# synthetic structured scenes: shared generators (round 5 moved them into
# the package so the CI regression test and the fixture trainer use the
# SAME families — utils/synthetic.py)

from ml_depth_pro_video_tpu.utils.synthetic import (  # noqa: E402
    make_scene_boxes as make_scene,
    write_dataset,
)

# ---------------------------------------------------------------------------


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.models.depth_pro import (
        DepthProConfig, infer_fn, init_depth_pro)
    from ml_depth_pro_video_tpu.models.vit import ViTConfig
    from ml_depth_pro_video_tpu.train.loop import fit

    if os.environ.get("TOME_CPU"):  # deviation curves are value-based,
        # not timing-based — the gate is equally valid on CPU (used when
        # the TPU tunnel is down)
        jax.config.update("jax_platforms", "cpu")
    steps = int(os.environ.get("TOME_STEPS", "480"))
    n_scenes = int(os.environ.get("TOME_SCENES", "96"))
    log(f"devices: {jax.devices()}")

    proxy = DepthProConfig(
        vit=ViTConfig(img_size=128, patch_size=16, embed_dim=128, depth=8,
                      num_heads=4, mlp_ratio=4),
        decoder_features=32,
        dims_encoder=(32, 64, 128, 128),
        hook_block_ids=(1, 3),
        use_fov_head=False,
        checkpoint_uri=None,
    )

    root = "/tmp/tome_scenes"
    if not os.path.exists(os.path.join(root, f"scene_{n_scenes - 1:04d}.png")):
        t0 = time.perf_counter()
        write_dataset(root, n_scenes, size=proxy.img_size)
        log(f"dataset: {n_scenes} scenes in {time.perf_counter() - t0:.0f}s")

    batch = 8
    epochs = max(1, steps * batch // n_scenes)
    t0 = time.perf_counter()
    state = fit(root, cfg=proxy, batch_size=batch, epochs=epochs, lr=3e-4,
                holdout=8, log_every=50,
                checkpoint_dir="/tmp/tome_ckpt", save_every=100)
    log(f"trained {epochs} epochs (~{epochs * (n_scenes - 8) // batch} steps) "
        f"in {time.perf_counter() - t0:.0f}s")
    params = jax.tree.map(np.asarray, state.params)

    # deviation curves on FRESH scenes (rng 123 — never in the training
    # dataset, whose files use rng seed 0; fit()'s own holdout slice is
    # separate and only drives its validation logging)
    rng = np.random.default_rng(123)
    eval_imgs = []
    for _ in range(batch):
        img, _ = make_scene(rng, proxy.img_size)
        eval_imgs.append(img)
    x = jnp.asarray((np.stack(eval_imgs).astype(np.float32) / 127.5) - 1.0)

    # the proxy has no FOV head -> f_px must be supplied (nominal focal)
    f_px = jnp.full((batch,), float(proxy.img_size), jnp.float32)

    def curve(tag, p):
        base = None
        for ratio in (0.0, 0.25, 0.4, 0.5):
            cfg_r = dataclasses.replace(proxy, token_merge_ratio=ratio)
            fn = jax.jit(lambda pp, xx, ff, c=cfg_r: infer_fn(
                pp, xx, ff, c, Precision.bf16())["depth"])
            inv = 1.0 / np.maximum(np.asarray(fn(p, x, f_px)), 1e-6)
            if ratio == 0.0:
                base = inv
                log(f"{tag} ratio 0.00: exact baseline")
                continue
            rel = np.abs(inv - base) / (np.abs(base) + 1e-9)
            log(f"{tag} ratio {ratio:.2f}: inv-depth dev mean "
                f"{rel.mean():.4f}, p95 {np.percentile(rel, 95):.4f}, "
                f"max {rel.max():.4f}")

    curve("trained", params)
    curve("random ", jax.tree.map(np.asarray,
                                  init_depth_pro(jax.random.PRNGKey(0), proxy)))
    log("DONE")


if __name__ == "__main__":
    main()
    OUT.close()
