"""Multi-chip path on the 8-fake-device CPU mesh: DP+TP train step,
sharded inference, and the graft entry dryrun."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    infer_fn,
    init_depth_pro,
    tiny_config,
)
from ml_depth_pro_video_tpu.parallel.mesh import batch_sharding, make_mesh
from ml_depth_pro_video_tpu.parallel.sharding import param_shardings, shard_params
from ml_depth_pro_video_tpu.train.step import make_sharded_train_step

DRY_CFG = tiny_config()


def test_round_batch_to_dp():
    """One rounding rule shared by the runner and the trainer
    (parallel/mesh.py): batch sizes round UP to a dp multiple, exact
    multiples (and dp=1 meshes) pass through untouched."""
    from ml_depth_pro_video_tpu.parallel.mesh import round_batch_to_dp

    mesh = make_mesh(dp=4, tp=2)
    assert round_batch_to_dp(8, mesh) == 8
    assert round_batch_to_dp(5, mesh) == 8
    assert round_batch_to_dp(1, mesh) == 4
    assert round_batch_to_dp(3, make_mesh(dp=1, tp=8)) == 3


def test_mesh_and_tp_shardings():
    mesh = make_mesh(dp=4, tp=2)
    assert dict(mesh.shape) == {"dp": 4, "tp": 2}
    params = init_depth_pro(jax.random.PRNGKey(0), DRY_CFG)
    sh = param_shardings(params, mesh)
    # attention + MLP weights are TP-sharded (the HEAD-CONTIGUOUS qkv
    # packing makes the column shard land on whole heads)
    assert sh["encoder"]["patch_vit"]["blocks"]["fc1_w"].spec == P(None, None, "tp")
    assert sh["encoder"]["patch_vit"]["blocks"]["fc2_w"].spec == P(None, "tp", None)
    assert sh["encoder"]["patch_vit"]["blocks"]["qkv_w"].spec == P(None, None, "tp")
    assert sh["decoder"]["convs"][1].spec == P()
    sharded = shard_params(params, mesh)
    # fc1 columns split across tp=2
    fc1 = sharded["encoder"]["patch_vit"]["blocks"]["fc1_w"]
    assert fc1.sharding.shard_shape(fc1.shape)[-1] == fc1.shape[-1] // 2


@pytest.mark.slow
def test_sharded_train_step_runs_and_loss_decreases():
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    params = init_depth_pro(jax.random.PRNGKey(0), DRY_CFG)
    with mesh:
        state, step = make_sharded_train_step(params, DRY_CFG, mesh, lr=1e-3,
                                              precision=Precision.fp32())
        rng = np.random.default_rng(0)
        s = DRY_CFG.img_size
        images = jnp.asarray(rng.random((2, s, s, 3), np.float32))
        depth = jnp.full((2, s, s), 2.0, jnp.float32)
        losses = []
        for _ in range(2):
            state, loss = step(state, images, depth)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 2


@pytest.mark.slow
def test_dp_sharded_inference_matches_single_device():
    mesh = make_mesh(dp=8, tp=1)
    params = init_depth_pro(jax.random.PRNGKey(1), DRY_CFG)
    x = jnp.asarray(np.random.default_rng(1).random((8, 64, 64, 3), np.float32))
    ref = infer_fn(params, x, None, DRY_CFG)["depth"]
    with mesh:
        xs = jax.device_put(x, batch_sharding(mesh))
        ps = shard_params(params, mesh, tensor_parallel=False)
        out = jax.jit(lambda p, xx: infer_fn(p, xx, None, DRY_CFG)["depth"])(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_runner_with_mesh_shard_map():
    """DP streaming inference through shard_map on the fake 8-dev mesh."""
    import numpy as np

    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    runner = DepthVideoRunner(cfg=DRY_CFG, precision="fp32", batch_size=4, mesh=mesh)
    rng = np.random.default_rng(0)
    frames = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(4)]
    with mesh:
        results = list(runner.depth_stream(frames))
    assert len(results) == 4
    for r in results:
        assert r["depth"].shape == (64, 64)
        assert np.isfinite(r["depth"]).all()
    # shard_map path must equal the single-device path
    solo = DepthVideoRunner(cfg=DRY_CFG, precision="fp32", batch_size=4)
    solo.params = runner.params
    ref = list(solo.depth_stream(frames))
    np.testing.assert_allclose(results[0]["depth"], ref[0]["depth"], rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_latency_parallel_infer_matches_single_device():
    """Single-frame latency parallelism (parallel/latency.py): patch-
    sharded ViT + row-sharded conv trunk over the 8 fake chips must
    match single-device inference within the 1e-3 parity contract
    (partitioned convs/collectives reassociate fp32 sums)."""
    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.core.precision import Precision
    from ml_depth_pro_video_tpu.models.depth_pro import (
        infer_fn,
        init_depth_pro,
        tiny_config,
    )
    from ml_depth_pro_video_tpu.parallel.latency import (
        make_latency_infer,
        make_sp_mesh,
    )

    cfg = tiny_config()
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    fn = make_latency_infer(cfg, make_sp_mesh(), Precision.fp32())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))

    out = fn(params, x)
    ref = infer_fn(params, x, None, cfg, Precision.fp32())
    np.testing.assert_allclose(np.asarray(out["focallength_px"]),
                               np.asarray(ref["focallength_px"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(ref["depth"]),
                               rtol=2e-3, atol=1e-5)

    out2 = fn(params, x, jnp.array([321.0]))
    ref2 = infer_fn(params, x, jnp.array([321.0]), cfg, Precision.fp32())
    np.testing.assert_allclose(np.asarray(out2["depth"]), np.asarray(ref2["depth"]),
                               rtol=2e-3, atol=1e-5)


def test_make_mesh_rejects_oversubscription():
    """tp > n_devices used to silently build a 0-device mesh."""
    import pytest

    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError):
        make_mesh(tp=16)  # 8 fake devices


def test_tp_rules_cover_quantized_mlp_weights():
    """int8-quantized column-ruled weights ({'q','s'} leaves) shard like
    their parents."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.parallel.sharding import param_shardings

    mesh = make_mesh(tp=2)
    params = {"blocks": {
        "fc1_w": jax.numpy.zeros((2, 8, 16)),
        "fc2_w": jax.numpy.zeros((2, 16, 8)),
        "qkv_w": jax.numpy.zeros((2, 8, 24)),
        "fc1_w_quant": None,  # placeholder, replaced below
    }}
    params["blocks"]["fc1_w"] = {"q": jax.numpy.zeros((2, 8, 16), "int8"),
                                 "s": jax.numpy.zeros((2, 1, 16))}
    del params["blocks"]["fc1_w_quant"]
    sh = param_shardings(params, mesh)
    assert sh["blocks"]["fc1_w"]["q"].spec == P(None, None, "tp")
    assert sh["blocks"]["fc1_w"]["s"].spec == P(None, None, "tp")
    assert sh["blocks"]["fc2_w"].spec == P(None, "tp", None)
    assert sh["blocks"]["qkv_w"].spec == P(None, None, "tp")


def test_tp_attention_shards_without_allgather():
    """The HEAD-CONTIGUOUS qkv packing makes the column shard land on
    whole heads, so GSPMD runs attention tensor-parallel: the compiled
    program contains NO all-gather of qkv (the old [q|k|v] packing
    forced one and replicated attention) and at least one all-reduce
    (the row-sharded proj contraction)."""
    from ml_depth_pro_video_tpu.ops.attention import xla_attention_packed

    mesh = make_mesh(dp=2, tp=4)  # heads must divide tp: nh=4, tp=4
    d, nh = 64, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.05)
    pw = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.05)

    def f(x, w, pw):
        return xla_attention_packed(x @ w, nh) @ pw

    ref = f(x, w, pw)
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    pws = jax.device_put(pw, NamedSharding(mesh, P("tp", None)))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    hlo = jax.jit(f).lower(xs, ws, pws).compile().as_text()
    assert hlo.count("all-gather") == 0
    assert hlo.count("all-reduce") >= 1
    got = jax.jit(f)(xs, ws, pws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_latency_infer_honors_speed_fast():
    """Regression (round-3 review): --speed fast must reach the latency-
    parallel patch ViT too. Merging is per-sample, so the shard-local
    merge must match the single-device merged path."""
    import dataclasses

    import jax.numpy as jnp

    from ml_depth_pro_video_tpu.models.depth_pro import apply_speed, tiny_config
    from ml_depth_pro_video_tpu.parallel.latency import make_latency_infer, make_sp_mesh

    cfg = dataclasses.replace(apply_speed(tiny_config(), "fast"), token_merge_block=1)
    params = init_depth_pro(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
    ref = infer_fn(params, x, None, cfg, Precision.fp32())
    exact_cfg = dataclasses.replace(cfg, token_merge_ratio=0.0)
    exact = infer_fn(params, x, None, exact_cfg, Precision.fp32())
    # the merged reference itself differs from exact (sanity: merging on)
    assert np.abs(np.asarray(ref["depth"]) - np.asarray(exact["depth"])).max() > 0
    lat = make_latency_infer(cfg, make_sp_mesh(), Precision.fp32())
    out = lat(params, x)
    np.testing.assert_allclose(np.asarray(out["depth"]), np.asarray(ref["depth"]),
                               rtol=2e-3, atol=1e-5)


def test_gspmd_paths_route_resblock_to_xla(monkeypatch):
    """A Mosaic pallas_call cannot be GSPMD-partitioned, so every
    program that row-shards or TP-shards the decoder must route the
    fused resblock to the XLA composition: forward() defaults
    conv_impl="xla" whenever the latency ``constrain`` hook is active
    (and the GSPMD train step passes it explicitly)."""
    from ml_depth_pro_video_tpu.models import depth_pro as dp_mod
    from ml_depth_pro_video_tpu.ops import resblock as rb_mod

    seen = []
    real = rb_mod.residual_block

    def spy(x, w1, b1, w2, b2, impl=None, **kw):
        seen.append(impl)
        return real(x, w1, b1, w2, b2, impl=impl, **kw)

    monkeypatch.setattr(rb_mod, "residual_block", spy)

    cfg = DRY_CFG
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)

    # plain single-device forward: auto (None) — Pallas allowed on TPU
    dp_mod.forward(params, x, cfg, Precision.fp32(), compute_fov=False)
    assert seen and all(i is None for i in seen)

    # GSPMD-sharded decoder (latency hook active): forced to "xla"
    seen.clear()
    dp_mod.forward(params, x, cfg, Precision.fp32(), compute_fov=False,
                   constrain=lambda t: t)
    assert seen and all(i == "xla" for i in seen)


def test_pipeline_blocks_match_serial_scan():
    """GPipe trunk inside shard_map == plain lax.scan over all blocks,
    including the hook captures."""
    from jax import shard_map

    from ml_depth_pro_video_tpu.models.vit import (
        _scan_blocks,
        init_vit,
        vit_apply,
    )
    from ml_depth_pro_video_tpu.parallel.pipeline import (
        make_pp_mesh,
        pipeline_blocks,
    )

    cfg = DRY_CFG.vit  # depth=2
    mesh = make_pp_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    params = init_vit(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(
        rng.standard_normal((6, cfg.num_tokens, cfg.embed_dim)).astype(np.float32))

    def body(tok, blocks_local):
        out, caps = pipeline_blocks(tok, blocks_local, cfg, pp=2,
                                    microbatches=3, capture_blocks=(0, 1))
        return out, tuple(caps)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), jax.tree.map(lambda _: P("pp"),
                                               params["blocks"])),
                   out_specs=(P(), (P(), P())), check_vma=False)
    with mesh:
        out, caps = jax.jit(fn)(tokens, params["blocks"])

    ref0 = _scan_blocks(tokens, params["blocks"], 0, 1, cfg, None)
    ref1 = _scan_blocks(ref0, params["blocks"], 1, 2, cfg, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(caps[0]), np.asarray(ref0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(caps[1]), np.asarray(ref1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pp_train_step_matches_plain():
    """One pipeline-parallel (dp=2 x pp=2) train step reproduces the
    single-device step: same loss, same updated params — proving the
    GPipe schedule, the stage-masked gradient routing, and the psum
    reconstitution are exact."""
    import optax

    from ml_depth_pro_video_tpu.parallel.pipeline import (
        make_pp_mesh,
        make_pp_train_step,
    )
    from ml_depth_pro_video_tpu.train.step import TrainState, loss_fn

    cfg = DRY_CFG
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    # CONDITION the loss landscape: scale the head's output conv down
    # and bias it to 0.5 so canonical inverse depth sits near 0.5
    # everywhere. At raw random init many pixels land in (0, ~1e-3),
    # where silog's 1/x log gradient amplifies harmless ~3e-7 forward
    # reassociation noise into O(1) per-pixel gradient differences —
    # meaninglessly ill-conditioned for an exactness test (the forward
    # itself matches to 3e-7).
    params["head"]["conv_out"]["w"] = params["head"]["conv_out"]["w"] * 0.01
    params["head"]["conv_out"]["b"] = jnp.full((1,), 0.5, jnp.float32)
    params0 = jax.device_get(params)  # host snapshot (donation survives)
    rng = np.random.default_rng(0)
    s = cfg.img_size
    images = jnp.asarray(rng.random((2, s, s, 3), np.float32))
    depth = jnp.full((2, s, s), 2.0, jnp.float32)

    # plain SGD: updates are exactly -lr * grad, so this certifies the
    # GRADIENTS themselves (Adam's per-element normalization would mask
    # a uniform grad-scaling bug, e.g. a missed psum factor)
    optimizer = optax.sgd(0.1)

    # plain single-device reference step FIRST — the pp step's buffer
    # donation may free the original param buffers (device_put can alias
    # the donor on replicated placement)
    ref_state = TrainState(params, optimizer.init(params),
                           jnp.zeros((), jnp.int32))
    loss_ref, grads = jax.value_and_grad(loss_fn)(
        ref_state.params, images, depth, cfg, Precision.fp32())
    updates, _ = optimizer.update(grads, ref_state.opt_state, ref_state.params)
    ref_params = jax.device_get(optax.apply_updates(ref_state.params, updates))

    mesh = make_pp_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    with mesh:
        state, step = make_pp_train_step(params, cfg, mesh, microbatches=5,
                                         precision=Precision.fp32(),
                                         optimizer=optimizer)
        state, loss_pp = step(state, images, depth)
        pp_params = jax.device_get(state.params)

    assert abs(float(loss_pp) - float(loss_ref)) < 1e-5, (loss_pp, loss_ref)
    # compare the UPDATES (-lr * grad), not the params: rtol against the
    # (much larger) param values would let a grad-scaling bug on small
    # gradients slip through
    upd_pp = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                          pp_params, params0)
    upd_ref = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                           ref_params, params0)
    for a, b in zip(jax.tree.leaves(upd_pp), jax.tree.leaves(upd_ref)):
        # atol 2e-7: extracting updates by subtracting O(1)-scale params
        # floors the measurement at the fp32 ULP (~6e-8); any scaling or
        # routing bug moves updates by their full 1e-5..1e-3 magnitude
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-7)


def test_pp_train_step_rejects_merge_tier():
    import dataclasses

    from ml_depth_pro_video_tpu.parallel.pipeline import (
        make_pp_mesh,
        make_pp_train_step,
    )

    cfg = dataclasses.replace(DRY_CFG, token_merge_ratio=0.5)
    mesh = make_pp_mesh(dp=1, pp=2, devices=jax.devices()[:2])
    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="exact path"):
        make_pp_train_step(params, cfg, mesh)
