"""AOT export of the compiled inference program (ckpt/export.py):
serialize/deserialize roundtrip, manifest identity checks, and the
runner/serve integration."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.ckpt.export import (
    export_infer,
    load_exported,
)
from ml_depth_pro_video_tpu.core.precision import Precision
from ml_depth_pro_video_tpu.models.depth_pro import (
    fold_head_params,
    infer_fn,
    init_depth_pro,
    tiny_config,
)

CFG = tiny_config()


def _params():
    return fold_head_params(init_depth_pro(jax.random.PRNGKey(0), CFG))


def test_export_roundtrip_matches_direct_inference(tmp_path):
    path = str(tmp_path / "model.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=path)
    exported = load_exported(path, CFG, "fp32")

    params = _params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, CFG.img_size, CFG.img_size, 3),
                                 dtype=np.uint8))
    out = exported.call(params, x)

    ref = infer_fn(params, x.astype(jnp.float32) / 127.5 - 1.0, None, CFG,
                   Precision.fp32())
    # the StableHLO roundtrip may recompile with different fusion
    # rounding — measured max 3e-6 relative; NOT bit-exactness
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(ref["depth"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["focallength_px"]),
                               np.asarray(ref["focallength_px"]), rtol=1e-5)


def test_export_manifest_rejects_config_mismatch(tmp_path):
    path = str(tmp_path / "model.jaxexp")
    export_infer(CFG, "fp32", batch_size=1, path=path)
    # wrong speed tier: the artifact would silently serve the exact
    # program while the caller believes it merged tokens
    fast = dataclasses.replace(CFG, token_merge_ratio=0.5)
    with pytest.raises(ValueError, match="token_merge_ratio"):
        load_exported(path, fast, "fp32")
    with pytest.raises(ValueError, match="compute_dtype"):
        load_exported(path, CFG, "bf16")
    # no cfg given: loads without checks
    assert load_exported(path) is not None
    # wrong family member at the SAME img_size: must fail at load via
    # the manifest identity keys, not at call time with an aval error
    other = dataclasses.replace(
        CFG, vit=dataclasses.replace(CFG.vit, embed_dim=2 * CFG.vit.embed_dim))
    with pytest.raises(ValueError, match="vit_embed_dim"):
        load_exported(path, other, "fp32")
    # a manifest PREDATING the identity keys must stay loadable
    import json
    with open(path + ".json") as f:
        m = json.load(f)
    m.pop("vit_embed_dim"), m.pop("vit_depth")
    with open(path + ".json", "w") as f:
        json.dump(m, f)
    assert load_exported(path, CFG, "fp32") is not None


def test_runner_serves_exported_artifact(tmp_path):
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    path = str(tmp_path / "model.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=path)

    runner = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                              exported_path=path)
    rng = np.random.default_rng(1)
    s = CFG.img_size
    frames = [(rng.random((s, s, 3)) * 255).astype(np.uint8) for _ in range(2)]
    results = list(runner.depth_stream(frames))
    assert len(results) == 2
    # the full batch at native size hits the artifact: no jit compiled
    # for that key
    key = ((2, s, s, 3), False, False)
    assert getattr(runner._jit[key], "__self__", None) is runner._exported

    plain = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2)
    plain.params = runner.params
    ref = list(plain.depth_stream(frames))
    np.testing.assert_array_equal(results[0]["depth"], ref[0]["depth"])
    np.testing.assert_array_equal(results[1]["depth"], ref[1]["depth"])


def test_runner_exported_guards(tmp_path):
    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    # latency mode shards the MODEL — no exported artifact covers it
    with pytest.raises(ValueError, match="latency"):
        DepthVideoRunner(cfg=CFG, batch_size=2, parallel="latency",
                         mesh=make_mesh(dp=2, tp=1, devices=jax.devices()[:2]),
                         exported_path="/nonexistent")
    # a dp-mesh runner must refuse a single-device artifact (and vice
    # versa): the device count is pinned at export time
    path = str(tmp_path / "model.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=path)
    with pytest.raises(ValueError, match="2"):
        DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                         mesh=make_mesh(dp=2, tp=1, devices=jax.devices()[:2]),
                         exported_path=path)


def test_dp_mesh_export_roundtrip_and_runner(tmp_path):
    """The pod-host serving path (VERDICT r4 #1): export the dp shard_map
    program, reload it, and serve it through a dp-mesh runner — outputs
    must equal the jit path's, with zero jit compile for the hot key."""
    import numpy as np

    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    path = str(tmp_path / "model_dp4.jaxexp")
    export_infer(CFG, "fp32", batch_size=4, path=path, mesh=mesh)
    # non-divisible batch is an export-time error, not a call-time crash
    with pytest.raises(ValueError, match="multiple"):
        export_infer(CFG, "fp32", batch_size=3, mesh=mesh)

    runner = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=4,
                              mesh=mesh, exported_path=path)
    rng = np.random.default_rng(3)
    s = CFG.img_size
    frames = [(rng.random((s, s, 3)) * 255).astype(np.uint8)
              for _ in range(4)]
    results = list(runner.depth_stream(frames))
    assert len(results) == 4
    key = ((4, s, s, 3), False, False)
    assert getattr(runner._jit[key], "__self__", None) is runner._exported

    plain = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=4,
                             mesh=mesh)
    plain.params = runner.params
    ref = list(plain.depth_stream(frames))
    for got, want in zip(results, ref):
        np.testing.assert_allclose(got["depth"], want["depth"],
                                   rtol=1e-6, atol=0)


def test_quantized_export_roundtrip_and_manifest(tmp_path):
    """--quantize exports the int8-weight program: the artifact accepts
    the quantize_vit_weights tree and matches the in-process quantized
    jit; weight-format mismatches are caught by the manifest."""
    from ml_depth_pro_video_tpu.ckpt.quantize import quantize_vit_weights
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    path = str(tmp_path / "model_q.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=path, quantize=True)

    # runner(quantize=True) serves the quantized artifact...
    runner = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                              quantize=True, exported_path=path)
    rng = np.random.default_rng(2)
    s = CFG.img_size
    frames = [(rng.random((s, s, 3)) * 255).astype(np.uint8) for _ in range(2)]
    results = list(runner.depth_stream(frames))
    assert len(results) == 2
    key = ((2, s, s, 3), False, False)
    assert getattr(runner._jit[key], "__self__", None) is runner._exported

    # ...and matches the in-process quantized jit exactly
    plain = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                             quantize=True)
    plain.params = runner.params
    ref = list(plain.depth_stream(frames))
    np.testing.assert_array_equal(results[0]["depth"], ref[0]["depth"])

    # weight-format mismatch is a manifest error, not a shape crash
    with pytest.raises(ValueError, match="quantized"):
        load_exported(path, CFG, "fp32", quantize=False)
    plain_path = str(tmp_path / "model_p.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=plain_path)
    with pytest.raises(ValueError, match="quantized"):
        load_exported(plain_path, CFG, "fp32", quantize=True)
    # the param tree really is the int8 one
    q = quantize_vit_weights(init_depth_pro(jax.random.PRNGKey(0), CFG))
    assert q["encoder"]["patch_vit"]["blocks"]["qkv_w"]["q"].dtype == jnp.int8


def test_manifestless_artifact_still_checks_weight_format(tmp_path):
    """Without the sidecar manifest (copied/renamed artifact) a
    quantize mismatch must still fail loudly at LOAD time — the
    artifact's own int8 avals carry the weight format — instead of an
    opaque pytree error on the first call."""
    import os

    q_path = str(tmp_path / "model_q.jaxexp")
    export_infer(CFG, "fp32", batch_size=1, path=q_path, quantize=True)
    os.remove(q_path + ".json")
    with pytest.raises(ValueError, match="int8-quantized"):
        load_exported(q_path, CFG, "fp32", quantize=False)
    assert load_exported(q_path, CFG, "fp32", quantize=True) is not None

    p_path = str(tmp_path / "model_p.jaxexp")
    export_infer(CFG, "fp32", batch_size=1, path=p_path)
    os.remove(p_path + ".json")
    with pytest.raises(ValueError, match="full-precision"):
        load_exported(p_path, CFG, "fp32", quantize=True)
    assert load_exported(p_path, CFG, "fp32", quantize=False) is not None


def test_dp_mesh_quantized_export(tmp_path):
    """--dp composes with --quantize: the multi-chip artifact takes the
    int8 param tree and matches the in-process quantized dp jit."""
    import numpy as np

    from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices()[:2])
    path = str(tmp_path / "model_dp2_q.jaxexp")
    export_infer(CFG, "fp32", batch_size=2, path=path, mesh=mesh,
                 quantize=True)

    runner = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                              mesh=mesh, quantize=True, exported_path=path)
    rng = np.random.default_rng(5)
    s = CFG.img_size
    frames = [(rng.random((s, s, 3)) * 255).astype(np.uint8)
              for _ in range(2)]
    results = list(runner.depth_stream(frames))
    assert len(results) == 2
    key = ((2, s, s, 3), False, False)
    assert getattr(runner._jit[key], "__self__", None) is runner._exported

    plain = DepthVideoRunner(cfg=CFG, precision="fp32", batch_size=2,
                             mesh=mesh, quantize=True)
    plain.params = runner.params
    ref = list(plain.depth_stream(frames))
    np.testing.assert_allclose(results[0]["depth"], ref[0]["depth"],
                               rtol=1e-6, atol=0)
