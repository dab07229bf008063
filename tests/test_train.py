"""Training stack tests: data pipeline, loss, orbax checkpointing,
end-to-end fit on the fake mesh."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from ml_depth_pro_video_tpu.train.data import DepthDataset
from ml_depth_pro_video_tpu.train.step import silog_loss


def test_silog_loss_zero_for_perfect():
    inv = jnp.full((2, 8, 8), 0.5)
    target = 1.0 / inv
    assert float(silog_loss(inv, target)) < 1e-10
    worse = float(silog_loss(inv * 2, target))
    assert worse > 1e-3


def test_depth_dataset_and_batches(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray((rng.random((40, 60, 3)) * 255).astype(np.uint8)).save(
            tmp_path / f"s{i}.png"
        )
        np.save(tmp_path / f"s{i}_depth.npy", rng.uniform(1, 10, (40, 60)).astype(np.float32))
    ds = DepthDataset(str(tmp_path), image_size=32)
    assert len(ds) == 5
    batches = list(ds.batches(batch_size=2, epochs=2))
    assert len(batches) == 4  # 2 per epoch, remainder dropped
    xs, ys = batches[0]
    assert xs.shape == (2, 32, 32, 3) and ys.shape == (2, 32, 32)
    assert float(jnp.abs(xs).max()) <= 1.0


def test_orbax_roundtrip(tmp_path):
    import optax

    from ml_depth_pro_video_tpu.ckpt.checkpointing import (
        latest_step,
        restore_train_state,
        save_train_state,
    )
    from ml_depth_pro_video_tpu.train.step import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = optax.adamw(1e-3)
    state = TrainState(params, opt.init(params), jnp.asarray(7, jnp.int32))
    save_train_state(str(tmp_path / "ckpt"), state)
    assert latest_step(str(tmp_path / "ckpt")) == 7
    restored = restore_train_state(str(tmp_path / "ckpt"), state)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(params["w"]))
    assert int(restored.step) == 7


def test_optimizer_schedule_and_clipping():
    """Warmup+cosine schedule ramps the LR from ~0 and decays it; global
    gradient-norm clipping bounds the update magnitude."""
    import optax

    from ml_depth_pro_video_tpu.train.step import make_optimizer

    tx = make_optimizer(lr=1e-2, warmup_steps=5, total_steps=20, clip_norm=1.0)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    big_grad = {"w": jnp.full((4,), 100.0)}

    # step 0 (warmup start): LR ~ 0 -> tiny update even for a huge grad
    updates0, state = tx.update(big_grad, state, params)
    assert float(jnp.abs(updates0["w"]).max()) < 1e-4

    # advance into the schedule peak: updates bounded by clip + peak LR
    for _ in range(6):
        updates, state = tx.update(big_grad, state, params)
    assert float(jnp.abs(updates["w"]).max()) <= 1.1e-2


def test_grad_accum_averages_before_applying():
    """optax.MultiSteps semantics through make_optimizer: with
    grad_accum=k the params are untouched for k-1 data batches, then one
    update applies the AVERAGED gradient — feeding the same gradient k
    times must land exactly where one plain step with that gradient
    does (mean of identical grads = the grad)."""
    import optax

    from ml_depth_pro_video_tpu.train.step import make_optimizer

    params = {"w": jnp.linspace(0.1, 1.0, 6)}
    grad = {"w": jnp.linspace(-1.0, 1.0, 6)}

    plain = make_optimizer(lr=1e-2, clip_norm=None)
    st = plain.init(params)
    up, _ = plain.update(grad, st, params)
    want = optax.apply_updates(params, up)

    accum = make_optimizer(lr=1e-2, clip_norm=None, grad_accum=3)
    st = accum.init(params)
    p = params
    for i in range(3):
        up, st = accum.update(grad, st, p)
        p = optax.apply_updates(p, up)
        if i < 2:  # accumulate-only micro-steps leave params untouched
            np.testing.assert_array_equal(np.asarray(p["w"]),
                                          np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(want["w"]),
                               rtol=1e-6)

    with pytest.raises(ValueError, match="grad_accum"):
        make_optimizer(lr=1e-2, grad_accum=0)


def test_fit_rejects_grad_accum_with_pp(tmp_path):
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.train.loop import fit

    with pytest.raises(ValueError, match="grad_accum"):
        fit(str(tmp_path), tiny_config(), pp=2, grad_accum=2)


@pytest.mark.slow
def test_fit_grad_accum_end_to_end(tmp_path):
    """fit(grad_accum=2) runs the sharded step (MultiSteps opt_state
    through jit + donation + the orbax roundtrip); step counts DATA
    batches and params change after the accumulation boundary."""
    from ml_depth_pro_video_tpu.models.depth_pro import init_depth_pro, tiny_config
    from ml_depth_pro_video_tpu.train.loop import fit

    rng = np.random.default_rng(1)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(4):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
            data / f"s{i}.png")
        np.save(data / f"s{i}_depth.npy",
                rng.uniform(1, 10, (64, 64)).astype(np.float32))

    cfg = tiny_config()
    # 2 epochs x 2 batches = 4 data batches = 2 applied updates (the
    # warmup schedule makes the FIRST applied update lr=0, so a single
    # update would leave params untouched by design)
    state = fit(str(data), cfg, batch_size=2, epochs=2, lr=1e-3,
                warmup_steps=1, dp=1, grad_accum=2, log_every=1,
                checkpoint_dir=str(tmp_path / "ckpt"), save_every=10)
    assert int(state.step) == 4  # step counts DATA batches
    init = init_depth_pro(jax.random.PRNGKey(0), cfg)
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(init)))
    assert diff > 0  # the applied update really changed the params


@pytest.mark.slow
def test_fit_smoke_and_resume(tmp_path):
    """End-to-end fit(): tiny model, synthetic pairs, checkpoint save,
    resume continues from the saved step."""
    from ml_depth_pro_video_tpu.ckpt.checkpointing import latest_step
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.train.loop import fit

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
            data / f"s{i}.png"
        )
        np.save(data / f"s{i}_depth.npy", rng.uniform(1, 10, (64, 64)).astype(np.float32))

    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "metrics.jsonl")
    cfg = tiny_config()
    state = fit(str(data), cfg, batch_size=2, epochs=1, lr=1e-4, warmup_steps=1,
                checkpoint_dir=ckpt, save_every=1, holdout=1, dp=1,
                log_every=1, metrics_file=metrics)
    assert int(state.step) == 1
    assert latest_step(ckpt) == 1

    # resume: epochs=2 -> 2 total steps; the first is replayed from ckpt
    state = fit(str(data), cfg, batch_size=2, epochs=2, lr=1e-4, warmup_steps=1,
                checkpoint_dir=ckpt, save_every=10, holdout=1, dp=1,
                log_every=1, metrics_file=metrics)
    assert int(state.step) == 2
    assert latest_step(ckpt) == 2

    # metrics JSONL: loss rows for both runs (append across resume) and
    # the validation rows, each valid JSON with a step field
    import json as _json

    rows = [_json.loads(l) for l in open(metrics)]
    loss_rows = [r for r in rows if "loss" in r]
    val_rows = [r for r in rows if "val_silog" in r]
    assert {r["step"] for r in loss_rows} == {1, 2}
    assert val_rows and all(np.isfinite(r["val_silog"]) for r in val_rows)
    assert all("s_per_step" in r for r in loss_rows)


def test_silog_loss_masks_invalid_targets():
    """Holes stored as 0 or NaN (ubiquitous in real depth maps) must not
    poison the loss: masked pixels contribute nothing."""
    inv = jnp.full((1, 8, 8), 0.5)
    target = (1.0 / inv).at[0, 0, 0].set(0.0).at[0, 1, 1].set(jnp.nan)
    loss = float(silog_loss(inv, target))
    assert np.isfinite(loss) and loss < 1e-10  # valid pixels are perfect
    all_bad = jnp.zeros((1, 4, 4))
    assert np.isfinite(float(silog_loss(inv[:, :4, :4], all_bad)))


def test_depth_resize_does_not_bleed_holes(tmp_path):
    """Regression (round-3 review): bilinear depth resize bled zero
    hole pixels into neighbors, producing small POSITIVE depths that
    pass the silog (target > 0) mask with wrong log values. Hole-touched
    pixels must come out exactly 0 (invalid)."""
    rng = np.random.default_rng(0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "a.png")
    d = np.full((64, 64), 2.0, np.float32)
    d[20:40, 20:40] = 0.0  # hole
    np.save(tmp_path / "a_depth.npy", d)

    ds = DepthDataset(str(tmp_path), image_size=32)
    _, depth = ds._load(0)
    # every pixel is either invalid (0) or ~2.0; nothing in between
    mid = (depth > 1e-6) & (depth < 1.9)
    assert not mid.any(), depth[mid]
    assert (depth == 0).any() and (np.abs(depth - 2.0) < 1e-3).any()


def test_batches_pad_unreadable_instead_of_dropping(tmp_path):
    """Regression (round-3 review): a batch with an unreadable pair was
    dropped, desyncing the decode-free resume skip from state.step. Now
    it pads with good samples and still yields."""
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            tmp_path / f"f{i}.png")
        np.save(tmp_path / f"f{i}_depth.npy", np.ones((16, 16), np.float32))
    # corrupt one image AFTER indexing
    ds = DepthDataset(str(tmp_path), image_size=16)
    open(ds.pairs[1][0], "wb").write(b"corrupt")
    batches = list(ds.batches(4, epochs=1))
    assert len(batches) == 1
    xs, dd = batches[0]
    assert xs.shape == (4, 16, 16, 3) and dd.shape == (4, 16, 16)


def test_load_scales_metric_target_by_focal(tmp_path):
    """Targets with a cached focallength_px (the distill labeler writes
    one per pair) are converted from METRIC to CANONICAL-unit depth
    (scaled by w/f_px): the loss supervises 1/canonical but inference
    maps canonical to metric through f_px/w (models/depth_pro.py), so
    training on raw metric depth would bake a systematic f_px/w scale
    error into the model. Pairs without the key keep the old f_px == w
    assumption."""
    rng = np.random.default_rng(3)
    img = (rng.random((32, 64, 3)) * 255).astype(np.uint8)  # w_orig = 64
    d = rng.uniform(1, 10, (32, 64)).astype(np.float32)

    Image.fromarray(img).save(tmp_path / "a.png")
    np.savez(tmp_path / "a_depth.npz", depth=d,
             focallength_px=np.float32(32.0))  # f_px = w/2
    Image.fromarray(img).save(tmp_path / "b.png")
    np.savez(tmp_path / "b_depth.npz", depth=d)  # no focal: raw metric

    ds = DepthDataset(str(tmp_path), image_size=16)
    _, da = ds._load(0)
    _, db = ds._load(1)
    valid = (da > 0) & (db > 0)
    # w/f_px = 64/32 = 2: focal-bearing pairs come out exactly 2x
    np.testing.assert_allclose(da[valid], 2.0 * db[valid], rtol=1e-6)


def test_warmup_zero_is_honored():
    """warmup_steps=0 must mean NO warmup: the first applied update runs
    at the full peak LR instead of a silently-forced lr=0 no-op step."""
    import optax

    from ml_depth_pro_video_tpu.train.step import make_optimizer

    tx = make_optimizer(lr=1e-2, warmup_steps=0, total_steps=20,
                        clip_norm=None)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grad = {"w": jnp.full((4,), 1.0)}
    updates, state = tx.update(grad, state, params)
    # AdamW's first update at peak LR has magnitude ~ lr
    assert float(jnp.abs(updates["w"]).max()) > 1e-3


def test_warmup_longer_than_run_truncates_loudly(caplog):
    """A warmup covering the whole run is truncated with a warning (it
    used to be silently capped at 10% of the run)."""
    import logging

    from ml_depth_pro_video_tpu.train.step import make_optimizer

    with caplog.at_level(logging.WARNING,
                         logger="ml_depth_pro_video_tpu.train.step"):
        make_optimizer(lr=1e-2, warmup_steps=1000, total_steps=20)
    assert any("truncating warmup" in r.message for r in caplog.records)


def test_batches_zero_substitute_keeps_composition(tmp_path):
    """zero_substitute=True (the validation mode) replaces an unreadable
    pair IN PLACE with a zero-loss row instead of skipping it, so batch
    composition stays deterministic across runs (and pod hosts)."""
    rng = np.random.default_rng(5)
    for i in range(4):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            tmp_path / f"f{i}.png")
        np.save(tmp_path / f"f{i}_depth.npy",
                np.full((16, 16), 2.0, np.float32))
    ds = DepthDataset(str(tmp_path), image_size=16, seed=0)
    open(ds.pairs[2][0], "wb").write(b"corrupt")
    batches = list(ds.batches(4, epochs=1, zero_substitute=True))
    assert len(batches) == 1
    xs, dd = batches[0]
    assert xs.shape == (4, 16, 16, 3) and dd.shape == (4, 16, 16)
    # exactly one row zeroed out (the corrupt pair's slot)
    zero_rows = [i for i in range(4) if float(np.abs(dd[i]).sum()) == 0.0]
    assert len(zero_rows) == 1


def test_batches_producer_exits_when_consumer_abandons(tmp_path):
    """Abandoning the generator early (a raising train step, a break)
    must release the producer thread — it used to block on q.put
    forever, pinning its decoded batches for the life of the process."""
    import threading
    import time

    rng = np.random.default_rng(6)
    for i in range(8):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(
            tmp_path / f"f{i}.png")
        np.save(tmp_path / f"f{i}_depth.npy", np.ones((16, 16), np.float32))
    ds = DepthDataset(str(tmp_path), image_size=16)

    before = set(threading.enumerate())
    gen = ds.batches(2, epochs=50, prefetch=1)  # 200 batches pending
    next(gen)
    gen.close()  # consumer walks away
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, leaked


def test_single_update_run_trains_at_peak_lr():
    """A run with exactly ONE applied update and any warmup_steps > 0
    must still train: warmup truncates to ZERO (cosine from peak), not
    to 1 — a 1-update warmup would evaluate the run's only step at
    schedule position 0 = lr 0.0 and return params bit-identical to
    init."""
    from ml_depth_pro_video_tpu.train.step import make_optimizer

    tx = make_optimizer(lr=1e-2, warmup_steps=100, total_steps=1,
                        clip_norm=None)
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grad = {"w": jnp.full((4,), 1.0)}
    updates, state = tx.update(grad, state, params)
    # AdamW's normalized first step is ~lr; lr=0 would make it exactly 0
    assert float(jnp.abs(updates["w"]).max()) > 1e-3


def test_validate_excludes_all_invalid_batches(tmp_path):
    """_validate zero-substitutes unreadable holdout pairs (batch
    composition stays deterministic), but a batch with NO valid pixels
    returns an exact-0.0 silog that must NOT be averaged in — it would
    bias val_silog optimistically toward 0."""
    from PIL import Image

    from ml_depth_pro_video_tpu.train.loop import _validate
    from ml_depth_pro_video_tpu.models.depth_pro import (init_depth_pro,
                                                          tiny_config)
    from ml_depth_pro_video_tpu.train.step import Precision

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    good_img = tmp_path / "good.png"
    Image.fromarray((rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
                    ).save(good_img)
    np.save(tmp_path / "good_depth.npy",
            rng.uniform(1.0, 5.0, (32, 32)).astype(np.float32))
    bad_img = tmp_path / "bad.png"
    bad_img.write_bytes(b"not a png")
    np.save(tmp_path / "bad_depth.npy",
            rng.uniform(1.0, 5.0, (32, 32)).astype(np.float32))

    params = init_depth_pro(jax.random.PRNGKey(0), cfg)
    precision = Precision.fp32()
    pairs_good = [(str(good_img), str(tmp_path / "good_depth.npy"))]
    pairs_both = pairs_good + [(str(bad_img), str(tmp_path / "bad_depth.npy"))]

    # batch_size 1: the bad pair becomes its own all-zero batch
    val_good = _validate(params, pairs_good, cfg, precision, batch_size=1)
    val_both = _validate(params, pairs_both, cfg, precision, batch_size=1)
    assert np.isfinite(val_good) and val_good > 0
    assert val_both == pytest.approx(val_good)  # 0.0 batch excluded
