"""ToMe merge-tier QUALITY regression gate (VERDICT r4 #3).

The mechanics of token merging are unit-tested in `tests/test_vit.py`;
nothing there guards the tier's *quality* as the kernel/merge code
evolves — a subtly wrong bipartite match or proportional-attention bias
would still pass shape/finiteness tests while silently degrading depth.
This gate re-measures the trained-proxy deviation curve (the round-4
`scripts/tome_quality_gate.py` result, reference hot loop:
`/root/reference/src/depth_pro/network/encoder.py:266`) against
CHECKED-IN proxy weights (`tests/fixtures/tome_proxy_weights.npz`,
trained by `scripts/make_tome_proxy_fixture.py` with the real training
loop on both synthetic families) and fails when mean/p95 deviation
regresses 2x past the recorded bounds
(`tests/fixtures/tome_proxy_bounds.json`, recorded on this same CPU
backend so the margin measures code drift, not platform rounding).
"""

import json
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
WEIGHTS = os.path.join(FIXTURES, "tome_proxy_weights.npz")
BOUNDS = os.path.join(FIXTURES, "tome_proxy_bounds.json")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(WEIGHTS) and os.path.exists(BOUNDS)),
    reason="proxy fixture missing — run scripts/make_tome_proxy_fixture.py")


def test_merge_tier_quality_within_recorded_bounds():
    import jax

    from ml_depth_pro_video_tpu.ckpt.convert import load_params
    from ml_depth_pro_video_tpu.utils.synthetic import tome_deviation_curves

    # fixture stores fp16 (size); the gate runs fp32 params like the model
    params = jax.tree.map(lambda a: np.asarray(a, np.float32),
                          load_params(WEIGHTS))
    with open(BOUNDS) as f:
        recorded = json.load(f)["curves"]

    got = tome_deviation_curves(params)
    assert set(got) == set(recorded), (sorted(got), sorted(recorded))
    for key, bounds in recorded.items():
        for stat in ("mean", "p95"):
            # 2x margin: generous enough for eval noise (fresh scenes are
            # seeded, so the only nondeterminism is compiler rounding),
            # tight enough that a broken match/bias path — which moves
            # deviation by 10-40x (random-weight column, PERFORMANCE.md)
            # — always trips it
            assert got[key][stat] <= 2.0 * bounds[stat] + 1e-6, (
                f"{key} {stat}: {got[key][stat]:.4f} vs recorded "
                f"{bounds[stat]:.4f} — merge-tier quality regressed")

    # the trained proxy must keep its structured-feature advantage: if
    # deviation approaches the random-weight envelope (~0.08+ mean at
    # ratio 0.25 on the redundancy-rich family) the fixture itself is
    # broken (wrong weights / wrong families), not just drifted
    assert got["boxes/0.25"]["mean"] < 0.04, got["boxes/0.25"]


def test_fixture_weights_match_proxy_config():
    """The checked-in npz must stay loadable into the gate's config —
    a config drift would otherwise surface as an opaque pytree error."""
    import jax

    from ml_depth_pro_video_tpu.ckpt.convert import load_params
    from ml_depth_pro_video_tpu.models.depth_pro import init_depth_pro
    from ml_depth_pro_video_tpu.utils.synthetic import tome_proxy_config

    params = load_params(WEIGHTS)
    expect = jax.eval_shape(
        lambda: init_depth_pro(jax.random.PRNGKey(0), tome_proxy_config()))
    # dtype is fp16 in storage — structure and shapes must match exactly
    got_tree = jax.tree.map(lambda a: a.shape, params)
    want_tree = jax.tree.map(lambda a: a.shape, expect)
    assert got_tree == want_tree
