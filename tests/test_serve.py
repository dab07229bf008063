"""Serving layer test: live HTTP round-trip against the tiny model."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.serve.server import create_server
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner


@pytest.fixture(scope="module")
def server_url():
    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    server = create_server(port=0, runner=runner, max_batch=2, max_wait_ms=20)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _png_bytes(seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as r:
        body = json.load(r)
    assert body["status"] == "ok"


def test_depth_json_and_npz(server_url):
    req = urllib.request.Request(server_url + "/v1/depth?return=npz",
                                 data=_png_bytes(), method="POST")
    with urllib.request.urlopen(req) as r:
        body = json.load(r)
    assert body["depth_shape"] == [80, 100]
    npz = np.load(io.BytesIO(base64.b64decode(body["npz_base64"])))
    assert npz["depth"].shape == (80, 100)
    assert np.isfinite(npz["depth"]).all()


def test_depth_png16(server_url):
    req = urllib.request.Request(server_url + "/v1/depth?return=png16",
                                 data=_png_bytes(1), method="POST")
    with urllib.request.urlopen(req) as r:
        img = Image.open(io.BytesIO(r.read()))
    assert img.size == (100, 80)


def test_concurrent_requests_batched(server_url):
    results = {}

    def hit(i):
        req = urllib.request.Request(server_url + "/v1/depth",
                                     data=_png_bytes(i), method="POST")
        with urllib.request.urlopen(req) as r:
            results[i] = json.load(r)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(r["depth_shape"] == [80, 100] for r in results.values())


def test_bad_route_and_bad_payload(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server_url + "/nope")
    assert e.value.code == 404
    req = urllib.request.Request(server_url + "/v1/depth", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 500


def test_concurrent_mixed_resolution_requests(server_url):
    """Requests with different image sizes must not be coalesced into one
    np.stack'd batch (regression: a mixed batch failed BOTH requests)."""
    import concurrent.futures

    def png(shape, seed):
        rng = np.random.default_rng(seed)
        img = (rng.random(shape) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    bodies = [png((80, 100, 3), 1), png((64, 48, 3), 2)]

    def post(body):
        req = urllib.request.Request(
            server_url + "/v1/depth", data=body,
            headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        res = list(pool.map(post, bodies))
    assert res[0]["depth_shape"] == [80, 100]
    assert res[1]["depth_shape"] == [64, 48]


def test_metrics_endpoint(server_url):
    """/metrics exposes Prometheus counters that actually move."""
    # at least one successful request so counters are nonzero
    req = urllib.request.Request(server_url + "/v1/depth", data=_png_bytes(7),
                                 headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
    with urllib.request.urlopen(server_url + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or "{" in line:
            continue
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)
    assert metrics["depthpro_requests_total"] >= 1
    assert metrics["depthpro_batches_total"] >= 1
    assert metrics["depthpro_batch_frames_total"] >= metrics["depthpro_batches_total"]
    assert 0 < metrics["depthpro_batch_fill_ratio"] <= 1
    assert metrics["depthpro_request_latency_seconds_count"] == metrics[
        "depthpro_requests_total"]
    assert metrics["depthpro_request_latency_seconds_sum"] > 0
    # histogram buckets are cumulative and end at +Inf == count
    bucket_lines = [l for l in text.splitlines()
                    if l.startswith("depthpro_request_latency_seconds_bucket")]
    counts = [float(l.rsplit(" ", 1)[1]) for l in bucket_lines]
    assert counts == sorted(counts)
    assert counts[-1] == metrics["depthpro_requests_total"]


def test_temporal_smooth_runner_rejected():
    """A serving batch is unrelated concurrent requests — a smoothing
    runner would EMA-blend one client's depth into another's."""
    from ml_depth_pro_video_tpu.serve.server import _Batcher

    runner = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                              batch_size=2, temporal_smooth=0.8)
    with pytest.raises(ValueError, match="temporal_smooth"):
        _Batcher(runner, max_batch=2, max_wait_ms=20)


def _video_frames(n, seed=20, shape=(48, 64, 3)):
    """A jittery static scene: base frame + small per-frame noise."""
    rng = np.random.default_rng(seed)
    base = (rng.random(shape) * 255).astype(np.uint8)
    out = []
    for _ in range(n):
        f = np.clip(base.astype(np.int16)
                    + rng.integers(-3, 4, shape), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="PNG")
        out.append(buf.getvalue())
    return out


def _post_npz(server_url, body, query=""):
    req = urllib.request.Request(
        server_url + "/v1/depth?return=npz" + query, data=body,
        headers={"Content-Type": "image/png"})
    with urllib.request.urlopen(req, timeout=120) as r:
        payload = json.loads(r.read())
    with np.load(io.BytesIO(base64.b64decode(payload["npz_base64"]))) as z:
        return z["depth"]


def test_session_smoothing_matches_offline_filter(server_url):
    """?session=&smooth= must equal TemporalSmoother applied to the raw
    (sessionless) responses frame for frame, and two interleaved
    sessions must each track their OWN stream — never blend."""
    from ml_depth_pro_video_tpu.video.temporal import TemporalSmoother

    # seeds chosen so the tiny random-weight model yields NON-constant
    # depth for these scenes (many seeds saturate the whole map at the
    # 1/1e-4 clamp, making smoothing a vacuous no-op)
    frames_a = _video_frames(4, seed=40)
    frames_b = _video_frames(4, seed=50)

    raw_a = [_post_npz(server_url, f) for f in frames_a]
    raw_b = [_post_npz(server_url, f) for f in frames_b]

    got_a, got_b = [], []
    for fa, fb in zip(frames_a, frames_b):  # interleaved streams
        got_a.append(_post_npz(server_url, fa, "&session=a&smooth=0.8"))
        got_b.append(_post_npz(server_url, fb, "&session=b&smooth=0.8"))

    ref_a = TemporalSmoother(alpha=0.8)
    ref_b = TemporalSmoother(alpha=0.8)
    for raw, got, ref in ((raw_a, got_a, ref_a), (raw_b, got_b, ref_b)):
        for r, g in zip(raw, got):
            # oracle is the DEVICE smoother while the server runs the
            # numpy twin; they differ only by fp32 reduction order in
            # the (centered, well-conditioned) align-fit sums
            np.testing.assert_allclose(g, ref.update(r), rtol=1e-5,
                                       atol=1e-6)
    # later frames of a jittery static scene actually got smoothed
    assert not np.allclose(got_a[2], raw_a[2])

    # the gauge reflects the two live sessions
    with urllib.request.urlopen(server_url + "/metrics") as r:
        text = r.read().decode()
    assert "depthpro_smooth_sessions 2" in text


def test_session_smoothing_param_validation(server_url):
    """smooth without session (and vice versa) is a 400; so is an
    out-of-range or unparsable alpha — never a 500."""
    body = _video_frames(1)[0]
    for query in ("&smooth=0.8", "&session=x", "&session=x&smooth=1.0",
                  "&session=x&smooth=nope",
                  # tau: unparsable, non-positive, and NaN all 400 (a
                  # tau <= 0 would silently disable smoothing while the
                  # client pays for session state)
                  "&session=x&smooth=0.8&tau=abc",
                  "&session=x&smooth=0.8&tau=-1",
                  "&session=x&smooth=0.8&tau=0",
                  "&session=x&smooth=0.8&tau=nan"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_npz(server_url, body, query)
        assert e.value.code == 400, query


def test_sessions_ttl_and_lru_eviction():
    """Idle sessions evict after ttl_s; beyond max_sessions the
    least-recently-used state is dropped (next frame re-seeds)."""
    from ml_depth_pro_video_tpu.serve.server import _Sessions

    d = np.full((4, 4), 2.0, np.float32)
    s = _Sessions(ttl_s=1e-9, max_sessions=8)
    s.apply("a", 0.8, 0.05, d)
    s.apply("b", 0.8, 0.05, d)  # purge drops the now-idle "a"
    with s._lock:
        assert set(s._entries) == {"b"}
    assert s.eviction_counts()["ttl"] >= 1

    s = _Sessions(ttl_s=3600.0, max_sessions=2)
    for name in ("a", "b", "c"):
        s.apply(name, 0.8, 0.05, d)
    assert s.count() == 2  # "a" (LRU) evicted
    assert s.eviction_counts() == {"ttl": 0, "lru": 1}

    # an evicted/new session's first frame passes through unsmoothed —
    # and says so (seeded=True); subsequent frames report False
    out, seeded = s.apply("fresh", 0.8, 0.05, d * 3)
    np.testing.assert_allclose(out, d * 3)
    assert seeded is True
    _, seeded = s.apply("fresh", 0.8, 0.05, d * 3)
    assert seeded is False
    # an alpha change is a new filter contract: re-seeds, and reports it
    _, seeded = s.apply("fresh", 0.5, 0.05, d * 3)
    assert seeded is True

    # idle-time eviction: apply() never runs again on a quiet server, so
    # count() (the /metrics scrape) must purge expired states itself
    s = _Sessions(ttl_s=1e-9, max_sessions=8)
    s.apply("idle", 0.8, 0.05, d)
    time.sleep(0.01)
    assert s.count() == 0

    # an expired-but-unpurged entry must NOT resurrect: with no other
    # traffic to trigger _purge, a client resuming after > ttl_s idle
    # would otherwise blend 10-minute-old state and claim seeded=False
    s = _Sessions(ttl_s=0.05, max_sessions=8)
    out, seeded = s.apply("stale", 0.8, 0.05, d)
    assert seeded is True
    time.sleep(0.08)  # expire without any purge trigger
    out, seeded = s.apply("stale", 0.8, 0.05, d * 2)
    assert seeded is True  # fresh state, honestly reported
    np.testing.assert_allclose(out, d * 2)  # passthrough, no stale blend
    assert s.eviction_counts()["ttl"] >= 1


def test_session_eviction_visible_over_http(server_url):
    """A bursted client must be able to TELL its stream lost temporal
    state: smooth_seeded in the json body, and the eviction counter at
    /metrics (VERDICT r4 #8)."""
    frames = _video_frames(3, seed=40)

    def post(body, query):
        req = urllib.request.Request(
            server_url + "/v1/depth?return=json" + query, data=body,
            headers={"Content-Type": "image/png"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    # sessionless requests carry no flag at all
    assert "smooth_seeded" not in post(frames[0], "")
    # first frame seeds; the next one doesn't
    assert post(frames[0], "&session=ev&smooth=0.8")["smooth_seeded"] is True
    assert post(frames[1], "&session=ev&smooth=0.8")["smooth_seeded"] is False
    with urllib.request.urlopen(server_url + "/metrics") as r:
        text = r.read().decode()
    assert 'depthpro_smooth_evictions_total{reason="lru"}' in text
    assert 'depthpro_smooth_evictions_total{reason="ttl"}' in text
