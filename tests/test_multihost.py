"""Multi-host helpers (parallel/multihost.py).

Single-process: every helper must be the identity split. Multi-process:
a REAL 2-process JAX CPU cluster (gloo collectives) is spawned via
subprocess and runs row assignment -> global_batch -> sharded jit ->
local_output -> broadcast -> barrier end to end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ml_depth_pro_video_tpu.parallel import multihost as mh
from ml_depth_pro_video_tpu.parallel.mesh import make_mesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_identity():
    mesh = make_mesh(dp=8, tp=1)
    sh = NamedSharding(mesh, P("dp"))
    assert mh.local_rows(sh, (16, 4)) == list(range(16))
    # no other process holds anything
    assert mh.rows_for_process(sh, (16, 4), process_index=1) == []
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    g = mh.global_batch(sh, x)
    vals, rows = mh.local_output(g)
    assert rows == list(range(16))
    np.testing.assert_array_equal(vals, x)
    assert mh.is_primary()
    mh.barrier()  # no-op
    assert mh.broadcast_from_primary({"a": 3})["a"] == 3


def test_any_flag_single_process_identity():
    assert mh.any_flag(True) is True
    assert mh.any_flag(False) is False


def test_local_item_count_single_process_is_n_items():
    mesh = make_mesh(dp=8, tp=1)
    sh = NamedSharding(mesh, P("dp"))
    for n in (0, 1, 7, 8, 9, 23):
        assert mh.local_item_count(sh, 8, n) == n


def test_rows_respect_mesh_layout():
    # tp replicates rows across the tp axis: dedup must collapse them
    mesh = make_mesh(dp=4, tp=2)
    sh = NamedSharding(mesh, P("dp"))
    assert mh.local_rows(sh, (8, 3)) == list(range(8))
    per_dev = {d: idx for d, idx in sh.devices_indices_map((8, 3)).items()}
    assert len(per_dev) == 8  # every device holds a (replicated) slice


def test_initialize_noop_single_host(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"):
        monkeypatch.delenv(k, raising=False)
    assert mh.initialize() is False
    assert jax.process_count() == 1


def test_make_pod_mesh_rejects_straddling_tp():
    with pytest.raises(ValueError, match="straddle"):
        mh.make_pod_mesh(dp=1, tp=3)  # 8 local devices, 3 does not tile


def _synthetic_frames(n, h=48, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    frames = []
    for i in range(n):
        f = base.copy()
        f[10:20, 4 + 3 * i:14 + 3 * i] = 255
        frames.append(f)
    return frames


def test_multihost_stream_single_process_matches_depth_stream():
    """Single-process, depth_stream_multihost must yield every frame in
    order with depths matching the plain streaming path."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    frames = _synthetic_frames(6)
    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=4, mesh=mesh)
    got = list(r.depth_stream_multihost(frames))
    assert [g["index"] for g in got] == list(range(6))
    ref = list(r.depth_stream(frames))
    for g, rr in zip(got, ref):
        np.testing.assert_allclose(g["depth"], rr["depth"],
                                   rtol=1e-5, atol=1e-6)
        assert np.isclose(g["focallength_px"], rr["focallength_px"],
                          rtol=1e-5)


def test_multihost_stream_isolates_unreadable_frame():
    """An unreadable frame must not kill the host's stream (the other
    hosts would block forever in the pod-wide collective): its row is
    zero-substituted to keep alignment and its result is not yielded."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    frames = _synthetic_frames(4)
    items = [frames[0], "/no/such/frame.png", frames[2], frames[3]]
    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=4, mesh=mesh)
    got = list(r.depth_stream_multihost(items))
    assert [g["index"] for g in got] == [0, 2, 3]
    ref = {i: d for i, d in enumerate(r.depth_stream(frames))}
    for g in got:
        np.testing.assert_allclose(g["depth"], ref[g["index"]]["depth"],
                                   rtol=1e-5, atol=1e-6)


def test_multihost_stream_consumes_items_lazily():
    """The stream must not materialize the whole input (O(batch) host
    memory for decoded-frame generators): with pipeline_depth=1, at most
    (depth+1) batches of items may be consumed before the first yield."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    frames = _synthetic_frames(16)
    consumed = []

    def gen():
        for i, f in enumerate(frames):
            consumed.append(i)
            yield f

    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=4, mesh=mesh, pipeline_depth=1)
    stream = r.depth_stream_multihost(gen())
    first = next(stream)
    assert first["index"] == 0
    # one in-flight batch + the one being decoded, never the whole list
    assert len(consumed) <= 12, consumed
    rest = list(stream)
    assert [first["index"]] + [o["index"] for o in rest] == list(range(16))


def test_multihost_stream_should_stop_stops_at_batch_boundary():
    """A raised stop flag ends the stream at the NEXT batch boundary
    (already-dispatched batches drain); the check runs per batch through
    multihost.any_flag so all pod hosts break together."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    frames = _synthetic_frames(12)
    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=4, mesh=mesh, pipeline_depth=1)
    # flag already set: nothing is ever dispatched
    assert list(r.depth_stream_multihost(frames,
                                         should_stop=lambda: True)) == []
    # flag set after the first result: batch 0 (yielding) and batch 1
    # (already in flight at pipeline_depth=1) drain, batch 2 is never
    # dispatched
    stop = {"flag": False}
    got = []
    for out in r.depth_stream_multihost(frames,
                                        should_stop=lambda: stop["flag"]):
        got.append(out["index"])
        stop["flag"] = True
    assert got == list(range(8)), got


def test_multihost_stream_contract_errors():
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32", batch_size=2)
    with pytest.raises(ValueError, match="dp mesh"):
        next(r.depth_stream_multihost([np.zeros((48, 64, 3), np.uint8)]))


_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", n, pid)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, sys.argv[4])
from ml_depth_pro_video_tpu.parallel import multihost as mh
from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
assert jax.process_count() == n
mesh = make_mesh(dp=4, tp=1)
sh = NamedSharding(mesh, P("dp"))
rows = mh.local_rows(sh, (8, 3))
assert len(rows) == 4 and mh.rows_for_process(sh, (8, 3), 1 - pid) != rows
local = np.asarray([[r, r * 10.0, pid] for r in rows], dtype=np.float32)
g = mh.global_batch(sh, local, global_batch_size=8)
out = jax.jit(lambda x: x * 2.0, out_shardings=sh)(g)
vals, orows = mh.local_output(out)
assert orows == rows
np.testing.assert_allclose(vals[:, 0], np.asarray(rows, np.float32) * 2)
bc = mh.broadcast_from_primary(np.float32(7 + pid))
assert float(bc) == 7.0  # primary's value everywhere
# exact-string / full-precision JSON broadcast (broadcast_from_primary
# stages through float32 under x64-disabled jax; these must not)
txt = mh.broadcast_text("héllo" * 100 if pid == 0 else None)
assert txt == "héllo" * 100
val = 0.1234567890123456789
obj = mh.broadcast_json({"d": val, "names": ["a.png", "b.png"],
                         "normal": np.asarray([0.0, 1.0, val])}
                        if pid == 0 else None)
assert obj["d"] == val and obj["names"] == ["a.png", "b.png"]
assert obj["normal"][2] == val  # float64-exact round-trip
# pod-wide flag OR: one host's SIGINT must stop everyone, collectively
assert mh.any_flag(pid == 1) is True
assert mh.any_flag(False) is False
# the stream-yield counting rule (dp=4 over 2 hosts x 2 devices: host 0
# holds rows {0,1}, host 1 rows {2,3}; 6 items in batches of 4 put the
# tail items 4,5 on host 0's rows)
assert mh.local_item_count(sh, 4, 6) == (4 if pid == 0 else 2)
mh.barrier("test")
print(f"WORKER{pid}_OK", flush=True)
"""


_STREAM_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", n, pid)
import numpy as np
sys.path.insert(0, sys.argv[4])
from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.parallel.mesh import make_mesh
from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

rng = np.random.default_rng(3)
base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
frames = []
for i in range(6):
    f = base.copy(); f[10:20, 4 + 3 * i:14 + 3 * i] = 255; frames.append(f)

mesh = make_mesh(dp=4, tp=1)  # 4 global devices, 2 per host
r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                     batch_size=4, mesh=mesh)
for out in r.depth_stream_multihost(frames):
    print(f"ROW {out['index']} {out['depth'].sum():.6e} "
          f"{out['focallength_px']:.6e}", flush=True)
print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_stream(tmp_path):
    """Full pod-slice streaming path: 2 hosts x 2 devices run the tiny
    model over 6 frames; the union of yielded rows covers every frame
    exactly once and the depths match a single-process dp=4 run."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.video.runner import DepthVideoRunner

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "stream_worker.py"
    script.write_text(_STREAM_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port, REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process stream hung:\n" + "\n".join(outs))
    rows = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out
        for line in out.splitlines():
            if line.startswith("ROW "):
                _, idx, dsum, fpx = line.split()
                assert int(idx) not in rows, "row yielded twice"
                rows[int(idx)] = (float(dsum), float(fpx))
    assert sorted(rows) == list(range(6))
    # reference: the same stream single-process on a dp=4 mesh
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    r = DepthVideoRunner(cfg=tiny_config(), precision="fp32",
                         batch_size=4, mesh=mesh)
    for out in r.depth_stream_multihost(_synthetic_frames(6)):
        dsum, fpx = rows[out["index"]]
        assert np.isclose(out["depth"].sum(), dsum, rtol=1e-4), out["index"]
        assert np.isclose(out["focallength_px"], fpx, rtol=1e-4)


_TRAIN_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", n, pid)
import numpy as np
sys.path.insert(0, sys.argv[4])
data_dir, ckpt_dir = sys.argv[5], sys.argv[6]
from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
from ml_depth_pro_video_tpu.train.loop import fit

state = fit(data_dir, tiny_config(), batch_size=4, epochs=2, lr=1e-3,
            warmup_steps=1, checkpoint_dir=ckpt_dir, save_every=1,
            holdout=2, seed=0)
ck = sum(float(np.abs(np.asarray(l)).sum())
         for l in jax.tree.leaves(state.params))
print(f"STEP {int(state.step)} CHECKSUM {ck:.8e}", flush=True)
print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_train(tmp_path):
    """Pod-slice training: 2 hosts x 2 devices run fit() end to end
    (row-split data feed, SPMD step, orbax distributed checkpointing,
    replicated-input validation); the resulting params match a
    single-process dp=4 run on identical data bit-for-tolerance."""
    from ml_depth_pro_video_tpu.models.depth_pro import tiny_config
    from ml_depth_pro_video_tpu.train.loop import fit

    from PIL import Image

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(6):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
            data / f"s{i}.png")
        np.save(data / f"s{i}_depth.npy",
                rng.uniform(1, 10, (64, 64)).astype(np.float32))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port, REPO,
         str(data), str(tmp_path / "ckpt_mh")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process train hung:\n" + "\n".join(outs))
    sums = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out
        for line in out.splitlines():
            if line.startswith("STEP "):
                _, step, _, ck = line.split()
                sums[pid] = (int(step), float(ck))
    assert sums[0][0] == 2 and sums[0] == sums[1], sums
    # single-process reference on a dp=4 mesh over 4 local fake devices
    state = fit(str(data), tiny_config(), batch_size=4, epochs=2, lr=1e-3,
                warmup_steps=1, checkpoint_dir=str(tmp_path / "ckpt_sp"),
                save_every=1, holdout=2, seed=0, dp=4)
    ck = sum(float(np.abs(np.asarray(l)).sum())
             for l in jax.tree.leaves(state.params))
    assert int(state.step) == 2
    assert np.isclose(ck, sums[0][1], rtol=1e-5), (ck, sums[0][1])


_MAPS_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
frames_dir, out_dir = sys.argv[5], sys.argv[6]
from ml_depth_pro_video_tpu.cli.generate_depth_maps import main

main([frames_dir, "-o", out_dir, "--model", "tiny", "--full_precision",
      "--batch_size", "4", "--save_npz",
      "--coordinator", f"localhost:{port}",
      "--num_processes", str(n), "--process_id", str(pid)])
print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_maps_cli(tmp_path):
    """depth-pro-maps across a 2-host pod: the frame directory shards
    over the pod's chips and the union of the hosts' written PNGs
    covers every frame exactly once."""
    from PIL import Image

    frames = tmp_path / "frames"
    frames.mkdir()
    for i, f in enumerate(_synthetic_frames(6)):
        Image.fromarray(f).save(frames / f"f{i:03d}.png")
    out = tmp_path / "depth"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "maps_worker.py"
    script.write_text(_MAPS_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port, REPO,
         str(frames), str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=480)
            outs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process maps CLI hung:\n" + "\n".join(outs))
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o}"
        assert f"WORKER{pid}_OK" in o
        assert "wrote" in o and f"[host {pid}/2]" in o
    pngs = sorted(q.name for q in out.glob("*_depth.png"))
    assert pngs == [f"f{i:03d}_depth.png" for i in range(6)], pngs
    assert len(list(out.glob("*_depth.npz"))) == 6
    # each host wrote a strict nonempty subset (the split really happened)
    import re

    counts = [int(re.search(r"wrote (\d+) of this host's rows", o).group(1))
              for o in outs]
    assert sorted(counts) == [2, 4] or sorted(counts) == [3, 3], counts
    assert sum(counts) == 6

    # the documented pod temporal workflow (docs/USAGE.md): post-pass
    # smoothing of the pod's assembled maps must equal a SINGLE-host
    # inline --temporal_smooth run frame for frame (this also checks
    # pod-sharded raw depth == single-device raw depth)
    from ml_depth_pro_video_tpu.cli.generate_depth_maps import main as maps_main
    from ml_depth_pro_video_tpu.cli.smooth_depth import main as smooth_main

    inline = tmp_path / "depth_inline"
    maps_main([str(frames), "-o", str(inline), "--model", "tiny",
               "--full_precision", "--batch_size", "4", "--save_npz",
               "--temporal_smooth", "0.8"])
    postpass = tmp_path / "depth_postpass"
    smooth_main([str(out), "--pattern", "*_depth.npz",
                 "-o", str(postpass), "--alpha", "0.8"])
    for i in range(6):
        a = np.load(postpass / f"f{i:03d}_depth.npz")["depth"]
        b = np.load(inline / f"f{i:03d}_depth.npz")["depth"]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


_PIPELINE_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[4])
frames_dir, out_dir = sys.argv[5], sys.argv[6]
from ml_depth_pro_video_tpu.video.pipeline import main

main(["--frames_dir", frames_dir, "--output_dir", out_dir,
      "--model", "tiny", "--full_precision", "--batch_size", "4",
      "--no_fit_shapes", "--output_main_only", "--renderer", "fast",
      "--num_workers", "1", "--pattern", "cam1/output_*.png",
      "--coordinator", f"localhost:{port}",
      "--num_processes", str(n), "--process_id", str(pid)])
print(f"WORKER{pid}_OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_pipeline_cli(tmp_path):
    """The floor-plan pipeline across a 2-host pod: ground fit once on
    the primary (broadcast), frames shard over the pod's chips, each
    host writes its own frames' floor plans and its own progress file;
    the union covers every frame exactly once. Frames live in a
    SUBDIRECTORY of frames_dir (--pattern 'cam1/...'): the pod path
    broadcast must preserve the directory component."""
    import json

    from PIL import Image

    frames = tmp_path / "frames"
    (frames / "cam1").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((120, 160, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(frames / "cam1" / f"output_{i:04d}.png")
    out = tmp_path / "plans"

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "pipeline_worker.py"
    script.write_text(_PIPELINE_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port, REPO,
         str(frames), str(out)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=540)
            outs.append(o)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process pipeline hung:\n" + "\n".join(outs))
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o}"
        assert f"WORKER{pid}_OK" in o
    # ground fit once, cached next to the frames
    assert (frames / "ground.json").exists()
    # every frame produced its floor plan (each written by exactly one host)
    plans = sorted(q.name for q in out.glob("*_clean_simple_view.png"))
    assert plans == [f"output_{i:04d}_clean_simple_view.png"
                     for i in range(4)], plans
    # per-host progress files whose union covers all frames, no overlap
    with open(out / "processing_progress.json") as f:
        done0 = set(json.load(f))
    with open(out / "processing_progress.p1.json") as f:
        done1 = set(json.load(f))
    assert not (done0 & done1)
    assert done0 | done1 == {f"output_{i:04d}.png" for i in range(4)}


def test_two_process_cluster(tmp_path):
    """Spawn a real 2-process jax.distributed CPU cluster."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", port, REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process cluster hung:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out
