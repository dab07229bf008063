"""Multi-host (pod-slice) execution.

The reference scales past one process with a single-machine
multiprocessing pool (`pointcloud_pipeline.py:629-714`); it has no
multi-machine story at all. On TPU the natural scaling unit is a pod
slice: N hosts each drive their locally-attached chips and ONE SPMD
program spans all of them (collectives ride ICI). JAX's model for this
is multi-controller SPMD — every host runs the same script, and after
``jax.distributed.initialize`` the mesh helpers in this package
(``make_mesh``/``make_pod_mesh``) build GLOBAL meshes, so the existing
dp/tp/pp programs become pod-wide without modification.

What this module adds is the *host side* of that contract:

- :func:`initialize` — idempotent ``jax.distributed.initialize``
  wrapper (env/args driven; no-op single-process).
- :func:`rows_for_process` / :func:`local_rows` — which global batch
  rows a given host must supply (derived from the sharding's
  device->index map, NOT assumed contiguous — correct for any mesh
  layout including tp-major ones).
- :func:`global_batch` — per-host numpy slabs -> one global sharded
  ``jax.Array`` with zero cross-host data movement
  (``jax.make_array_from_process_local_data``).
- :func:`local_output` — pull back only the rows this host computed
  (each host writes its own frames' outputs; no host ever materializes
  the global batch).
- :func:`is_primary` / :func:`barrier` / :func:`broadcast_from_primary`
  — artifact-write gating (ground.json, progress files) and the
  ground-plane reuse path, which must agree across hosts.

Single-process behavior is the identity in every helper, so the video
runner and train loop call them unconditionally.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

_ENV_COORD = "JAX_COORDINATOR_ADDRESS"  # also read by jax itself


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or form) a multi-controller JAX cluster.

    Call once at program start on EVERY host, before any other jax use.
    Arguments may come from flags or the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``);
    on real TPU pod slices all three auto-detect from the TPU metadata
    server and plain ``initialize()`` suffices. Returns True when a
    multi-process cluster was (or already had been) initialized, False
    when running single-process. Idempotent: a second call is a no-op.
    """
    # must not touch jax.process_count()/jax.devices() here: they
    # initialize the XLA backend, after which distributed.initialize
    # refuses to run
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    on_tpu_pod = coordinator_address is None and num_processes is None
    if on_tpu_pod and not _tpu_pod_autodetectable():
        return False  # plain single-host run; nothing to join
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # pragma: no cover - double init across libs
        if "already" not in str(e).lower():
            raise
    n = jax.process_count()
    log.info("multihost: process %d/%d, %d local / %d global devices",
             jax.process_index(), n,
             jax.local_device_count(), jax.device_count())
    # every pod process compiles the same SPMD program — the persistent
    # cache makes restarts (and processes beyond the first on a shared
    # filesystem) disk reads instead of 20-40 s recompiles
    from ..utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    return n > 1


def _tpu_pod_autodetectable() -> bool:
    """True when jax.distributed.initialize() can self-configure (GKE /
    Cloud TPU metadata present). Kept conservative: never trigger a
    blocking coordinator handshake on a plain single-host run — note
    single-host TPU plugins still set ``TPU_WORKER_HOSTNAMES`` (to one
    entry), so only a multi-entry list counts."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    return any(os.environ.get(k) for k in
               ("MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"))


def add_multihost_args(parser) -> None:
    """Attach the standard multi-host flags to an argparse parser."""
    g = parser.add_argument_group("multi-host")
    g.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (or set "
                        "JAX_COORDINATOR_ADDRESS); omit on Cloud TPU pods "
                        "where it auto-detects")
    g.add_argument("--num_processes", type=int, default=None,
                   help="total number of host processes in the cluster")
    g.add_argument("--process_id", type=int, default=None,
                   help="this host's rank in [0, num_processes)")


def initialize_from_args(args) -> bool:
    return initialize(getattr(args, "coordinator", None),
                      getattr(args, "num_processes", None),
                      getattr(args, "process_id", None))


def is_primary() -> bool:
    return jax.process_index() == 0


def make_pod_mesh(dp: int | None = None, tp: int = 1) -> Mesh:
    """A (dp, tp) mesh over ALL hosts' devices, laid out so tp stays
    within one host's local chips whenever ``tp <= local_device_count``
    (tp's all-reduces then never cross a host boundary, which also keeps
    them off DCN on multi-slice deployments). ``jax.devices()`` orders
    devices process-major, so the plain reshape in ``make_mesh`` already
    has that property; this wrapper exists to validate it loudly."""
    from .mesh import make_mesh

    local = jax.local_device_count()
    if tp > 1 and local % tp != 0 and tp % local != 0:
        raise ValueError(
            f"tp={tp} does not tile the {local} local devices per host; "
            f"tensor-parallel groups would straddle hosts unevenly")
    return make_mesh(dp=dp, tp=tp)


def rows_for_process(sharding: NamedSharding, global_shape,
                     process_index: int) -> list[int]:
    """Global leading-dim rows stored on ``process_index``'s devices.

    Derived from the sharding's device->index map rather than assumed
    contiguous, so it is correct for any mesh layout. Rows are returned
    sorted and deduplicated (replicated sub-axes repeat rows per device).
    """
    rows: set[int] = set()
    n = int(global_shape[0])
    for dev, idx in sharding.devices_indices_map(tuple(global_shape)).items():
        if dev.process_index != process_index:
            continue
        sl = idx[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = n if sl.stop is None else int(sl.stop)
        rows.update(range(start, stop))
    return sorted(rows)


def local_rows(sharding: NamedSharding, global_shape) -> list[int]:
    """Rows THIS host must supply / will hold. Identity split (all rows)
    when single-process."""
    return rows_for_process(sharding, global_shape, jax.process_index())


def local_item_count(sharding: NamedSharding, batch_size: int,
                     n_items: int) -> int:
    """How many of ``n_items`` stream elements THIS host yields when the
    stream is consumed in global batches of ``batch_size`` rows split by
    ``sharding`` (the yield rule of
    ``video/runner.py::depth_stream_multihost``: one result per local
    row that maps to a real item; tail rows past ``n_items`` are padding
    and never yielded). Single-process this is ``n_items``."""
    rows = local_rows(sharding, (batch_size, 1, 1, 1))
    n_batches = (n_items + batch_size - 1) // batch_size
    return sum(1 for g in range(n_batches) for r in rows
               if g * batch_size + r < n_items)


def global_batch(sharding: NamedSharding, local_data: np.ndarray,
                 global_batch_size: int | None = None) -> jax.Array:
    """Assemble a global sharded array from this host's rows.

    ``local_data`` holds exactly the rows :func:`local_rows` reported,
    in global-row order. No cross-host transfer happens: each host
    device_puts its slab onto its local devices and the result is a
    global ``jax.Array`` view over all of them.
    """
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_data), sharding)
    global_shape = None
    if global_batch_size is not None:
        global_shape = (global_batch_size,) + tuple(local_data.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_data), global_shape)


def local_output(arr: jax.Array) -> tuple[np.ndarray, list[int]]:
    """Fetch only the rows of a global result that live on this host.

    Returns ``(values, rows)`` where ``values[i]`` is global row
    ``rows[i]``. Single-process this is just ``(np.asarray(arr),
    range(n))``. Never gathers remote shards.
    """
    if jax.process_count() == 1:
        a = np.asarray(arr)
        return a, list(range(a.shape[0]))
    by_row: dict[int, np.ndarray] = {}
    for shard in arr.addressable_shards:
        sl = shard.index[0]
        start = 0 if sl.start is None else int(sl.start)
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            by_row.setdefault(start + i, data[i])
    rows = sorted(by_row)
    return np.stack([by_row[r] for r in rows]), rows


def barrier(name: str = "barrier") -> None:
    """Block until every host reaches this point (orders artifact writes
    against reads, e.g. primary writes ground.json, others reuse it)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def any_flag(flag: bool) -> bool:
    """Pod-wide OR of a host-local boolean (e.g. "did THIS host catch
    SIGINT?"). Every host must call it at the same program point — the
    gather is a collective — and the identical result everywhere keeps
    subsequent control flow collective (the whole point: a per-host stop
    decision on a pod-wide stream deadlocks the other hosts' SPMD
    dispatch). Identity single-process."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.int32(1 if flag else 0))
    return bool(np.max(np.asarray(flags)) > 0)


def broadcast_from_primary(pytree):
    """Ship host-side values (e.g. the fitted ground plane) from process
    0 to every host so all SPMD programs see identical inputs.

    CAUTION: values stage through JAX arrays, so with the default
    ``jax_enable_x64=False`` float64 leaves are silently downcast to
    float32 — use :func:`broadcast_json` for host-side metadata that
    must keep full precision (or exact strings)."""
    if jax.process_count() == 1:
        return pytree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(pytree)


def broadcast_text(text: str | None) -> str:
    """Broadcast an arbitrary-length string from the primary, exactly.

    Two phases (length, then padded uint8 payload) so non-primary hosts
    never need to know the size up front; bytes round-trip exactly —
    no dtype staging, no precision loss. Non-primary hosts may pass
    anything (``None``); the primary's value is returned everywhere.
    """
    if jax.process_count() == 1:
        return text if text is not None else ""
    from jax.experimental import multihost_utils

    payload = (text or "").encode("utf-8") if is_primary() else b""
    n = int(multihost_utils.broadcast_one_to_all(np.int32(len(payload))))
    buf = np.zeros(n, np.uint8)
    if is_primary():
        buf[:] = np.frombuffer(payload, np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(buf).decode("utf-8")


def broadcast_json(obj) -> "object":
    """Broadcast any JSON-serializable host-side value from the primary
    with full float precision (repr round-trip) and exact structure —
    the right channel for fitted parameters, file lists, decisions.
    Non-primary hosts may pass anything (``None``)."""
    import json

    class _NumpyEncoder(json.JSONEncoder):
        def default(self, o):
            if isinstance(o, np.ndarray):
                return o.tolist()
            if isinstance(o, np.generic):
                return o.item()
            return super().default(o)

    text = json.dumps(obj, cls=_NumpyEncoder) if is_primary() else None
    return json.loads(broadcast_text(text))
