"""Resident-model streaming depth runner.

The reference rebuilds the model and runs inference TWICE per frame
(`pointcloud_cleaner.py:50-124`, SURVEY §3.3) inside per-process
workers. The TPU-native replacement: ONE resident compiled model; a
host prefetch thread decodes/normalizes upcoming frames while the
device computes the current batch; frames ride the leading batch dim
and can be DP-sharded over a mesh. Depth comes back to the host once
per frame, nothing else crosses the host/device boundary.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
from typing import Iterable, Iterator

import numpy as np

import jax
import jax.numpy as jnp

from ..core.precision import resolve_precision
from ..models.depth_pro import (
    DEFAULT_MONODEPTH_CONFIG,
    DepthProConfig,
    infer_fn,
    init_depth_pro,
    load_checkpoint,
)
# load_stream_item lives in the jax-free io.image module so process
# decode workers unpickle it WITHOUT importing jax/the model stack
# (cheap spawn, real isolation)
from ..io.image import load_stream_item as _load_frame




class DepthVideoRunner:
    """Streaming batched depth inference with host/device overlap."""

    def __init__(
        self,
        cfg: DepthProConfig = DEFAULT_MONODEPTH_CONFIG,
        precision="bf16",
        batch_size: int = 1,
        downscale_factor: float = 1.0,
        mesh=None,
        prefetch: int = 2,
        rng_seed: int = 0,
        quantize: bool = False,
        max_retries: int = 2,
        parallel: str = "dp",
        speed: str = "exact",
        decode_workers: int | None = None,
        pipeline_depth: int = 2,
        exported_path: str | None = None,
        temporal_smooth: float = 0.0,
        fetch_pack: str = "none",
        decode_pool: str = "auto",
    ):
        if parallel not in ("dp", "latency"):
            raise ValueError(f"parallel must be 'dp' or 'latency', got {parallel!r}")
        if fetch_pack not in ("none", "u16"):
            raise ValueError(f"fetch_pack must be 'none' or 'u16', got {fetch_pack!r}")
        if decode_pool not in ("auto", "thread", "process"):
            raise ValueError(f"decode_pool must be 'auto', 'thread' or "
                             f"'process', got {decode_pool!r}")
        if speed != "exact":
            from ..models.depth_pro import apply_speed

            cfg = apply_speed(cfg, speed)
        # persistent XLA cache: a restarted process re-reads its compiled
        # programs from disk instead of re-paying the 20-40 s full-dims
        # compile (utils/compile_cache.py; no-op on CPU/test backends)
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.precision = resolve_precision(precision)
        if mesh is not None and parallel == "dp":
            from ..parallel.mesh import round_batch_to_dp

            # dispatch pads partial batches to batch_size anyway
            batch_size = round_batch_to_dp(batch_size, mesh)
        self.batch_size = batch_size
        self.downscale_factor = downscale_factor
        self.mesh = mesh
        self.prefetch = prefetch
        self.max_retries = max_retries
        # "dp": frames sharded over chips (throughput). "latency": the
        # MODEL is sharded over chips (parallel/latency.py) — lowest
        # single-stream latency, best with batch_size=1.
        self.parallel = parallel
        # decode/normalize threads feeding the stream: an 8-chip mesh at
        # full rate needs ~20 ms/frame of host feed, beyond one PNG
        # decoder thread (scripts/feed_ceiling_8dev.out); results stay
        # in input order
        if decode_workers is None:
            decode_workers = min(8, os.cpu_count() or 1)
        self.decode_workers = max(int(decode_workers), 1)
        # decode pool type: threads release the GIL inside cv2/PIL decode
        # but the surrounding numpy conversion/EXIF work still serializes
        # on it, so thread scaling flattens after ~2 workers
        # (scripts/feed_sustained.out). "process" pre-forks spawn-context
        # workers that only decode (never touch jax/the TPU client) and
        # ships frames back pickled (~memcpy rate); "auto" picks process
        # once there are enough workers AND cores for the fixed ~1-2 s
        # per-worker spawn cost to amortize.
        if decode_pool == "auto":
            decode_pool = ("process" if self.decode_workers >= 4
                           and (os.cpu_count() or 1) >= 4 else "thread")
        self.decode_pool = decode_pool
        # batches dispatched ahead of the blocking fetch: depth 1 is the
        # classic double-buffer (fetch N while N+1 computes); depth 2
        # additionally overlaps N+2's host->device upload with both — on
        # slow links (the axon tunnel here) transfers rival compute, so
        # keeping an upload, a compute, and a download concurrently in
        # flight is what hides them (scripts/feed_sustained.out)
        self.pipeline_depth = max(int(pipeline_depth), 1)
        # temporal EMA weight for video streams (0 = off, the reference
        # behavior: every frame independent — video/temporal.py).
        # Validated here too (smooth_batch re-checks): alpha=1 freezes
        # every static pixel at frame 1, alpha>1 extrapolates with a
        # negative weight — both silently corrupt output
        if not 0.0 <= float(temporal_smooth) < 1.0:
            raise ValueError(f"temporal_smooth must be in [0, 1), got "
                             f"{temporal_smooth}")
        self.temporal_smooth = float(temporal_smooth)
        # "u16": quantize depth to log-domain uint16 ON DEVICE and fetch
        # 2 bytes/px instead of 4 — halves the steady-state device→host
        # traffic at ≤~2.5e-4 relative error (video/pack.py), far below
        # the bf16 compute path's own deviation. Consumers still see
        # fp32 depth (host unpack).
        self.fetch_pack = fetch_pack

        params = load_checkpoint(cfg)
        if params is None:
            if cfg.checkpoint_uri is not None:
                logging.getLogger(__name__).warning(
                    "checkpoint %s not found; running with RANDOM weights "
                    "(depth output will be garbage)", cfg.checkpoint_uri)
            params = init_depth_pro(jax.random.PRNGKey(rng_seed), cfg)
        if quantize:
            from ..ckpt.quantize import quantize_vit_weights

            params = quantize_vit_weights(params)
        from ..models.depth_pro import fold_head_params

        params = fold_head_params(params)  # precompute head deconv+conv fold
        self.params = jax.tree.map(jnp.asarray, params)
        if mesh is not None:
            from ..parallel.sharding import shard_params

            self.params = shard_params(self.params, mesh, tensor_parallel=False)
        self._jit = {}
        # AOT-exported program (ckpt/export.py): serves the hot path —
        # single-device, no-EXIF uint8 batches at the artifact's exact
        # shape — with ZERO per-process XLA compile; everything else
        # (mixed f_px, odd tail shapes, meshes) falls back to jit
        self._exported = None
        if exported_path is not None:
            if mesh is not None and parallel != "dp":
                raise ValueError("exported_path serves the single-device "
                                 "and dp-mesh paths; latency-parallel "
                                 "programs must jit")
            if jax.process_count() > 1:
                # multi-controller calls of a deserialized Exported are
                # untested territory (each process would need to invoke
                # the same program over non-addressable shards); pods
                # get zero-compile restarts from the persistent
                # compilation cache instead (utils/compile_cache.py)
                raise ValueError(
                    "exported_path is single-process only; multi-host "
                    "pods warm-start via the persistent compilation "
                    "cache (DEPTH_PRO_COMPILE_CACHE)")
            from ..ckpt.export import load_exported

            # the artifact's weight format must match this runner's
            # param prep: depth-pro-export --quantize pairs with
            # quantize=True here (cross-checked via the manifest); a
            # dp-mesh runner needs the matching multi-device artifact
            # (depth-pro-export --dp N)
            self._exported = load_exported(
                exported_path, cfg, self.precision, quantize=quantize,
                n_devices=1 if mesh is None else mesh.size)
            self._exported_shape = tuple(self._exported.in_avals[-1].shape)
            if self._exported_shape[0] != self.batch_size:
                # shape-mismatched batches fall back to jit SILENTLY per
                # call — if the artifact can never match, say so now
                logging.getLogger(__name__).warning(
                    "exported artifact batch=%d but runner batch_size=%d: "
                    "full batches will jit-compile instead of using the "
                    "artifact (re-export with --batch_size %d)",
                    self._exported_shape[0], self.batch_size, self.batch_size)

    # ------------------------------------------------------------------
    def _infer(self, batch: jnp.ndarray, f_px: np.ndarray | None, mixed: bool = False):
        key = (batch.shape, f_px is not None, mixed)
        if (self._exported is not None and f_px is None and not mixed
                and tuple(batch.shape) == self._exported_shape
                and batch.dtype == jnp.uint8):
            # pre-compiled artifact serves this exact program; shares
            # the retry loop below like any jitted path
            self._jit.setdefault(key, self._exported.call)
        elif self._exported is not None and key not in self._jit:
            # the artifact exists but cannot serve this batch — without
            # a notice, an H/W mismatch (e.g. downscale_factor, or
            # frames at a non-canonical size) would silently pay the
            # full XLA compile the artifact was meant to remove
            logging.getLogger(__name__).warning(
                "exported artifact does not serve this batch (shape %s "
                "dtype %s, f_px=%s, mixed=%s; artifact wants %s uint8, "
                "no per-frame f_px) — jit-compiling instead",
                tuple(batch.shape), batch.dtype, f_px is not None, mixed,
                self._exported_shape)
        if key not in self._jit:
            cfg, prec = self.cfg, self.precision

            def norm(x):
                # uint8 frames travel to the device; normalization
                # ((x/255 - 0.5)/0.5) happens on-chip (4x less transfer)
                return x.astype(jnp.float32) / 127.5 - 1.0

            if f_px is None:
                fn = lambda p, x: infer_fn(p, norm(x), None, cfg, prec)  # noqa: E731
            else:
                # mixed batches carry NaN for frames without EXIF focal
                # length; only those derive f_px from the FOV head
                fn = lambda p, x, f: infer_fn(p, norm(x), f, cfg, prec,  # noqa: E731
                                              derive_missing=mixed)
            if self.mesh is not None and self.parallel == "latency":
                # the model itself is sharded over the mesh: patch-split
                # ViT + row-sharded conv trunk (parallel/latency.py)
                from ..parallel.latency import make_latency_infer, make_sp_mesh

                sp_mesh = make_sp_mesh(list(self.mesh.devices.flat))
                # norm runs INSIDE the jitted latency program (preprocess
                # hook) — an eager norm here would add an un-jitted
                # dispatch and a full fp32 frame copy per batch on the
                # latency-critical path
                lat = make_latency_infer(cfg, sp_mesh, prec,
                                         derive_missing=mixed,
                                         preprocess=norm)

                def fn(p, x, f=None, _lat=lat):  # noqa: E731
                    return _lat(p, x, f)
            elif self.mesh is not None:
                # shard_map: each chip runs the full per-frame program on
                # its batch slice (pallas kernels aren't GSPMD-partitionable)
                from ..parallel.spmd import make_dp_infer

                fn = make_dp_infer(fn, self.mesh,
                                   n_batch_args=1 if f_px is None else 2)
            else:
                fn = jax.jit(fn)
            self._jit[key] = fn
        fn = self._jit[key]
        if self.mesh is not None and self.parallel == "dp":
            from ..parallel.mesh import batch_sharding

            sh = batch_sharding(self.mesh)
            # multihost batches arrive pre-assembled as global arrays
            # (jax.make_array_from_process_local_data) — re-device_put
            # would fail on non-addressable shards
            if not (isinstance(batch, jax.Array) and batch.sharding == sh):
                batch = jax.device_put(batch, sh)
        args = (self.params, batch) if f_px is None else (
            self.params, batch, jnp.asarray(f_px, jnp.float32))
        # bounded retries with backoff on transient device/transport
        # failures (long video runs survive an interconnect hiccup
        # instead of dying); each failure is logged with its cause
        delay = 5.0
        for attempt in range(self.max_retries + 1):
            try:
                return fn(*args)
            except jax.errors.JaxRuntimeError as e:
                if attempt == self.max_retries:
                    raise
                import time as _time

                logging.getLogger(__name__).warning(
                    "device inference failed (attempt %d/%d): %s — retrying in %.0fs",
                    attempt + 1, self.max_retries, e, delay)
                _time.sleep(delay)
                delay = min(delay * 2, 60.0)

    def _load_one(self, item):
        """item: path | (path, f_px) | ndarray. Returns (key, image, f_px)."""
        return _load_frame(item, self.downscale_factor)

    def depth_stream(self, items: Iterable) -> Iterator[dict]:
        """Yield {"key", "depth", "focallength_px", "image"} per frame.

        Frames are grouped into device batches of ``batch_size`` (all
        frames in a stream must share a resolution for one compiled
        program; mixed sizes trigger recompiles, which still work).
        With ``temporal_smooth > 0`` each stream gets its own fresh
        smoother state (video/temporal.py) applied in playback order.
        """
        smooth_state = None  # device-resident (H, W) EMA state
        if self.temporal_smooth > 0.0:
            from .temporal import smooth_batch

            if self.mesh is not None and self.parallel == "dp":
                # the EMA scan's sequential carry runs over the
                # dp-sharded batch axis: GSPMD must gather the whole
                # sharded depth batch to thread it, adding a per-batch
                # cross-device transfer and serializing what the chips
                # would otherwise fetch independently. Correct, but the
                # depth-pro-smooth post-pass avoids the collective.
                # (latency mode shards the MODEL, not the batch — the
                # elementwise EMA shards fine there, no warning.)
                logging.getLogger(__name__).warning(
                    "temporal_smooth on a dp mesh runner smooths "
                    "SEQUENTIALLY across the sharded batch (adds an "
                    "all-gather per batch); for throughput runs prefer "
                    "the depth-pro-smooth post-pass")
        else:
            smooth_batch = None
        if self.fetch_pack == "u16":
            from .pack import pack_depth_u16, unpack_depth_u16
        else:
            pack_depth_u16 = None
        q: queue.Queue = queue.Queue(maxsize=self.prefetch * max(self.batch_size, 1))
        sentinel = object()

        def loader():
            # bounded-in-flight decode pool, order-preserving: a deque of
            # at most 2*workers futures (q.put blocks when the queue is
            # full, so long streams never load ahead unboundedly). One
            # code path for any worker count; a corrupt frame is skipped,
            # never fatal. decode_pool="process" routes path decodes to
            # pre-forked spawn-context workers (GIL-free scaling);
            # already-decoded ndarray items stay on the thread pool (a
            # frame pickled to a child and back would COST a copy).
            import contextlib
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor as _TPE
            from concurrent.futures.process import BrokenProcessPool

            pex = None
            try:
                if self.decode_pool == "process":
                    import multiprocessing
                    from concurrent.futures import ProcessPoolExecutor as _PPE

                    # spawn, not fork: this process holds a live device
                    # client whose inherited state must not leak into
                    # decode children (they unpickle io.image only —
                    # _load_frame lives in that jax-free module).
                    # Constructed INSIDE the try: a failure here (pipe
                    # fds, ENOMEM) must still deliver the sentinel or
                    # the consumer hangs on q.get() forever.
                    pex = _PPE(self.decode_workers,
                               mp_context=multiprocessing.get_context("spawn"))
                with _TPE(self.decode_workers) as ex, \
                        (pex or contextlib.nullcontext()):
                    dq: deque = deque()
                    it = iter(items)
                    exhausted = False
                    while dq or not exhausted:
                        while not exhausted and len(dq) < 2 * self.decode_workers:
                            try:
                                item = next(it)
                            except StopIteration:
                                exhausted = True
                                break
                            except Exception as exc:  # noqa: BLE001 - the
                                # ITEMS iterator itself failed: truncating
                                # silently would look like normal
                                # exhaustion — surface it to the consumer
                                q.put(("__stream_error__", exc))
                                return
                            if pex is not None and isinstance(
                                    item, (str, os.PathLike, tuple)):
                                try:
                                    fut = pex.submit(_load_frame, item,
                                                     self.downscale_factor)
                                except BrokenProcessPool as exc:
                                    # a dead pool also raises at SUBMIT;
                                    # uncaught it would end the stream
                                    # looking like normal exhaustion
                                    q.put(("__stream_error__", exc))
                                    return
                            else:
                                fut = ex.submit(self._load_one, item)
                            dq.append((item, fut))
                        if dq:
                            item, fut = dq.popleft()
                            try:
                                q.put(fut.result())
                            except BrokenProcessPool as exc:
                                # a killed decode child takes the whole
                                # pool down — every later frame would
                                # "skip"; surface a stream error instead
                                # of silently truncating
                                q.put(("__stream_error__", exc))
                                return
                            except Exception as exc:  # noqa: BLE001
                                logging.getLogger(__name__).warning(
                                    "skipping unreadable frame %r: %s", item, exc)
            except Exception as exc:  # noqa: BLE001 - ANY unexpected
                # loader failure (pool construction, executor teardown)
                # must surface to the consumer, not masquerade as a
                # normal end-of-stream truncation
                q.put(("__stream_error__", exc))
            finally:
                q.put(sentinel)

        t = threading.Thread(target=loader, daemon=True)
        t.start()

        from collections import deque

        pending = []
        raw_images = []
        # (keys, raw_images, device_out, n, inputs, dev_depth, packed)
        # flights, oldest first; up to ``pipeline_depth`` stay
        # dispatched before the oldest is fetched
        in_flight: deque = deque()

        def dispatch():
            """Launch the pending batch on the device (async)."""
            nonlocal pending, raw_images
            n = len(pending)
            keys = [p[0] for p in pending]
            xs = np.stack([p[1] for p in pending])
            fs = [p[2] for p in pending]
            have_f = all(f is not None for f in fs)
            any_f = any(f is not None for f in fs)
            pad = self.batch_size - n if n < self.batch_size else 0
            if pad:
                xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
            if any_f:
                # mixed batches: NaN marks frames whose f_px must come
                # from the FOV head; frames WITH EXIF keep their focal
                fs = [np.nan if f is None else f for f in fs]
                f_arr = np.asarray(fs + [fs[-1]] * pad, np.float32)
            else:
                f_arr = None
            mixed = any_f and not have_f
            out = self._infer(jnp.asarray(xs), f_arr, mixed=mixed)
            # post-ops (smoothing, packing) run NOW so their kernels
            # enter the device's in-order stream right behind THIS
            # batch's infer. At collect time they would queue behind
            # the NEXT batch's infer, so this batch's fetch couldn't
            # start until a full extra batch of compute finished —
            # measured 0.91x sustained instead of a win. Dispatch
            # happens in stream order, so the EMA state threads here
            # exactly as playback order requires; a retrying collect
            # re-smooths from the flight's saved pre-batch state (the
            # recompute is deterministic, so the dispatch-side chain
            # stays consistent).
            nonlocal smooth_state
            pre_state = smooth_state
            if smooth_batch is not None:
                smooth_state, dev_depth = smooth_batch(
                    smooth_state, out["depth"], n,
                    alpha=self.temporal_smooth)
            else:
                dev_depth = out["depth"]
            packed = (pack_depth_u16(dev_depth)
                      if pack_depth_u16 is not None else None)
            imgs = raw_images
            pending, raw_images = [], []
            return keys, imgs, out, n, (xs, f_arr, mixed, pre_state), \
                dev_depth, packed, smooth_state

        # known-good post-smoothing state of the last COLLECTED flight
        # (proven clean by its successful fetch). A flight's saved
        # pre_state can be poisoned — a failed device COMPUTATION (not
        # just a fetch blip) poisons every array chained onto it, and
        # the dispatch-time state threading chains each batch's
        # smoothing onto the previous batch's — so retries re-smooth
        # from here instead.
        collect_state = None

        def collect(flight):
            """Fetch a completed batch to the host. JAX dispatch is
            async, so device/transport failures surface HERE at the
            blocking fetch, not inside _infer — the bounded retry
            re-dispatches the saved inputs."""
            nonlocal collect_state, smooth_state
            keys, imgs, out, n, inputs, dev_depth, packed, post_state = flight
            delay = 5.0
            for attempt in range(self.max_retries + 1):
                try:
                    # everything device-side (smoothing, packing) was
                    # already dispatched with the batch (see dispatch());
                    # this is PURE fetch. Full arrays, pad rows sliced on
                    # the host: a device-side `[:n]` here is one more op
                    # queued behind the next batch's infer (in-order
                    # stream), stalling this fetch a full batch — and
                    # pad rows exist only in a stream's tail batch
                    if packed is not None:
                        u, lmin, lscale = packed
                        depth = unpack_depth_u16(np.asarray(u)[:n],
                                                 np.asarray(lmin)[:n],
                                                 np.asarray(lscale)[:n])
                    else:
                        depth = np.asarray(dev_depth)[:n]
                    fl = np.asarray(out["focallength_px"])[:n]
                    break
                except jax.errors.JaxRuntimeError as e:
                    if attempt == self.max_retries:
                        raise
                    logging.getLogger(__name__).warning(
                        "device fetch failed (attempt %d/%d): %s — "
                        "re-dispatching in %.0fs",
                        attempt + 1, self.max_retries, e, delay)
                    import time as _time

                    _time.sleep(delay)
                    delay = min(delay * 2, 60.0)
                    xs, f_arr, mixed, pre_state = inputs
                    out = self._infer(jnp.asarray(xs), f_arr, mixed=mixed)
                    if smooth_batch is not None:
                        # re-smooth from the last KNOWN-GOOD state (the
                        # saved pre_state only for the very first
                        # collect, where no flight has been proven yet).
                        # The recompute is deterministic, so the
                        # smoothed depth matches the no-failure stream
                        # exactly — the EMA never double-advances.
                        base = pre_state if collect_state is None \
                            else collect_state
                        post_state, dev_depth = smooth_batch(
                            base, out["depth"], n,
                            alpha=self.temporal_smooth)
                        packed = (pack_depth_u16(dev_depth)
                                  if pack_depth_u16 is not None else None)
                        # heal the dispatch-side chain: if the original
                        # failure was a poisoned COMPUTATION, every
                        # later flight's smoothing (dispatched chained
                        # onto this batch's state) is poisoned too, and
                        # so is the live smooth_state future dispatches
                        # would consume — re-thread them all from the
                        # repaired state (their infers are independent
                        # of the chain and reused as-is; smoothing is
                        # microseconds). On a plain transport blip this
                        # recomputes identical values — harmless. A
                        # flight whose own infer is also poisoned stops
                        # the walk; its own collect retry heals onward.
                        chain = post_state
                        healed = 0
                        try:
                            for j, flight_j in enumerate(in_flight):
                                (k2, i2, o2, n2, inp2, _dd2, _pk2,
                                 _ps2) = flight_j
                                chain_next, dd2 = smooth_batch(
                                    chain, o2["depth"], n2,
                                    alpha=self.temporal_smooth)
                                pk2 = (pack_depth_u16(dd2)
                                       if pack_depth_u16 is not None
                                       else None)
                                in_flight[j] = (
                                    k2, i2, o2, n2,
                                    inp2[:3] + (chain,), dd2, pk2,
                                    chain_next)
                                chain = chain_next
                                healed += 1
                        except jax.errors.JaxRuntimeError:
                            pass
                        if healed == len(in_flight):
                            smooth_state = chain
                    else:
                        dev_depth = out["depth"]
                        packed = (pack_depth_u16(dev_depth)
                                  if pack_depth_u16 is not None else None)
            if smooth_batch is not None:
                collect_state = post_state
            return [
                {"key": keys[i], "depth": depth[i], "focallength_px": float(fl[i]),
                 "image": imgs[i]}
                for i in range(n)
            ]

        while True:
            got = q.get()
            if got is sentinel:
                break
            if isinstance(got, tuple) and len(got) == 2 and got[0] == "__stream_error__":
                raise RuntimeError("frame source iterator failed") from got[1]
            key, x, f = got
            if pending and x.shape != pending[0][1].shape:
                # resolution change mid-stream: flush the homogeneous
                # batch first (np.stack needs one shape per batch)
                in_flight.append(dispatch())
                while len(in_flight) > self.pipeline_depth:
                    yield from collect(in_flight.popleft())
            pending.append((key, x, f))
            raw_images.append(x)
            if len(pending) >= self.batch_size:
                in_flight.append(dispatch())  # device starts batch N+k ...
                while len(in_flight) > self.pipeline_depth:
                    yield from collect(in_flight.popleft())  # ... during batch N's fetch
        if pending:
            in_flight.append(dispatch())
        while in_flight:
            yield from collect(in_flight.popleft())

    def depth_stream_multihost(self, items, should_stop=None) -> Iterator[dict]:
        """Pod-slice streaming (parallel/multihost.py).

        Every host calls this with the SAME ordered sequence of items
        (paths / (path, f_px) / arrays); each host decodes only the
        global batch rows that live on its local chips, the batches are
        assembled into global sharded arrays with zero cross-host data
        movement, ONE SPMD program spans the pod, and each host yields
        only its own rows' results — with ``"index"`` carrying the
        global frame number so callers write the right outputs.

        Contract (asserted): a dp mesh; one resolution for the whole
        stream (hosts cannot observe each other's frame shapes to agree
        on a flush); ``temporal_smooth`` off (frames interleave across
        hosts, a per-host EMA would skip frames). Single-process it
        degenerates to the deterministic-batching path over all rows.
        Frames without EXIF focal length get it from the FOV head, as
        in :meth:`depth_stream` (the mixed program runs unconditionally
        so every host traces identical code).

        ``items`` is consumed INCREMENTALLY one global batch at a time
        (O(batch) host memory — decoded-ndarray generators stream, they
        are never materialized). An unreadable frame is zero-substituted
        with a warning (row alignment across hosts is load-bearing) and
        its result is not yielded.

        ``should_stop`` (optional zero-arg callable, e.g. a SIGINT flag
        read) is polled once per global batch and resolved POD-WIDE
        (``multihost.any_flag``): if ANY host wants to stop, every host
        stops dispatching at the same batch boundary and drains its
        in-flight work. Callers must NOT additionally break out of this
        generator per-host on their own flag — a host that stops pulling
        while another dispatches the next pod-wide SPMD batch deadlocks
        the pod's collectives.
        """
        from ..parallel import multihost as mh
        from ..parallel.mesh import batch_sharding

        if self.mesh is None or self.parallel != "dp":
            raise ValueError("multihost streaming requires a dp mesh")
        if self.temporal_smooth > 0.0:
            raise ValueError("temporal_smooth needs every frame in "
                             "playback order on one host; run the "
                             "depth-pro-smooth post-pass instead "
                             "(video/temporal.py::smooth_depth_files)")
        if self.fetch_pack != "none":
            # packing would be one more pod-wide SPMD launch per batch
            # inside the fetch/retry path, whose collective re-dispatch
            # rules are already subtle (see collect below) — and pod
            # hosts fetch only their local rows, so the per-host win is
            # 1/num_hosts of the single-host case. Not worth the risk.
            raise ValueError("fetch_pack is single-host only")
        it = iter(items)
        B = self.batch_size
        sh = batch_sharding(self.mesh)
        # P("dp") constrains only the leading dim; trailing dims of the
        # probe shape are irrelevant to the row split
        rows = mh.local_rows(sh, (B, 1, 1, 1))

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from itertools import islice

        stream_shape = None

        def load_isolated(item):
            """Per-frame isolation, multihost flavor: an unreadable frame
            must not kill THIS host's stream (the other hosts would then
            block forever in the pod-wide collective). Failures return
            None and are substituted with a zero frame below — the row
            stays in the batch (alignment is load-bearing) but is never
            yielded."""
            try:
                return self._load_one(item)
            except Exception as exc:  # noqa: BLE001
                logging.getLogger(__name__).warning(
                    "unreadable frame %r: zero-frame substitute "
                    "(multihost rows must stay aligned)", item,
                    exc_info=exc)
                return None

        def decode_chunk(chunk, ex):
            """Decode this host's rows of one global batch. ``chunk``
            holds the batch's items (len in (0, B]); a short tail pads
            by repeating the last item."""
            nonlocal stream_shape
            n_here = len(chunk)
            loaded = list(ex.map(load_isolated,
                                 (chunk[min(r, n_here - 1)] for r in rows)))
            shape = stream_shape
            for entry in loaded:
                if entry is not None:
                    shape = entry[1].shape
                    break
            if shape is None:
                # every LOCAL row of the first batch is unreadable; a
                # raise here would strand the other hosts in the
                # pod-wide collective, so learn the stream shape from
                # any other item of the global batch first (skipping the
                # local rows load_isolated just failed on — re-decoding
                # those would duplicate the expensive failures)
                attempted = {min(r, n_here - 1) for r in rows}
                for idx, item in enumerate(chunk):
                    if idx in attempted:
                        continue
                    try:
                        shape = self._load_one(item)[1].shape
                        break
                    except Exception:  # noqa: BLE001
                        continue
            if shape is None:
                raise ValueError(
                    "every frame of the first multihost batch is unreadable "
                    "on this host (see the warnings above) — the stream "
                    "shape cannot be established")
            bad = {r for r, entry in zip(rows, loaded) if entry is None}
            loaded = [(None, np.zeros(shape, np.uint8), None)
                      if entry is None else entry for entry in loaded]
            keys = [k for k, _, _ in loaded]
            imgs = [x for _, x, _ in loaded]
            xs = np.stack(imgs)
            fs = np.asarray([np.nan if f is None else f for _, _, f in loaded],
                            np.float32)
            if stream_shape is not None and xs.shape[1:] != stream_shape:
                raise ValueError(
                    f"multihost streams need one resolution; got "
                    f"{xs.shape[1:]} after {stream_shape}")
            stream_shape = xs.shape[1:]
            return keys, xs, fs, imgs, bad, n_here

        def launch(xs, fs):
            f_sh = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec("dp"))
            x_g = mh.global_batch(sh, xs, B)
            f_g = mh.global_batch(f_sh, fs, B)
            return self._infer(x_g, f_g, mixed=True)

        def dispatch(decoded):
            keys, xs, fs, imgs, bad, n_here = decoded
            return keys, imgs, launch(xs, fs), bad, n_here, (xs, fs)

        def collect(flight, g):
            keys, imgs, out, bad, n_here, inputs = flight
            delay = 5.0
            for attempt in range(self.max_retries + 1):
                try:
                    depth, drows = mh.local_output(out["depth"])
                    fl, _ = mh.local_output(out["focallength_px"])
                    break
                except jax.errors.JaxRuntimeError as e:
                    if attempt == self.max_retries:
                        raise
                    logging.getLogger(__name__).warning(
                        "multihost fetch failed (attempt %d/%d): %s",
                        attempt + 1, self.max_retries, e)
                    import time as _time

                    _time.sleep(delay)
                    delay = min(delay * 2, 60.0)
                    if attempt > 0:
                        # the fetch reads only LOCAL shards, so the first
                        # retry is a plain re-fetch (handles transport
                        # blips without touching the collective). A
                        # second failure means the dispatched computation
                        # itself is poisoned — re-dispatch from the saved
                        # host rows, which is pod-safe because a compute
                        # failure surfaces at EVERY host's fetch, so all
                        # hosts re-enter the SPMD launch together (a lone
                        # re-dispatch would deadlock the pod).
                        out = launch(*inputs)
            assert drows == rows, (drows, rows)
            base = g * B
            for i, r in enumerate(rows):
                if r >= n_here or r in bad:
                    continue  # padding row / unreadable frame
                yield {"key": keys[i], "index": base + r, "depth": depth[i],
                       "focallength_px": float(fl[i]), "image": imgs[i]}

        with ThreadPoolExecutor(self.decode_workers) as ex:
            in_flight: deque = deque()
            g = 0
            while True:
                # the stop decision must be COLLECTIVE: flags raised by
                # per-host signal handlers land at different batch
                # boundaries, and a host that stops dispatching while
                # another enters the next pod-wide SPMD launch deadlocks
                # the pod — so every host resolves "anyone stopping?"
                # at the same per-batch point and they all break (or
                # none do) together
                if should_stop is not None and mh.any_flag(
                        bool(should_stop())):
                    break
                chunk = list(islice(it, B))
                if not chunk:
                    break
                in_flight.append((g, dispatch(decode_chunk(chunk, ex))))
                g += 1
                while len(in_flight) > self.pipeline_depth:
                    og, flv = in_flight.popleft()
                    yield from collect(flv, og)
            while in_flight:
                og, flv = in_flight.popleft()
                yield from collect(flv, og)

    def infer_one(self, item) -> dict:
        for result in self.depth_stream([item]):
            return result
        raise ValueError(f"could not read frame {item!r} (see log for the cause)")
