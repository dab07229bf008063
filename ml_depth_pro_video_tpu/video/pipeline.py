"""Video batch orchestrator: frames -> depth -> clean point cloud -> floor plan.

Behavioral parity with `/root/reference/pointcloud_pipeline.py:473-890`
(frame-range selection by digits-in-filename, ground plane computed once
from the first frame and cached as ``ground.json``, per-frame
success/timestamp resume via ``processing_progress.json``,
``--force_reprocess``, SIGINT graceful stop, ETA reporting, fixed-axis
video framing) — redesigned TPU-first:

- ONE resident compiled model streams batched frames over the device
  (the reference rebuilds the model and infers twice per frame per
  worker process, SURVEY §3.3 — the known perf bug, not replicated);
- geometry post-processing overlaps device compute through a host
  thread pool instead of share-nothing model-replica processes.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..geom.clean import clean_shadows, remove_stray_points
from ..geom.floorplan_viz import (
    fast_floorplan_image,
    fast_floorplan_visualization,
    floorplan_visualization,
)
from ..geom.ground import (
    fit_ground_plane,
    grid_ground_adjustment,
    load_ground_plane,
    normalize_to_ground,
    optimize_ground_plane,
    save_ground_plane,
)
from ..geom.pointcloud import PointCloud
from ..geom.render import save_render
from ..geom.unproject import depth_to_3d
from .runner import DepthVideoRunner


def frame_number(path: str) -> int | None:
    digits = "".join(ch for ch in os.path.basename(path) if ch.isdigit())
    return int(digits) if digits else None


def normalized_cloud_from_depth(
    depth: np.ndarray,
    f_px: float,
    image: np.ndarray,
    ground_model: dict,
    grid_size: int = 20,
    ground_percentile: float = 5.0,
    max_depth: float | None = None,
) -> PointCloud:
    """depth map + ground model -> ground-normalized, grid-adjusted cloud.

    Hot path of the video pipeline: prefers the fused native kernel
    (native/geometry.cpp, one pass; exact same math) and falls back to
    the numpy chain when the native lib or uint8 colors are unavailable.
    """
    if image is None or image.dtype == np.uint8:
        from ..native import neighbors as native

        fused = native.normalized_cloud(
            depth, f_px, ground_model, image=image,
            grid_size=grid_size, percentile=ground_percentile, max_depth=max_depth,
        )
        if fused is not None:
            pts, cols = fused
            return PointCloud(pts, cols)
    cloud = depth_to_3d(depth, f_px, image=image, max_depth=max_depth)
    pts = normalize_to_ground(cloud.points, ground_model)
    pts = grid_ground_adjustment(pts, grid_size=grid_size, percentile=ground_percentile)
    return PointCloud(pts, cloud.colors)


def compute_ground_from_frame(depth: np.ndarray, f_px: float,
                              optimize: bool = True, seed: int = 0) -> dict:
    """Once-per-video ground fit, mirroring the reference's three-stage
    chain (the reference pipeline routes its first frame through
    `create_normalized_pointcloud`, `img_to_normalized_pointcloud.py:
    1237-1258`): fit on a <=50k sample, L-BFGS-B optimize, then a
    guided refit over all points."""
    points, _ = depth_to_3d(depth, f_px)
    if len(points) > 50_000:
        sel = np.random.default_rng(seed).choice(len(points), 50_000, replace=False)
        sample = points[sel]
    else:
        sample = points
    model = fit_ground_plane(sample, seed=seed)
    if optimize:
        model = optimize_ground_plane(sample, model)
    return fit_ground_plane(points, initial_model=model, seed=seed)


def process_single_frame(
    result: dict,
    output_dir: str,
    ground_model: dict,
    height_threshold: float = 1.3,
    point_size: float = 10,
    fit_shapes: bool = True,
    visualize_3d: bool = False,
    simple_output: bool = False,
    output_all_files: bool = True,
    x_limits=None,
    z_limits=None,
    renderer: str = "matplotlib",
    dpi: int = 300,
    device_session=None,
) -> tuple[bool, float]:
    """Geometry + visualization for one frame (depth already computed).
    ``dpi`` defaults to the reference's 300 (`pointcloud_pipeline.py:357`).
    ``device_session`` (a `geom.device_floorplan.DeviceFloorplanSession`)
    replaces the whole host geometry chain with the on-chip program —
    same per-frame fault-isolation contract, same output path."""
    t0 = time.time()
    try:
        frame_name = os.path.splitext(os.path.basename(result["key"]))[0]
        if device_session is not None:
            plan_path = os.path.join(
                output_dir, f"{frame_name}_clean_simple_view.png")
            device_session.process(result["depth"], result["image"],
                                   result["focallength_px"], plan_path)
            return True, time.time() - t0
        cloud = normalized_cloud_from_depth(
            result["depth"], result["focallength_px"], result["image"], ground_model
        )
        cloud = remove_stray_points(cloud, nb_points=20, radius=0.1)
        cloud = clean_shadows(cloud)

        if visualize_3d:
            save_render(
                os.path.join(output_dir, f"{frame_name}_pcd_preview.png"),
                cloud, view="front", width=1280, height=720,
            )

        plan_path = os.path.join(output_dir, f"{frame_name}_clean_simple_view.png")
        if renderer == "fast":
            # the numpy rasterizer draws shape overlays itself now;
            # matplotlib only produces the golden _shapes/_floor_plan
            # artifacts when output_all_files asks for them
            if fit_shapes and not simple_output:
                fast_floorplan_visualization(
                    cloud, plan_path, height_threshold=height_threshold,
                    fit_shapes=True, output_all_files=output_all_files,
                    x_limits=x_limits, z_limits=z_limits, dpi=dpi,
                )
            else:
                fast_floorplan_image(cloud, plan_path, height_threshold=height_threshold,
                                     x_limits=x_limits, z_limits=z_limits)
        else:
            floorplan_visualization(
                cloud,
                plan_path,
                height_threshold=height_threshold,
                point_size=point_size,
                dpi=dpi,
                fit_shapes=fit_shapes and not simple_output,
                output_all_files=output_all_files,
                x_limits=x_limits,
                z_limits=z_limits,
            )
        return True, time.time() - t0
    except Exception as exc:  # noqa: BLE001 - per-frame fault isolation
        import traceback

        print(f"Error processing {result.get('key')}: {exc}")
        traceback.print_exc()
        return False, time.time() - t0


def process_images_to_floor_plans(
    frames_dir: str,
    output_dir: str | None = None,
    height_threshold: float = 1.3,
    point_size: float = 10,
    downscale_factor: float = 1.0,
    half_precision: bool = True,
    start_frame: int | None = None,
    end_frame: int | None = None,
    pattern: str = "output_*.png",
    fit_shapes: bool = True,
    visualize_3d: bool = False,
    num_workers: int = 2,
    simple_output: bool = False,
    output_all_files: bool = True,
    resume: bool = False,
    force_reprocess: bool = False,
    x_limits=None,
    z_limits=None,
    batch_size: int = 1,
    renderer: str = "matplotlib",
    runner: DepthVideoRunner | None = None,
    parallel: str = "none",
    speed: str = "exact",
    temporal_smooth: float = 0.0,
    model: str = "large",
    packed_fetch: bool = False,
    geometry: str = "host",
    device_subsample: int = 1,
):
    """Process a frame directory into per-frame floor plans.

    Multi-host (pod slices): after ``parallel.multihost.initialize()``
    run the SAME call on every host — frames shard over the pod's chips
    through ONE SPMD program, each host runs geometry/visualization for
    (and writes) only its own frames, the ground plane is computed once
    and broadcast from the primary, and each host keeps its own
    ``processing_progress.p<rank>.json`` (resume reads the union).
    Assumes a shared frames filesystem; SIGINT must be delivered to
    every host (a lone interrupted host desyncs the pod's collectives).
    """
    import jax

    pod = jax.process_count() > 1
    if pod:
        from ..parallel import multihost as mh
    if geometry not in ("host", "device"):
        raise ValueError(f"geometry must be 'host' or 'device', got "
                         f"{geometry!r}")
    if geometry == "device":
        # the device tier runs unproject→normalize→clean→splat as ONE
        # XLA program per frame (geom/device_floorplan.py) — it covers
        # the plain floorplan output only; shape fitting and 3D previews
        # need the cleaned host cloud
        if fit_shapes or visualize_3d:
            raise ValueError(
                "--geometry device serves the plain floorplan path; "
                "shape fitting / 3D previews need the host cloud "
                "(drop --fit_shapes/--visualize_3d or use --geometry host)")
        if pod and (x_limits is None or z_limits is None):
            raise ValueError(
                "multi-host --geometry device needs explicit --x_limits/"
                "--z_limits (each host would otherwise frame its own "
                "first frame and the plans would not align)")
    output_dir = output_dir or frames_dir
    os.makedirs(output_dir, exist_ok=True)

    image_paths = sorted(glob.glob(os.path.join(frames_dir, pattern)))
    if start_frame is not None or end_frame is not None:
        image_paths = [
            p for p in image_paths
            if (n := frame_number(p)) is not None
            and (start_frame is None or n >= start_frame)
            and (end_frame is None or n <= end_frame)
        ]
    had_any = bool(image_paths)

    # resume bookkeeping (processing_progress.json schema parity).
    # Multi-host: each rank owns its own progress file (concurrent JSON
    # writes to one path would corrupt it) and the skip-completed filter
    # reads the UNION of all ranks' files.
    suffix = f".p{jax.process_index()}" if pod and jax.process_index() else ""
    progress_file = os.path.join(output_dir, f"processing_progress{suffix}.json")
    completed: dict = {}
    if resume and not force_reprocess:
        all_done: dict = {}
        for pf in sorted(glob.glob(os.path.join(
                output_dir, "processing_progress*.json"))):
            try:
                with open(pf) as f:
                    data = json.load(f)
            except Exception:
                data = None
            if data is not None:
                all_done.update(data)
            if pf == progress_file:
                completed = data if data is not None else {}
        image_paths = [p for p in image_paths
                       if os.path.basename(p) not in all_done]
    if pod:
        # the filtered list determines the multihost row split, so every
        # host must use the PRIMARY's view — a stale shared-FS read of
        # the frames glob or another rank's progress file on one host
        # would silently desync the pod's batches (or hang it, if list
        # lengths diverge). Exact-string broadcast, and the empty-list
        # early return below then fires on every host or none.
        # frames_dir-RELATIVE paths, not basenames: a --pattern with a
        # directory component (e.g. 'cam1/*.png') must rejoin to the
        # actual file on every host
        names = mh.broadcast_json(
            [os.path.relpath(p, frames_dir) for p in image_paths])
        image_paths = [os.path.join(frames_dir, n) for n in names]
        had_any = bool(int(mh.broadcast_from_primary(np.int32(had_any))))
    if not image_paths:
        print("All frames already processed." if had_any
              else "No images to process")
        return completed

    stop = {"flag": False}
    prev_handler = signal.signal(signal.SIGINT, lambda *_: stop.__setitem__("flag", True))

    mesh = None
    if pod and runner is None:
        from ..parallel.mesh import make_mesh

        # pod mode needs the global dp mesh regardless of --parallel
        if parallel == "latency":
            print("multi-host run: --parallel latency is single-host only; "
                  "using pod-wide dp")
        if temporal_smooth > 0.0:
            raise ValueError(
                "temporal_smooth is single-host only (frames interleave "
                "across hosts); run the depth-pro-smooth post-pass "
                "(video/temporal.py::smooth_depth_files)")
        if packed_fetch:
            raise ValueError("packed_fetch is single-host only (pod "
                             "hosts fetch only their local rows)")
        parallel = "dp"
        mesh = make_mesh(tp=1)
        batch_size = max(batch_size, jax.device_count())
    elif runner is None and parallel in ("dp", "latency"):
        from ..parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh(tp=1)
        else:
            print(f"--parallel {parallel}: single device, running unsharded")
            parallel = "none"
    from ..models.depth_pro import model_preset

    runner = runner or DepthVideoRunner(
        cfg=model_preset(model),
        precision="bf16" if half_precision else "fp32",
        batch_size=batch_size,
        downscale_factor=downscale_factor,
        mesh=mesh,
        parallel=parallel if parallel in ("dp", "latency") else "dp",
        speed=speed,
        temporal_smooth=temporal_smooth,
        fetch_pack="u16" if packed_fetch else "none",
    )

    try:
        # ground plane: load cached or compute once from the first frame
        first_result = None
        ground_model = load_ground_plane(frames_dir)
        if pod:
            # collective protocol — every host must take the same branch
            # (the frame-0 inference is a pod-wide SPMD program), so the
            # PRIMARY's view of ground.json decides for everyone
            have = bool(int(mh.broadcast_from_primary(
                np.int32(1 if ground_model is not None else 0))))
            if not have:
                if mh.is_primary():
                    print("Computing ground plane from first frame...")
                first = None
                for res in runner.depth_stream_multihost([image_paths[0]]):
                    first = res  # only the row-0 host (the primary) yields
                # the primary's fit can fail (degenerate frame, unwritable
                # frames_dir, unexpected mesh layout) — if it just raised,
                # every other host would hang in the value broadcast below,
                # so its success/failure is itself broadcast first and
                # re-raised POD-WIDE
                err = None
                if mh.is_primary():
                    try:
                        if first is None:
                            raise RuntimeError(
                                "ground frame did not land on the primary "
                                "host (unexpected mesh layout?) — compute "
                                "ground.json single-host first and rerun")
                        ground_model = compute_ground_from_frame(
                            first["depth"], first["focallength_px"])
                        save_ground_plane(ground_model, frames_dir)
                    except Exception as exc:  # noqa: BLE001
                        err = f"{type(exc).__name__}: {exc}"
                err = mh.broadcast_json(err)
                if err is not None:
                    raise RuntimeError(f"primary host's ground fit failed "
                                       f"(pod-wide abort): {err}")
            # float64-exact value broadcast (broadcast_from_primary would
            # stage through float32 under the default x64-disabled jax)
            vals = mh.broadcast_json({
                "normal": np.asarray(ground_model["normal"], np.float64),
                "d": float(ground_model["d"]),
                "origin": np.asarray(ground_model["origin"], np.float64),
            } if mh.is_primary() else None)
            ground_model = {"normal": np.asarray(vals["normal"], np.float64),
                            "d": float(vals["d"]),
                            "origin": np.asarray(vals["origin"], np.float64)}
        elif ground_model is None:
            print("Computing ground plane from first frame...")
            first_result = runner.infer_one(image_paths[0])
            ground_model = compute_ground_from_frame(
                first_result["depth"], first_result["focallength_px"])
            save_ground_plane(ground_model, frames_dir)

        def result_stream():
            if pod:
                # frames shard over the pod; this host sees only its rows
                # (frame 0 re-infers once — the reuse below is not worth a
                # cross-host result shuffle). The SIGINT flag goes INTO
                # the stream, which resolves it pod-wide per batch — the
                # consumer loops below must not break per-host (see
                # depth_stream_multihost's docstring)
                yield from runner.depth_stream_multihost(
                    image_paths, should_stop=lambda: stop["flag"])
                return
            # reuse the ground-fit inference for frame 0 instead of
            # running it through the model a second time (the reference
            # double-infers EVERY frame, `pointcloud_cleaner.py:50-124`;
            # don't re-grow even one copy of that)
            rest = image_paths
            if first_result is not None:
                yield first_result
                rest = image_paths[1:]
            yield from runner.depth_stream(rest)

        import threading

        progress_lock = threading.Lock()

        def save_progress(name: str, ok: bool):
            # called from geometry worker threads; serialize the JSON write.
            # Only SUCCESSFUL frames are recorded (reference schema,
            # `pointcloud_pipeline.py:676,746`) so --resume retries
            # failures instead of skipping them forever.
            if not ok:
                return
            with progress_lock:
                completed[name] = {"success": True, "timestamp": time.time()}
                tmp = progress_file + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(completed, f, indent=2)
                os.replace(tmp, progress_file)

        t_start = time.time()
        n_done = 0
        total = len(image_paths)
        if pod:
            # this host handles only its own rows; size the ETA to them
            from ..parallel.mesh import batch_sharding

            total = mh.local_item_count(batch_sharding(runner.mesh),
                                        runner.batch_size, len(image_paths))
        # a worker pool only helps with cores to spare: on a 1-core host
        # thread overlap measurably HURTS (GIL + memory contention —
        # 6.2 vs 3.0 s/frame measured), so clamp to the core count.
        # Clamp BEFORE sizing the in-flight bound below.
        num_workers = max(1, min(num_workers, os.cpu_count() or 1))
        # bound in-flight geometry: inference streams ~20x faster than
        # the host stages, and each queued result holds the full frame +
        # depth (~20 MB at 1536^2) — an unbounded backlog OOMs long runs
        inflight = threading.Semaphore(num_workers * 2)

        device_session = None
        if geometry == "device":
            from ..geom.device_floorplan import DeviceFloorplanSession

            ignored = [f for f, on in (
                ("--renderer fast", renderer == "fast"),
                ("--point_size", point_size != 10),
                ("--simple_output", simple_output)) if on]
            if ignored:
                # the device raster draws with a fixed radius-1 splat;
                # silence about dropped flags would read as a bug
                print("--geometry device renders the fixed-style device "
                      f"raster; ignoring: {', '.join(ignored)}")
            device_session = DeviceFloorplanSession(
                ground_model, height_threshold=height_threshold,
                x_limits=x_limits, z_limits=z_limits,
                # persist the derived framing next to ground.json so a
                # --resume run keeps frame 0's scale/offset instead of
                # re-deriving from the first unprocessed frame
                limits_cache=os.path.join(frames_dir,
                                          "floorplan_limits.json"),
                subsample=device_subsample)

        def handle(result):
            nonlocal n_done
            try:
                ok, dt = process_single_frame(
                    result, output_dir, ground_model,
                    height_threshold=height_threshold, point_size=point_size,
                    fit_shapes=fit_shapes, visualize_3d=visualize_3d,
                    simple_output=simple_output, output_all_files=output_all_files,
                    x_limits=x_limits, z_limits=z_limits, renderer=renderer,
                    device_session=device_session,
                )
            finally:
                inflight.release()
            with progress_lock:
                n_done += 1
                done = n_done
            save_progress(os.path.basename(result["key"]), ok)
            avg = (time.time() - t_start) / done
            eta = avg * (total - done)
            print(f"[{done}/{total}] {os.path.basename(result['key'])} "
                  f"ok={ok} {dt:.1f}s (avg {avg:.1f}s/frame, ETA {eta/60:.1f} min)")

        if num_workers > 1:
            # device inference streams ahead; geometry overlaps on host threads
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                futures = []
                for result in result_stream():
                    # pod mode: the stream itself stops collectively
                    # (breaking here per-host would deadlock the other
                    # hosts' next SPMD dispatch)
                    if stop["flag"] and not pod:
                        break
                    inflight.acquire()
                    futures.append(pool.submit(handle, result))
                if stop["flag"]:
                    # drop queued work; only already-running frames finish
                    n_cancelled = sum(1 for fut in futures if fut.cancel())
                    print(f"Interrupted — finishing in-flight frames "
                          f"({n_cancelled} queued frames cancelled)...")
                for fut in futures:
                    if not fut.cancelled():
                        fut.result()
        else:
            for result in result_stream():
                if stop["flag"] and not pod:
                    print("Interrupted.")
                    break
                inflight.acquire()
                handle(result)
        return completed
    finally:
        signal.signal(signal.SIGINT, prev_handler)


def main(argv=None):  # pragma: no cover - CLI shim, exercised via cli tests
    import argparse

    ap = argparse.ArgumentParser(description="Video frames -> floor plans (TPU)")
    ap.add_argument("--frames_dir", required=False, default=None,
                    help="directory of frames (or destination when --video is given)")
    ap.add_argument("--video", default=None,
                    help="decode this video file into frames_dir first")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--height_threshold", type=float, default=1.3)
    ap.add_argument("--point_size", type=float, default=10)
    ap.add_argument("--downscale_factor", type=float, default=1.0)
    ap.add_argument("--half_precision", action="store_true", default=True,
                    help="bf16 compute (the DEFAULT here, unlike the fp32 "
                         "reference — framework speed-mode convention)")
    ap.add_argument("--full_precision", dest="half_precision", action="store_false")
    ap.add_argument("--start_frame", type=int, default=None)
    ap.add_argument("--end_frame", type=int, default=None)
    ap.add_argument("--pattern", default="output_*.png")
    # reference defaults (`pointcloud_pipeline.py:795`): shape fitting
    # and the full artifact set are ON; --output_main_only suppresses
    ap.add_argument("--fit_shapes", action="store_true", default=True)
    ap.add_argument("--no_fit_shapes", dest="fit_shapes", action="store_false")
    ap.add_argument("--visualize_3d", action="store_true")
    ap.add_argument("--num_workers", "--num_threads", type=int, default=2)
    ap.add_argument("--simple_output", action="store_true")
    ap.add_argument("--output_all_files", action="store_true", default=True)
    ap.add_argument("--output_main_only", dest="output_all_files", action="store_false")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--force_reprocess", action="store_true")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--renderer", choices=["matplotlib", "fast"], default="matplotlib")
    ap.add_argument("--geometry", choices=["host", "device"], default="host",
                    help="device: run unproject/normalize/clean/splat as "
                         "ONE on-chip program per frame (plain floorplan "
                         "output only; implies --no_fit_shapes — "
                         "geom/device_floorplan.py)")
    ap.add_argument("--device_subsample", type=int, default=1,
                    help="pixel stride for --geometry device: 2 quarters "
                         "the on-chip cost (501->155 ms/frame at 1536²) "
                         "at ~96%% raster occupancy agreement")
    from ..models.depth_pro import SPEED_PRESETS as _SP
    ap.add_argument("--speed", choices=sorted(_SP), default="exact",
                    help="ToMe token-merge approximation tiers "
                         "(balanced=0.25, fast=0.5 merge ratio)")
    ap.add_argument("--parallel", choices=["none", "dp", "latency"], default="none",
                    help="multi-chip mode: dp shards frame batches, latency "
                         "shards the MODEL for single-stream speed")
    ap.add_argument("--packed_fetch", action="store_true",
                    help="fetch depth as device-quantized log-u16 (half "
                         "the device->host bytes; <=~2.5e-4 relative "
                         "error - video/pack.py; single-host only)")
    ap.add_argument("--temporal_smooth", type=float, default=0.0,
                    help="EMA weight (0=off) for flicker-free video depth: "
                         "scale-aligned blending on static pixels, motion "
                         "passes through (video/temporal.py)")
    from ..models.depth_pro import MODEL_PRESETS as _MP
    ap.add_argument("--model", choices=list(_MP), default="large",
                    help="model family member (base/small need a "
                         "trained/distilled checkpoint — depth-pro-distill)")
    ap.add_argument("--x_limits", type=float, nargs=2, default=None)
    ap.add_argument("--z_limits", type=float, nargs=2, default=None)
    # reference-style individual bound flags (`pointcloud_pipeline.py`)
    ap.add_argument("--x_min", type=float, default=None)
    ap.add_argument("--x_max", type=float, default=None)
    ap.add_argument("--z_min", type=float, default=None)
    ap.add_argument("--z_max", type=float, default=None)
    from ..parallel.multihost import add_multihost_args, initialize_from_args
    add_multihost_args(ap)
    args = ap.parse_args(argv)
    # before any device use (no-op single-host); with a pod joined,
    # frames shard over every host's chips and each host writes its own
    # frames' floor plans
    pod = initialize_from_args(args)
    if args.x_limits is None and args.x_min is not None and args.x_max is not None:
        args.x_limits = [args.x_min, args.x_max]
    if args.z_limits is None and args.z_min is not None and args.z_max is not None:
        args.z_limits = [args.z_min, args.z_max]
    if not args.frames_dir and not args.video:
        ap.error("--frames_dir or --video is required")
    if args.video:
        from .decode import DECODE_COMPLETE_MARKER, extract_frames, video_info

        args.frames_dir = args.frames_dir or os.path.splitext(args.video)[0] + "_frames"
        have = glob.glob(os.path.join(args.frames_dir, args.pattern))
        # --resume reruns must not re-decode the whole video before the
        # progress filter even looks at what is done — but an interrupted
        # decode leaves a silently TRUNCATED frame set, so "frames exist"
        # is not enough (ADVICE r3): trust the decode-complete marker, or
        # failing that compare against the container's frame count.
        complete = False
        if have and not args.force_reprocess:
            marker = os.path.join(args.frames_dir, DECODE_COMPLETE_MARKER)
            if os.path.exists(marker):
                try:
                    with open(marker) as f:
                        expected = int(f.read().strip())
                except (ValueError, OSError):
                    expected = -1
                complete = 0 <= expected <= len(have)
            else:
                try:
                    expected = video_info(args.video)["frames"]
                except Exception:
                    expected = 0
                complete = expected > 0 and len(have) >= expected
                if complete:
                    # CAP_PROP_FRAME_COUNT is container metadata — an
                    # ESTIMATE (VFR/webm under-report), so this can
                    # accept a truncated pre-marker frame set; say so
                    print(f"NOTE: {len(have)} frames >= the container's "
                          f"estimated count ({expected}) but no "
                          "decode-complete marker exists — completeness "
                          "is inferred from metadata; pass "
                          "--force_reprocess if frames look truncated")
            if not complete:
                print(f"{len(have)} frames in {args.frames_dir} look "
                      "incomplete (no decode-complete marker / fewer than "
                      "the video's frame count); re-extracting")
        if pod:
            # collective decision: every host must take the same branch
            # (the barrier below is pod-wide) and a non-primary host may
            # see a stale shared-FS view — the primary's answer rules
            from ..parallel.multihost import broadcast_from_primary

            complete = bool(int(broadcast_from_primary(np.int32(complete))))
        if complete:
            print(f"{len(have)} frames already extracted in {args.frames_dir}; "
                  "skipping decode (--force_reprocess re-extracts)")
        elif pod:
            # one decoder per pod: the primary extracts onto the shared
            # filesystem while the other hosts wait at the barrier, so
            # every host then globs the identical complete frame set
            from ..parallel.multihost import barrier, broadcast_json, is_primary

            err = None
            if is_primary():
                print(f"Decoding {args.video} -> {args.frames_dir}")
                # a primary-only failure (corrupt video, ffmpeg missing,
                # disk full) must not strand the other hosts at the
                # barrier — broadcast success/failure first and re-raise
                # POD-WIDE (same protocol as the ground fit)
                try:
                    extract_frames(args.video, args.frames_dir)
                except Exception as exc:  # noqa: BLE001
                    err = f"{type(exc).__name__}: {exc}"
            else:
                print("waiting for the primary host to decode "
                      f"{args.video}...")
            err = broadcast_json(err)
            if err is not None:
                raise RuntimeError(f"primary host's video decode failed "
                                   f"(pod-wide abort): {err}")
            barrier("video-decode")
        else:
            print(f"Decoding {args.video} -> {args.frames_dir}")
            extract_frames(args.video, args.frames_dir)
    process_images_to_floor_plans(
        frames_dir=args.frames_dir, output_dir=args.output_dir,
        height_threshold=args.height_threshold, point_size=args.point_size,
        downscale_factor=args.downscale_factor, half_precision=args.half_precision,
        start_frame=args.start_frame, end_frame=args.end_frame, pattern=args.pattern,
        # --geometry device implies --no_fit_shapes (the default
        # fit_shapes=True would otherwise always trip the guard)
        fit_shapes=args.fit_shapes and args.geometry != "device",
        visualize_3d=args.visualize_3d,
        num_workers=args.num_workers, simple_output=args.simple_output,
        output_all_files=args.output_all_files, resume=args.resume,
        force_reprocess=args.force_reprocess, batch_size=args.batch_size,
        renderer=args.renderer, parallel=args.parallel, speed=args.speed,
        temporal_smooth=args.temporal_smooth, model=args.model,
        packed_fetch=args.packed_fetch,
        geometry=args.geometry,
        device_subsample=args.device_subsample,
        x_limits=tuple(args.x_limits) if args.x_limits else None,
        z_limits=tuple(args.z_limits) if args.z_limits else None,
    )


if __name__ == "__main__":  # pragma: no cover
    main()
