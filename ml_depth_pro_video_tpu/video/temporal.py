"""Temporal depth smoothing for video streams (beyond the reference).

The reference's video pipeline runs every frame independently
(`/root/reference/pointcloud_pipeline.py:473-890`), so monocular depth
flickers frame to frame: global scale jitter (each frame re-derives its
own metric scale through the FOV head) plus per-pixel estimation noise.
This module adds an opt-in, device-side smoother:

1. work in INVERSE depth (noise is closer to uniform there, and it is
   the model's native output domain);
2. robustly align the incoming frame to the running state with a global
   scale+shift fit over temporally-static pixels (closed-form weighted
   least squares) — kills scale flicker without touching structure;
3. EMA-blend ONLY where the aligned frame agrees with the state
   (relative change below ``tau``); everything else (real motion,
   disocclusions) passes through UNTOUCHED and re-seeds the state — no
   ghosting trails.

The update is a few fused elementwise passes + two reductions —
microseconds at 1536² next to the ~160 ms model. The streaming runner
uses the BATCHED device-side form (:func:`smooth_batch`: lax.scan over
the batch in playback order, EMA state resident on the chip, the
smoothed depth fetched INSTEAD of the raw one — zero added host↔device
traffic). :class:`TemporalSmoother` is the per-frame host API for the
`depth-pro-smooth` post-pass over saved maps.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _update_core(state: jnp.ndarray, depth: jnp.ndarray, *, alpha: float,
                 tau: float, align: bool):
    """One smoothing step. state/depth: (H, W) metric depth maps.
    Returns (new_state, smoothed_depth), both (H, W) fp32."""
    eps = 1e-6
    s = 1.0 / jnp.clip(depth.astype(jnp.float32), eps, 1e6)   # inverse depth
    ref = 1.0 / jnp.clip(state.astype(jnp.float32), eps, 1e6)

    if align:
        # static-pixel mask for the FIT (pre-alignment, loose 2*tau band)
        w = (jnp.abs(s - ref) / (jnp.abs(ref) + eps) < 2.0 * tau).astype(
            jnp.float32)
        n = jnp.sum(w)
        nsafe = jnp.maximum(n, 1.0)
        # CENTERED (covariance-form) weighted least squares. The raw
        # normal equations (n*Σws² - (Σws)²) cancel catastrophically in
        # fp32 at inverse depths ~1e-4 (the difference is ~1e-7 of the
        # terms), making the fitted scale noisy at ~3e-4 rel and
        # reduction-order dependent; centering removes the cancellation.
        # Identity in exact math: det = n * Σw(s-m̄)².
        m_s = jnp.sum(w * s) / nsafe
        m_r = jnp.sum(w * ref) / nsafe
        ds_c = s - m_s
        dr_c = ref - m_r
        var = jnp.sum(w * ds_c * ds_c)
        cov = jnp.sum(w * ds_c * dr_c)
        det = n * var
        a = cov / jnp.where(det > eps, var, 1.0)
        b = m_r - a * m_s
        # degenerate fit (too few static pixels / flat scene): identity.
        # A scale fit far from 1 is a scene cut, not flicker — identity
        # there too, and the per-pixel gate below re-seeds the state.
        ok = (det > eps) & (n > 0.01 * s.size) & (a > 0.5) & (a < 2.0)
        s = jnp.where(ok, a * s + b, s)

    static = jnp.abs(s - ref) / (jnp.abs(ref) + eps) < tau
    blended = jnp.where(static, alpha * ref + (1.0 - alpha) * s, s)
    return 1.0 / jnp.clip(blended, eps, 1e6), 1.0 / jnp.clip(blended, eps, 1e6)


_update = functools.partial(jax.jit, static_argnames=("alpha", "tau", "align"))(
    _update_core)


def _update_core_np(state: np.ndarray, depth: np.ndarray, *, alpha: float,
                    tau: float, align: bool):
    """Host (numpy) twin of :func:`_update_core`, same math in fp32.

    Exists for the serving layer's per-session smoothers: the jitted
    kernel is shape- and (alpha, tau)-specialized, so client-controlled
    resolutions/params would grow the XLA executable cache without
    bound (one multi-second compile per distinct value), and every
    request would queue a device op behind the batcher's inference
    stream. Proven equal to the device path in tests/test_temporal.py."""
    eps = np.float32(1e-6)
    s = np.float32(1.0) / np.clip(depth.astype(np.float32), eps, 1e6)
    ref = np.float32(1.0) / np.clip(state.astype(np.float32), eps, 1e6)

    if align:
        w = (np.abs(s - ref) / (np.abs(ref) + eps) < 2.0 * tau).astype(
            np.float32)
        n = np.sum(w)
        nsafe = max(n, 1.0)
        # centered form, mirroring the device kernel (see the comment
        # there): the raw normal equations cancel catastrophically at
        # inverse depths ~1e-4 and would diverge from the device path
        m_s = np.sum(w * s) / nsafe
        m_r = np.sum(w * ref) / nsafe
        ds_c = s - m_s
        dr_c = ref - m_r
        var = np.sum(w * ds_c * ds_c)
        cov = np.sum(w * ds_c * dr_c)
        det = n * var
        a = cov / (var if det > eps else 1.0)
        b = m_r - a * m_s
        ok = (det > eps) and (n > 0.01 * s.size) and (0.5 < a < 2.0)
        if ok:
            s = a * s + b
    static = np.abs(s - ref) / (np.abs(ref) + eps) < tau
    blended = np.where(static, alpha * ref + (1.0 - alpha) * s, s)
    out = np.float32(1.0) / np.clip(blended, eps, 1e6)
    return out, out


@functools.partial(jax.jit, static_argnames=("alpha", "tau", "align"))
def _update_batch(state: jnp.ndarray, depths: jnp.ndarray,
                  advance: jnp.ndarray, *, alpha: float, tau: float,
                  align: bool):
    """Sequential smoothing over a BATCH of frames in playback order
    (lax.scan over the leading dim — frames depend on each other, so
    the batch dim cannot be vmapped). ``advance``: (B,) bool; False
    rows (batch padding / the seed frame) pass through unsmoothed and
    leave the state untouched. Returns (new_state, smoothed (B,H,W))."""

    def step(st, xs):
        d, a = xs
        new_st, out = _update_core(st, d, alpha=alpha, tau=tau, align=align)
        return (jnp.where(a, new_st, st),
                jnp.where(a, out, d.astype(jnp.float32)))

    return jax.lax.scan(step, state, (depths, advance))


def smooth_batch(state, depths, n: int | None = None, *, alpha: float,
                 tau: float = 0.05, align: bool = True):
    """Device-side batched smoothing for the streaming runner: smooth
    the first ``n`` rows of ``depths`` (a (B, H, W) DEVICE array — the
    un-fetched model output) in playback order. Returns
    ``(new_state, smoothed)`` both still on the device, so smoothing
    adds ZERO host↔device traffic: the runner fetches the smoothed
    depth INSTEAD of the raw one, and the state never leaves the chip.

    ``state=None`` (or a resolution change) re-seeds from the first
    frame, which passes through unchanged — identical semantics to
    :class:`TemporalSmoother` frame for frame.
    """
    if not 0.0 <= alpha < 1.0:
        # same contract as TemporalSmoother: alpha=1 freezes static
        # pixels at the seed frame forever, alpha>1 extrapolates with a
        # negative weight on the current frame — both silently corrupt
        raise ValueError(f"alpha must be in [0, 1), got {alpha}")
    d = jnp.asarray(depths)
    B = d.shape[0]
    n = B if n is None else n
    advance = np.zeros((B,), bool)
    advance[:n] = True
    if state is None or state.shape != d.shape[1:]:
        state = d[0].astype(jnp.float32)
        advance[0] = False
    return _update_batch(state, d, jnp.asarray(advance), alpha=alpha,
                         tau=tau, align=align)


class TemporalSmoother:
    """Streaming wrapper: feed metric depth maps in playback order.

    ``alpha``: EMA weight of the history on static pixels (0 disables
    blending; 0.8 ≈ 5-frame memory). ``tau``: relative inverse-depth
    change above which a pixel counts as real motion and passes
    through. ``align``: fit the global scale+shift each frame.
    A resolution change (or ``reset()``) re-seeds the state.

    ``host=True`` runs the numpy twin of the kernel instead of the
    jitted device one — same fp32 math, no XLA compile per distinct
    (shape, alpha, tau) and no device dispatch. The serving layer's
    per-session smoothers use it (those params are client-controlled,
    so device-side they would grow the executable cache without bound
    and serialize every request behind the inference stream).
    """

    def __init__(self, alpha: float = 0.8, tau: float = 0.05,
                 align: bool = True, host: bool = False):
        if not 0.0 <= alpha < 1.0:
            raise ValueError(f"alpha must be in [0, 1), got {alpha}")
        self.alpha = float(alpha)
        self.tau = float(tau)
        self.align = bool(align)
        self.host = bool(host)
        self._state = None

    def reset(self) -> None:
        self._state = None

    def update(self, depth) -> np.ndarray:
        """depth: (H, W) metric depth (numpy or jax). Returns the
        smoothed (H, W) fp32 numpy map."""
        if self.host:
            d = np.asarray(depth)
            if self._state is None or self._state.shape != d.shape:
                self._state = np.asarray(d, np.float32)
                return self._state
            self._state, out = _update_core_np(
                self._state, d, alpha=self.alpha, tau=self.tau,
                align=self.align)
            return out
        d = jnp.asarray(depth)
        if self._state is None or self._state.shape != d.shape:
            self._state = jnp.asarray(d, jnp.float32)
            return np.asarray(self._state)
        self._state, out = _update(self._state, d, alpha=self.alpha,
                                   tau=self.tau, align=self.align)
        return np.asarray(out)


def smooth_depth_files(paths, output_dir: str | None = None,
                       alpha: float = 0.8, tau: float = 0.05,
                       align: bool = True, key: str = "depth",
                       chunk: int = 16) -> int:
    """Post-pass smoothing over SAVED depth maps, in the given order.

    This is the tool the streaming paths point at when they cannot
    smooth inline (multi-host runs interleave frames across hosts —
    `video/runner.py::depth_stream_multihost`): after the pod writes
    per-frame ``.npz``/``.npy`` maps, one host runs this over the full
    frame sequence.

    ``paths``: depth files in playback order — ``.npz`` (smooths array
    ``key``, every other array is copied through) or ``.npy`` (the bare
    array). ``output_dir=None`` rewrites each file in place (atomic
    replace); otherwise writes the same basename under ``output_dir``.
    Returns the number of files written.

    Frames go through the device in ``chunk``-sized batches
    (:func:`smooth_batch` — identical output to the per-frame filter,
    proven in tests), cutting per-frame dispatch overhead ~``chunk``×
    on long sequences; a resolution change flushes the open chunk and
    re-seeds.
    """
    import os

    if not 0.0 <= alpha < 1.0:
        # validate BEFORE any file is rewritten: smooth_batch would
        # raise too, but only after the first flush opened temp files
        raise ValueError(f"alpha must be in [0, 1), got {alpha}")
    state = None
    written = 0
    buf: list = []  # (out_path, tmp, payload|None, depth) per open frame

    def flush():
        nonlocal state, written
        if not buf:
            return
        depths = np.stack([b[3] for b in buf]).astype(np.float32)
        state, sm = smooth_batch(state, depths, len(buf), alpha=alpha,
                                 tau=tau, align=align)
        out = np.asarray(sm)
        for i, (out_path, tmp, payload, d) in enumerate(buf):
            smoothed = out[i].astype(d.dtype, copy=False)
            # write through an open handle: np.save/savez APPEND their
            # extension to a bare string path, and an extension-bearing
            # temp name (X.npz.tmp.npz) would match the very globs that
            # feed reruns of this pass — a crash mid-flush would then
            # leave a stale temp that double-feeds (or crashes) the
            # rerun's EMA. "X.npz.tmp" matches no depth-map pattern.
            with open(tmp, "wb") as f:
                if payload is None:  # .npy
                    np.save(f, smoothed)
                else:
                    payload[key] = smoothed
                    np.savez_compressed(f, **payload)
            os.replace(tmp, out_path)
            written += 1
        buf.clear()

    for path in paths:
        if output_dir is None:
            out_path = path
        else:
            os.makedirs(output_dir, exist_ok=True)
            out_path = os.path.join(output_dir, os.path.basename(path))
        tmp = out_path + ".tmp"
        if path.endswith(".npy"):
            d = np.load(path)
            payload = None
        else:
            with np.load(path) as z:
                payload = {k: z[k] for k in z.files}
            if key not in payload:
                raise KeyError(f"{path} has no array {key!r} "
                               f"(found {sorted(payload)})")
            d = payload[key]
        if buf and d.shape != buf[-1][3].shape:
            flush()  # homogeneous batches; smooth_batch re-seeds after
        buf.append((out_path, tmp, payload, d))
        if len(buf) >= max(chunk, 1):
            flush()
    flush()
    return written
