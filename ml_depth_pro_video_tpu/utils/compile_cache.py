"""Persistent XLA compilation cache for zero-compile warm starts.

The reference pays its model build + torch dispatch warmup on every
process start (`/root/reference/src/depth_pro/depth_pro.py:49-151`); the
TPU equivalent is the ~20-40 s XLA compile of the 1536² ViT-L program —
per process, per shape. The AOT export path (`ckpt/export.py`) removes
it for a pinned (shape, batch, mesh) artifact; this module removes it
for EVERYTHING ELSE: JAX's persistent compilation cache keyed on the
lowered program, so a restarted pod worker, a CLI re-run, or a serve
process on the same machine class reuses the bits the previous process
compiled. Unlike the export artifact the cache needs no pinning — every
program variant (mixed-f_px batches, odd tail shapes, sharded train
steps) lands in the cache on first compile and is a disk read after.

Policy: ON by default for real accelerator backends, OFF for CPU (test
processes would churn thousands of tiny entries for interpreter-speed
programs). ``DEPTH_PRO_COMPILE_CACHE=<dir>`` overrides the location,
``DEPTH_PRO_COMPILE_CACHE=0`` (or ``off``/``none``) disables, and
``DEPTH_PRO_COMPILE_CACHE=<dir>`` on a CPU backend force-enables (the
dryrun/CI hook). Safe to call any number of times from any thread;
multi-process pods share one directory (the cache's file writes are
atomic rename-based, and each process just re-compiles on a miss).
"""

from __future__ import annotations

import logging
import os
import threading

LOGGER = logging.getLogger(__name__)

_OFF = ("0", "off", "none", "false")
_DEFAULT_DIR = os.path.join("~", ".cache", "ml_depth_pro_video_tpu",
                            "xla_cache")
_lock = threading.Lock()
_state: dict = {"configured": False, "dir": None}


def enable_compilation_cache(cache_dir: str | None = None,
                             force: bool = False) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/ml_depth_pro_video_tpu/xla_cache`` or the
    ``DEPTH_PRO_COMPILE_CACHE`` env var). Returns the directory in use,
    or ``None`` when disabled (env opt-out, or a CPU backend without
    ``force``). Idempotent — the first successful call wins."""
    import jax

    with _lock:
        if _state["configured"]:
            return _state["dir"]

        env = os.environ.get("DEPTH_PRO_COMPILE_CACHE")
        if env is not None and env.strip().lower() in _OFF:
            _state["configured"] = True
            return None
        if cache_dir is None:
            cache_dir = env if env else _DEFAULT_DIR

        # default-off on CPU: pytest processes compile thousands of tiny
        # programs; caching them costs more than interpreting them. An
        # EXPLICIT env dir (or force=True) overrides — that is how the
        # warm-start measurement and CI exercise the path without a chip.
        try:
            platform = jax.default_backend()
        except Exception:  # backend init failed — leave config untouched
            return None
        if platform == "cpu" and not force and not env:
            _state["configured"] = True
            return None

        cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache every program that took ≥1 s to compile (the default
            # threshold skips exactly the programs a restart re-pays) and
            # drop the entry-size floor so sharded-but-small programs
            # (tiny-config dryruns, CI) exercise the same path
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:  # pragma: no cover - config-name drift
            LOGGER.warning("persistent compilation cache unavailable: %s", e)
            _state["configured"] = True
            return None
        _state["configured"] = True
        _state["dir"] = cache_dir
        LOGGER.info("persistent XLA compilation cache at %s (platform=%s)",
                    cache_dir, platform)
        return cache_dir
