"""Host-side training data pipeline.

No third-party input stack: a directory dataset of (image, depth)
pairs with a background prefetch thread, deterministic shuffling, and
device placement with DP sharding — the training-side sibling of
``video/runner.py``'s inference feed.

Expected layout: ``<root>/*.png|jpg`` images with matching
``<root>/<stem>_depth.npy`` (or ``.npz`` with a ``depth`` array).
"""

from __future__ import annotations

import glob
import os
import queue
import threading

import numpy as np

import jax


class DepthDataset:
    def __init__(self, root: str, image_size: int, seed: int = 0):
        self.image_size = image_size
        self.pairs = []
        for img in sorted(glob.glob(os.path.join(root, "*.png")) + glob.glob(os.path.join(root, "*.jpg"))):
            stem = os.path.splitext(img)[0]
            for ext in ("_depth.npy", "_depth.npz"):
                if os.path.exists(stem + ext):
                    self.pairs.append((img, stem + ext))
                    break
        if not self.pairs:
            raise FileNotFoundError(f"no (image, depth) pairs under {root}")
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.pairs)

    def _load(self, idx: int):
        from PIL import Image

        img_path, depth_path = self.pairs[idx]
        s = self.image_size
        img = Image.open(img_path).convert("RGB").resize((s, s), Image.BILINEAR)
        x = np.asarray(img, np.float32) / 127.5 - 1.0
        if depth_path.endswith(".npz"):
            with np.load(depth_path) as f:
                d = f["depth"]
        else:
            d = np.load(depth_path)
        # Validity-aware resize: bilinear on raw depth bleeds zero-valued
        # hole pixels into neighbors (a 2 m pixel next to a hole becomes
        # e.g. 0.5 m — positive, so it would PASS the silog (target > 0)
        # mask with a wildly wrong log). Resize the validity mask along
        # with the depth and re-invalidate every hole-touched pixel.
        d = np.asarray(d, np.float32)
        valid = (d > 0).astype(np.float32)
        d = np.asarray(Image.fromarray(d).resize((s, s), Image.BILINEAR))
        v = np.asarray(Image.fromarray(valid).resize((s, s), Image.BILINEAR))
        d = np.where(v >= 0.999, d, 0.0)
        return x, d

    def batches(self, batch_size: int, epochs: int = 1, sharding=None,
                prefetch: int = 2, drop_remainder: bool = True, skip: int = 0,
                local_rows=None, assemble=None):
        """Yield (images (B,S,S,3), depth (B,S,S)) device arrays.

        ``skip`` advances past the first N batches WITHOUT loading them
        (deterministic stream replay for checkpoint resume: the shuffle
        permutations are consumed, the images are not decoded).

        Multi-host mode (``local_rows`` + ``assemble``): every host runs
        the SAME seeded permutation stream but decodes only the global
        batch rows in ``local_rows`` (``parallel/multihost.local_rows``);
        the stacked local slabs are passed through ``assemble`` (usually
        ``multihost.global_batch``) to form the global sharded arrays.
        Row alignment across hosts is load-bearing, so unlike the
        single-host path an unreadable pair is substituted IN PLACE with
        a zero-depth sample (zero loss/gradient under the silog mask)
        rather than dropped-and-padded — dropping would shift every
        later row on one host only. Assumes all hosts see the same
        filesystem listing (``self.pairs`` order is globbed + sorted)."""
        if (local_rows is None) != (assemble is None):
            raise ValueError("local_rows and assemble must be given together")
        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = object()

        def load_local(sel):
            """Multi-host decode: only this host's rows of the global
            batch, in global-row order; pad/unreadable rows carry a
            zero depth target (exactly zero loss+grad via silog mask)."""
            import logging

            data = []
            for r in local_rows:
                j = sel[r] if r < len(sel) else sel[-1]  # short tail: pad
                zero_depth = r >= len(sel)
                try:
                    x, d = self._load(j)
                except Exception as exc:  # noqa: BLE001
                    logging.getLogger(__name__).warning(
                        "unreadable pair %s: zero-weight substitute "
                        "(multi-host rows must stay aligned)",
                        self.pairs[j][0], exc_info=exc)
                    s = self.image_size
                    x, d = np.zeros((s, s, 3), np.float32), None
                    zero_depth = True
                if zero_depth:
                    d = np.zeros((self.image_size, self.image_size),
                                 np.float32)
                data.append((x, d))
            return data

        def producer():
            import logging

            n_out = 0
            try:
                for _ in range(epochs):
                    order = self.rng.permutation(len(self.pairs))
                    for i in range(0, len(order), batch_size):
                        sel = order[i : i + batch_size]
                        if drop_remainder and len(sel) < batch_size:
                            continue  # same tail drop on every host
                        n_out += 1
                        if n_out <= skip:
                            continue
                        if local_rows is not None:
                            data = load_local(sel)
                            xs = np.stack([d[0] for d in data])
                            ds = np.stack([d[1] for d in data])
                            q.put((xs, ds))
                            continue
                        data = []
                        for j in sel:
                            # one corrupt pair must not silently END the
                            # whole stream (the finally-sentinel would
                            # read as normal exhaustion to the consumer)
                            try:
                                data.append(self._load(j))
                            except Exception as exc:  # noqa: BLE001
                                logging.getLogger(__name__).warning(
                                    "skipping unreadable pair %s: %s",
                                    self.pairs[j][0], exc)
                        if not data:
                            # every pair unreadable: dropping desyncs the
                            # decode-free resume skip by one batch — say so
                            logging.getLogger(__name__).warning(
                                "entire batch unreadable — dropped; "
                                "checkpoint-resume replay will be offset "
                                "by one batch")
                            n_out -= 1
                            continue
                        # pad short batches to full size instead of
                        # dropping: every counted permutation batch then
                        # yields exactly one step, keeping the decode-free
                        # `skip` aligned with state.step (fixed shapes
                        # also avoid a recompile). Pad samples reuse the
                        # last image but carry an ALL-ZERO depth target —
                        # the silog mask (`train/step.py::silog_loss`,
                        # target > 0 with a global valid-pixel count)
                        # gives them exactly zero loss and gradient, so
                        # duplicates get no extra weight.
                        if drop_remainder:
                            while len(data) < batch_size:
                                data.append((data[-1][0],
                                             np.zeros_like(data[-1][1])))
                        xs = np.stack([d[0] for d in data])
                        ds = np.stack([d[1] for d in data])
                        q.put((xs, ds))
            finally:
                q.put(stop)

        threading.Thread(target=producer, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                return
            xs, ds = item
            if assemble is not None:
                xs, ds = assemble(xs), assemble(ds)
            elif sharding is not None:
                xs = jax.device_put(xs, sharding)
                ds = jax.device_put(ds, sharding)
            yield xs, ds
