"""Scale-invariant boundary metrics for depth maps.

Metric contract identical to the reference eval module
(`/root/reference/src/depth_pro/eval/boundary_metrics.py:1-332`):
neighbor-ratio foreground/background relations, NMS-thinned variants,
mask-based edge recall, and the weighted threshold sweep
(t in linspace(1.05, 1.25, 10), weights proportional to t).

Implementation is vectorized: the reference walks connected runs with a
Python generator (`connected_component`, `:6-26`); here horizontal NMS
is a segmented argmax over run ids computed with cumsum/lexsort — same
output (first maximum of each run), no Python loop over pixels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def nms_horizontal(ratio: np.ndarray, threshold: float) -> np.ndarray:
    """Keep only the first maximum of every horizontal run of
    above-threshold pixels."""
    mask = np.zeros_like(ratio, dtype=bool)
    r, c = np.nonzero(ratio > threshold)
    if r.size == 0:
        return mask
    # new run when the row changes or the column is not contiguous
    boundary = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1] + 1)]
    run_id = np.cumsum(boundary) - 1
    vals = ratio[r, c]
    # stable lexsort: within each run, order by descending value with
    # original order preserved on ties -> first element = first max
    order = np.lexsort((-vals, run_id))
    first_of_run = order[np.r_[True, run_id[order][1:] != run_id[order][:-1]]]
    mask[r[first_of_run], c[first_of_run]] = True
    return mask


def nms_vertical(ratio: np.ndarray, threshold: float) -> np.ndarray:
    return nms_horizontal(ratio.T, threshold).T


def fgbg_depth(d: np.ndarray, t: float) -> Tuple[np.ndarray, ...]:
    """Left/top/right/bottom foreground-background relations."""
    left = (d[..., :, :-1] / d[..., :, 1:]) > t
    top = (d[..., :-1, :] / d[..., 1:, :]) > t
    right = (d[..., :, 1:] / d[..., :, :-1]) > t
    bottom = (d[..., 1:, :] / d[..., :-1, :]) > t
    return left, top, right, bottom


def fgbg_depth_thinned(d: np.ndarray, t: float) -> Tuple[np.ndarray, ...]:
    left = nms_horizontal(d[..., :, :-1] / d[..., :, 1:], t)
    top = nms_vertical(d[..., :-1, :] / d[..., 1:, :], t)
    right = nms_horizontal(d[..., :, 1:] / d[..., :, :-1], t)
    bottom = nms_vertical(d[..., 1:, :] / d[..., :-1, :], t)
    return left, top, right, bottom


def fgbg_binary_mask(d: np.ndarray) -> Tuple[np.ndarray, ...]:
    assert d.dtype == bool
    left = d[..., :, :-1] & ~d[..., :, 1:]
    top = d[..., :-1, :] & ~d[..., 1:, :]
    right = d[..., :, 1:] & ~d[..., :, :-1]
    bottom = d[..., 1:, :] & ~d[..., :-1, :]
    return left, top, right, bottom


def _directional_mean(pairs) -> float:
    return 0.25 * sum(
        np.count_nonzero(a & b) / max(np.count_nonzero(b), 1) for a, b in pairs
    )


def edge_recall_matting(pr: np.ndarray, gt: np.ndarray, t: float) -> float:
    assert gt.dtype == bool
    pred = fgbg_depth_thinned(pr, t)
    target = fgbg_binary_mask(gt)
    return _directional_mean(zip(pred, target))


def boundary_f1(pr: np.ndarray, gt: np.ndarray, t: float,
                return_p: bool = False, return_r: bool = False) -> float:
    pred = fgbg_depth(pr, t)
    target = fgbg_depth(gt, t)
    r = _directional_mean(zip(pred, target))
    p = _directional_mean(zip(target, pred))
    if r + p == 0:
        return 0.0
    if return_p:
        return p
    if return_r:
        return r
    return 2 * r * p / (r + p)


def get_thresholds_and_weights(t_min: float, t_max: float, n: int):
    thresholds = np.linspace(t_min, t_max, n)
    return thresholds, thresholds / thresholds.sum()


def invert_depth(depth: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    return 1.0 / depth.clip(min=eps)


def SI_boundary_F1(predicted_depth: np.ndarray, target_depth: np.ndarray,
                   t_min: float = 1.05, t_max: float = 1.25, N: int = 10) -> float:
    assert predicted_depth.ndim == target_depth.ndim == 2
    thresholds, weights = get_thresholds_and_weights(t_min, t_max, N)
    scores = np.array([
        boundary_f1(invert_depth(predicted_depth), invert_depth(target_depth), t)
        for t in thresholds
    ])
    return float(np.sum(scores * weights))


def SI_boundary_Recall(predicted_depth: np.ndarray, target_mask: np.ndarray,
                       t_min: float = 1.05, t_max: float = 1.25, N: int = 10,
                       alpha_threshold: float = 0.1) -> float:
    assert predicted_depth.ndim == target_mask.ndim == 2
    thresholds, weights = get_thresholds_and_weights(t_min, t_max, N)
    target = target_mask > alpha_threshold
    scores = np.array([
        edge_recall_matting(invert_depth(predicted_depth), target, t=float(t))
        for t in thresholds
    ])
    return float(np.sum(scores * weights))
