"""Spectral background estimation (driver-side numpy).

Shirley–Proctor–Sherwood iterative background — the standard XPS/ARPES
inelastic-scattering baseline (public algorithm: background at energy
E proportional to the integrated peak area above background on the
high-kinetic-energy side; iterate to self-consistency). Reference
behavior: ``shirley`` /root/reference/mpes/analysis.py:58-155,
vectorized stack variant ``shirley2d`` :193-285.
"""

from __future__ import annotations

import numpy as np


def shirley(
    x: np.ndarray,
    y: np.ndarray,
    tol: float = 1e-5,
    maxiter: int = 50,
    edge_pts: int = 3,
) -> np.ndarray:
    """Iterative Shirley background of one spectrum. ``edge_pts``
    samples are averaged at each end to estimate the flat baselines.
    Returns the background array (same shape as y)."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if x.size != y.size or x.size < 2 * edge_pts:
        raise ValueError("need matching x/y with at least 2*edge_pts samples")

    # orient so x is ascending; restore at the end
    flip = x[0] > x[-1]
    if flip:
        x, y = x[::-1], y[::-1]

    yl = float(y[:edge_pts].mean())  # left (low-x) baseline
    yr = float(y[-edge_pts:].mean())  # right baseline
    bg = np.zeros_like(y)

    for _ in range(maxiter):
        resid = y - yr - bg  # signal above current background
        # cumulative trapezoid integral from the left
        seg = 0.5 * (resid[1:] + resid[:-1]) * np.diff(x)
        cum = np.concatenate([[0.0], np.cumsum(seg)])
        total = cum[-1]
        if total == 0:
            break
        # area fraction on the high-x side of each point
        frac = (total - cum) / total
        bg_new = (yl - yr) * frac
        if np.max(np.abs(bg_new - bg)) < tol * max(abs(yl - yr), 1e-30):
            bg = bg_new
            break
        bg = bg_new

    out = bg + yr
    return out[::-1] if flip else out


def shirley2d(
    x: np.ndarray, traces: np.ndarray, **kw
) -> np.ndarray:
    """Shirley background per row of a trace stack (``shirley2d``)."""
    traces = np.asarray(traces, dtype=float)
    return np.stack([shirley(x, tr, **kw) for tr in traces])


def shirley_piecewise(
    x: np.ndarray,
    y: np.ndarray,
    breakpoints: list[float],
    smooth_window: int = 0,
    smooth_order: int = 2,
    **kw,
) -> np.ndarray:
    """Segment-wise Shirley background: solve each [b_i, b_{i+1}]
    span independently and concatenate, optionally Savitzky-Golay
    smoothing the assembled background to remove junction kinks
    (reference behavior: ``shirley_piecewise``,
    /root/reference/mpes/analysis.py:158-190, which savgols the tail).
    ``breakpoints`` must include both end values."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if len(breakpoints) < 2:
        raise ValueError("need at least [start, end] breakpoints")
    bg = np.empty_like(y)
    for b0, b1 in zip(breakpoints[:-1], breakpoints[1:]):
        m = (x >= b0) & (x <= b1)
        if m.sum() < 4:
            raise ValueError(f"segment [{b0}, {b1}] has <4 samples")
        seg_kw = dict(kw)
        seg_kw.setdefault("edge_pts", max(1, min(3, m.sum() // 10)))
        bg[m] = shirley(x[m], y[m], **seg_kw)
    if smooth_window:
        from mpes_spark.analysis.smooth import savgol_filter

        bg = savgol_filter(bg, smooth_window, smooth_order)
    return bg
