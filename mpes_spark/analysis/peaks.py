"""1-D peak detection and range-limited peak search.

Fresh implementation of the classic lookahead peak detector (Billauer's
public peakdet algorithm — candidate extremum confirmed when the signal
retreats by ``delta`` and no higher value appears within ``lookahead``
samples), the shape consumed by the energy-calibration workflow
(reference behavior: ``peakdetect1d`` /root/reference/mpes/analysis.py:308-427,
``peaksearch`` :569-615).
"""

from __future__ import annotations

import numpy as np


def peakdetect1d(
    y: np.ndarray,
    x: np.ndarray | None = None,
    lookahead: int = 200,
    delta: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Detect local maxima/minima. Returns (max_peaks, min_peaks) as
    (n, 2) arrays of (position, height)."""
    y = np.asarray(y, dtype=float).ravel()
    x = np.arange(len(y), dtype=float) if x is None else np.asarray(x, dtype=float)
    if len(x) != len(y):
        raise ValueError("x and y must have equal length")
    if lookahead < 1:
        raise ValueError("lookahead must be >= 1")

    max_peaks: list[list[float]] = []
    min_peaks: list[list[float]] = []
    mx, mn = -np.inf, np.inf
    mxpos = mnpos = None
    searching_max = True

    for i in range(len(y)):
        v = y[i]
        if v > mx:
            mx, mxpos = v, x[i]
        if v < mn:
            mn, mnpos = v, x[i]

        ahead = y[i + 1 : i + 1 + lookahead]
        if searching_max:
            if v < mx - delta and (ahead.size == 0 or ahead.max() < mx):
                max_peaks.append([mxpos, mx])
                mn, mnpos = v, x[i]
                searching_max = False
        else:
            if v > mn + delta and (ahead.size == 0 or ahead.min() > mn):
                min_peaks.append([mnpos, mn])
                mx, mxpos = v, x[i]
                searching_max = True

    return np.asarray(max_peaks), np.asarray(min_peaks)


def peaksearch(
    traces: np.ndarray,
    tof: np.ndarray,
    ranges: list[tuple[float, float]],
    pkwindow: int = 3,
) -> np.ndarray:
    """Range-limited peak per trace: for each (trace, range), the first
    detected maximum inside the window. Returns (ntraces, 2) of
    (position, height)."""
    tof = np.asarray(tof, dtype=float)
    out = []
    for rg, trace in zip(ranges, np.asarray(traces, dtype=float)):
        cond = (tof >= rg[0]) & (tof <= rg[1])
        seg_x, seg_y = tof[cond], trace.ravel()[cond]
        if seg_x.size == 0:
            raise ValueError(f"empty peak-search range {rg}")
        maxs, _ = peakdetect1d(seg_y, seg_x, lookahead=pkwindow)
        if len(maxs) == 0:
            # monotone segment: fall back to the argmax
            k = int(np.argmax(seg_y))
            out.append([seg_x[k], seg_y[k]])
        else:
            out.append(list(maxs[0]))
    return np.asarray(out)
