"""Trace alignment: dynamic time warping + range conversion +
normalization — the driver-side pieces of the energy-calibration
workflow (reference behavior: ``findCorrespondence`` via fastdtw,
/root/reference/mpes/analysis.py:904-934; ``rangeConvert``,
:1150-1177; ``normspec``, /root/reference/mpes/utils.py:152-188).

Plain O(n*m) DP DTW (traces are ~1e3 samples — driver-trivial; the
reference's fastdtw is an approximation of exactly this recurrence).
"""

from __future__ import annotations

import numpy as np


def dtw_path(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact DTW alignment path between two 1-D signals. Returns
    (k, 2) monotone index pairs (ia, ib)."""
    a = np.asarray(a, dtype=float).ravel()
    b = np.asarray(b, dtype=float).ravel()
    n, m = len(a), len(b)
    cost = np.full((n + 1, m + 1), np.inf)
    cost[0, 0] = 0.0
    d = np.abs(np.subtract.outer(a, b))
    for i in range(1, n + 1):
        row = cost[i - 1]
        cost[i, 1:] = d[i - 1]
        # cumulative: c[i,j] = d + min(c[i-1,j], c[i,j-1], c[i-1,j-1])
        for j in range(1, m + 1):
            cost[i, j] += min(row[j], cost[i, j - 1], row[j - 1])
    # backtrack
    path = [(n - 1, m - 1)]
    i, j = n, m
    while (i, j) != (1, 1):
        moves = [(i - 1, j - 1), (i - 1, j), (i, j - 1)]
        i, j = min(
            (mv for mv in moves if mv[0] >= 1 and mv[1] >= 1),
            key=lambda mv: cost[mv],
        )
        path.append((i - 1, j - 1))
    return np.asarray(path[::-1])


from mpes_spark.utils import find_nearest  # noqa: E402  (shared helper)


def range_convert(
    x: np.ndarray, xrng: tuple[float, float], pathcorr: np.ndarray
) -> tuple[float, ...]:
    """Map a value range on trace A to the corresponding range on
    trace B through a DTW path (``rangeConvert``,
    /root/reference/mpes/analysis.py:1150-1177)."""
    pathcorr = np.asarray(pathcorr)
    out = []
    for xval in xrng:
        xind = find_nearest(xval, x)
        k = find_nearest(xind, pathcorr[:, 0])
        out.append(x[pathcorr[k, 1]])
    return tuple(out)


def normspec(*traces: np.ndarray) -> np.ndarray:
    """Max-normalize each trace to [0, 1] (``normspec`` smooth=False
    path)."""
    out = []
    for tr in traces:
        tr = np.asarray(tr, dtype=float)
        peak = np.abs(tr).max()
        out.append(tr / peak if peak > 0 else tr)
    return np.asarray(out)
