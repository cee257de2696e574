"""Smoothing / local normalization (driver-side numpy).

- Savitzky–Golay filtering from first principles (least-squares
  polynomial convolution kernel via the pseudo-inverse of the local
  Vandermonde matrix — no scipy). Reference usage: ``normspec`` smooth
  option (/root/reference/mpes/utils.py:152-188), ``sgfltr2d``
  (/root/reference/mpes/fprocessing.py:216-229).
- moving-block max-normalization (``blocknorm``,
  /root/reference/mpes/analysis.py:1184-1208).
- nearest-neighbor nanmean volume smoothing (``nnmean``,
  /root/reference/mpes/beamtime.py:85-109).
"""

from __future__ import annotations

import numpy as np


def savgol_coeffs(window: int, order: int) -> np.ndarray:
    """Savitzky–Golay convolution kernel (smoothing, derivative 0)."""
    if window % 2 == 0 or window < order + 1:
        raise ValueError("window must be odd and > order")
    half = window // 2
    pos = np.arange(-half, half + 1, dtype=float)
    vand = pos[:, None] ** np.arange(order + 1)[None, :]
    # row 0 of pinv: the coefficients reproducing the constant term at 0
    return np.linalg.pinv(vand)[0]


def savgol_filter(y: np.ndarray, window: int, order: int) -> np.ndarray:
    """Apply SG smoothing with odd-reflection edge padding (extends
    linear trends exactly, so a degree-<=1 signal is reproduced at the
    boundaries too)."""
    y = np.asarray(y, dtype=float)
    k = savgol_coeffs(window, order)[::-1]
    half = window // 2
    yp = np.pad(y, half, mode="reflect", reflect_type="odd")
    return np.convolve(yp, k, mode="valid")


def blocknorm(data: np.ndarray, mavg_axis: int = 0, blockwidth: int = 1) -> np.ndarray:
    """Normalize by the moving-block maximum along one axis: each
    sample is divided by the max over a centered window of
    ``2*blockwidth + 1`` blocks."""
    data = np.asarray(data, dtype=float)
    swapped = np.moveaxis(data, mavg_axis, 0)
    n = swapped.shape[0]
    out = np.empty_like(swapped)
    for i in range(n):
        lo, hi = max(0, i - blockwidth), min(n, i + blockwidth + 1)
        m = swapped[lo:hi].max()
        out[i] = swapped[i] / m if m else swapped[i]
    return np.moveaxis(out, 0, mavg_axis)


def nnmean(vol: np.ndarray) -> np.ndarray:
    """3x3 (per 2-D slice) nearest-neighbor nanmean smoothing of the
    last two axes of a volume."""
    vol = np.asarray(vol, dtype=float)
    p = np.pad(vol, [(0, 0)] * (vol.ndim - 2) + [(1, 1), (1, 1)], constant_values=np.nan)
    stack = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            sl = [slice(None)] * (vol.ndim - 2) + [
                slice(1 + di, 1 + di + vol.shape[-2]),
                slice(1 + dj, 1 + dj + vol.shape[-1]),
            ]
            stack.append(p[tuple(sl)])
    stacked = np.stack(stack)
    valid = ~np.isnan(stacked)
    cnt = valid.sum(axis=0)
    s = np.where(valid, stacked, 0.0).sum(axis=0)
    with np.errstate(invalid="ignore"):
        return np.where(cnt > 0, s / cnt, np.nan)
