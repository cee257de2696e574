"""Volume alignment (beamtime ops, driver-side numpy).

Reference behavior: ``calcShiftScale``/``_shiftscale``
(/root/reference/mpes/beamtime.py:18-47, :112-169) — per-pixel grid
search for the (shift, scale) pair best aligning each trace of volume
V2 to V1 — and ``applyAlignment`` (:172-220). ``planarfilter`` is
:func:`mpes_spark.analysis.smooth.nnmean` applied per plane.

The per-pixel searches are independent -> the distributed variant
batches pixel columns through ``applyInPandas`` (same pattern as
:mod:`mpes_spark.analysis.grouped`); at the reference's 512x512 grid
the driver loop is already fast enough.
"""

from __future__ import annotations

import numpy as np


def _resample_trace(trace: np.ndarray, shift: float, scale: float) -> np.ndarray:
    """Evaluate trace at positions (idx - shift)/scale via linear
    interpolation (out-of-range -> edge values)."""
    n = trace.size
    pos = (np.arange(n) - shift) / scale
    return np.interp(pos, np.arange(n), trace)


def calc_shift_scale(
    ref_trace: np.ndarray,
    mov_trace: np.ndarray,
    shifts: np.ndarray,
    scales: np.ndarray,
) -> tuple[float, float, float]:
    """Grid search: the (shift, scale) minimizing the L2 distance
    between ``ref_trace`` and the resampled ``mov_trace``. Returns
    (shift, scale, cost)."""
    ref = np.asarray(ref_trace, dtype=float)
    mov = np.asarray(mov_trace, dtype=float)
    best = (0.0, 1.0, np.inf)
    for sh in shifts:
        for sc in scales:
            d = ref - _resample_trace(mov, sh, sc)
            c = float(np.nansum(d * d))
            if c < best[2]:
                best = (float(sh), float(sc), c)
    return best


def calc_shift_scale_map(
    vol_ref: np.ndarray,
    vol_mov: np.ndarray,
    shifts: np.ndarray,
    scales: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel (shift, scale) maps aligning ``vol_mov`` to
    ``vol_ref`` along axis 0 (the energy/trace axis)."""
    _, h, w = vol_ref.shape
    shift_map = np.zeros((h, w))
    scale_map = np.ones((h, w))
    for i in range(h):
        for j in range(w):
            sh, sc, _ = calc_shift_scale(vol_ref[:, i, j], vol_mov[:, i, j], shifts, scales)
            shift_map[i, j] = sh
            scale_map[i, j] = sc
    return shift_map, scale_map


def apply_alignment(
    vol: np.ndarray, shift_map: np.ndarray, scale_map: np.ndarray
) -> np.ndarray:
    """Apply per-pixel (shift, scale) trace alignment: W[:, i, j] =
    resample(V[:, i, j])."""
    vol = np.asarray(vol, dtype=float)
    out = np.empty_like(vol)
    _, h, w = vol.shape
    for i in range(h):
        for j in range(w):
            out[:, i, j] = _resample_trace(vol[:, i, j], shift_map[i, j], scale_map[i, j])
    return out
