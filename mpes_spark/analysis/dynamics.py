"""Fit-parameter dynamics + sorted-array lookups.

- ``build_dynamic_matrix``: assemble per-line fit parameters into the
  (value, change-from-baseline, relative-change) tensor used for
  time/pump-probe dynamics (reference behavior: ``build_dynamic_matrix``,
  /root/reference/mpes/analysis.py:3243-3282).
- ``binarysearch`` / ``searchinterp``: sorted-axis index lookup with
  optional linear interpolation (``legacy.binarysearch``/
  ``searchinterp``, /root/reference/mpes/legacy.py:16-46) — the
  axis-value -> bin-index helpers for driver-side slicing.
"""

from __future__ import annotations

import numpy as np


def build_dynamic_matrix(
    fitparams: np.ndarray, baseline_index: int = 0
) -> np.ndarray:
    """From an (nlines, nparams) fit-parameter table, build the
    (3, nlines, nparams) dynamics tensor: [value, delta from the
    baseline line, delta / baseline] (relative change; NaN-safe when
    the baseline parameter is 0)."""
    fp = np.asarray(fitparams, dtype=float)
    base = fp[baseline_index]
    delta = fp - base
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = np.where(base != 0, delta / base, np.nan)
    return np.stack([fp, delta, rel])


def binarysearch(arr: np.ndarray, val: float) -> int:
    """Index of the last element <= val in an ascending array
    (-1 if val precedes the array)."""
    arr = np.asarray(arr, dtype=float)
    return int(np.searchsorted(arr, val, side="right") - 1)


def searchinterp(arr: np.ndarray, val: float) -> float:
    """Fractional index of ``val`` in an ascending array by linear
    interpolation between bracketing samples (clipped at the ends)."""
    arr = np.asarray(arr, dtype=float)
    i = binarysearch(arr, val)
    if i < 0:
        return 0.0
    if i >= arr.size - 1:
        return float(arr.size - 1)
    lo, hi = arr[i], arr[i + 1]
    return float(i) if hi == lo else float(i + (val - lo) / (hi - lo))
