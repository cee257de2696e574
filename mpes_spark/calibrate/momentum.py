"""Momentum calibration: two-point pixel -> k scale solve.

Reference behavior: ``calibrateK``
(/root/reference/mpes/analysis.py:486-566) — derive row/column
pixel-to-momentum conversion ratios from two symmetry points, either
equiscale (one shared ratio from the known |k_ab| distance) or
per-axis ratios from known coordinates of both points. Output feeds
:func:`mpes_spark.transforms.momentum.imxy2kxy_expr`-style column
factories.
"""

from __future__ import annotations

import numpy as np


def calibrate_k(
    image_shape: tuple[int, int],
    pxla,
    pxlb,
    k_ab: float | None = None,
    kcoorda=None,
    kcoordb=(0.0, 0.0),
    equiscale: bool = False,
) -> dict:
    """Solve (row, column) momentum scales from two symmetry points
    given in (row, col) pixel coordinates. Returns ``coeffs`` (fr, fc),
    per-axis coordinate vectors ``axes`` and plot ``extent``."""
    nr, nc = image_shape
    pxla = np.asarray(pxla, dtype=float)
    pxlb = np.asarray(pxlb, dtype=float)
    kcoordb = np.asarray(kcoordb, dtype=float)

    if equiscale:
        if k_ab is None:
            raise ValueError("equiscale solve needs the known distance k_ab")
        d_ab = float(np.linalg.norm(pxla - pxlb))
        fr = fc = k_ab / d_ab
    else:
        if kcoorda is None:
            raise ValueError("per-axis solve needs kcoorda")
        kcoorda = np.asarray(kcoorda, dtype=float)
        fc = (kcoorda[1] - kcoordb[1]) / (pxla[1] - pxlb[1])
        fr = (kcoorda[0] - kcoordb[0]) / (pxla[0] - pxlb[0])

    k_row = (np.arange(nr) - pxlb[0]) * fr + kcoordb[0]
    k_col = (np.arange(nc) - pxlb[1]) * fc + kcoordb[1]
    return {
        "coeffs": (float(fr), float(fc)),
        "axes": (k_row, k_col),
        "extent": (k_col[0], k_col[-1], k_row[0], k_row[-1]),
        "center": (float(pxlb[0]), float(pxlb[1])),
        "koffset": (float(kcoordb[0]), float(kcoordb[1])),
    }
