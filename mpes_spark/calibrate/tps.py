"""Thin-plate-spline warp solve (Bookstein 1989).

Driver-side linear solve producing the (n+3, 2) coefficient matrix
consumed by :func:`mpes_spark.transforms.corrections.tps_expr` /
``tps_sql`` — the executor side is pure column arithmetic. Reference
behavior: ``tps_coeffs`` / ``_make_L_matrix``
(/root/reference/mpes/dask_tps.py:67-97); the math is the public
Bookstein formulation: kernel ``U(r) = r^2 ln r``, bending-energy
system ``L [w; a] = [v; 0]`` with

    L = [[K, P], [P^T, 0]],  K_ij = U(|p_i - p_j|),  P = [1, x, y].
"""

from __future__ import annotations

import numpy as np


def _U(r: np.ndarray) -> np.ndarray:
    """TPS radial kernel with the r -> 0 limit (U(0) = 0)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(r < 1e-10, 0.0, r * r * np.log(np.where(r < 1e-10, 1.0, r)))
    return out


def tps_coeffs(from_points: np.ndarray, to_points: np.ndarray) -> np.ndarray:
    """Solve TPS coefficients mapping ``from_points`` onto
    ``to_points`` (both (n, 2)). Returns (n+3, 2): n warp weights then
    (a1, ax, ay) affine terms per output coordinate, matching
    ``tps_expr``'s layout."""
    fp = np.asarray(from_points, dtype=float)
    tp = np.asarray(to_points, dtype=float)
    if fp.shape != tp.shape or fp.ndim != 2 or fp.shape[1] != 2:
        raise ValueError("from_points/to_points must be matching (n, 2) arrays")
    n = len(fp)

    dx = np.subtract.outer(fp[:, 0], fp[:, 0])
    dy = np.subtract.outer(fp[:, 1], fp[:, 1])
    K = _U(np.sqrt(dx * dx + dy * dy))
    P = np.hstack([np.ones((n, 1)), fp])
    L = np.zeros((n + 3, n + 3))
    L[:n, :n] = K
    L[:n, n:] = P
    L[n:, :n] = P.T

    V = np.zeros((n + 3, 2))
    V[:n] = tp
    # pinv: tolerates degenerate landmark sets (collinear points)
    return np.linalg.pinv(L) @ V


def tps_eval(
    coeffs: np.ndarray, points: np.ndarray, x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy twin of ``tps_expr`` (for parity tests): evaluate the
    warp at (x, y)."""
    co = np.asarray(coeffs, dtype=float)
    fp = np.asarray(points, dtype=float)
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    out = []
    for which in (0, 1):
        w, (a1, ax, ay) = co[:-3, which], co[-3:, which]
        acc = a1 + ax * x + ay * y
        for wi, (px, py) in zip(w, fp):
            r2 = (x - px) ** 2 + (y - py) ** 2
            # branch-free kernel, identical to tps_expr/tps_sql:
            # finite log times zero r2 -> exact 0 at the landmark
            u = 0.5 * r2 * np.log(r2 + 5e-324)
            acc = acc + wi * u
        out.append(acc)
    return out[0], out[1]
