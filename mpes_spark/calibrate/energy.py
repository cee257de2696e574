"""Energy-calibration solvers (driver-side, numpy-only).

Produces the coefficients consumed by the §2.2 column factories
(:func:`mpes_spark.transforms.energy.tof2ev_poly_expr` /
:func:`~mpes_spark.transforms.energy.tof2ev_expr`) — the engine analog
of the reference's solve-then-apply split (``calibrateE``,
/root/reference/mpes/analysis.py:694-805; ``fit_energyCalibation``,
:618-691). The solver output is folded into literal Column/SQL
expressions, so the distributed plan never sees the solver — only
constants.
"""

from __future__ import annotations

import numpy as np

#: m_e/2 prefactor shared with transforms.energy (public tof2ev physics)
_ME_HALF = 2.84281e-12


def calibrate_energy_poly(
    pos,
    vals,
    order: int = 3,
    refid: int = 0,
    aug: int = 1,
    E0: float | None = None,
    Eref: float | None = None,
) -> dict:
    """Polynomial energy calibration: solve ``T a = b`` by least
    squares, where row i of the differential drift-time matrix T is
    ``[pos_ref^p - pos_i^p for p in order..1]`` and ``b_i = val_ref -
    val_i`` — differencing eliminates the per-trace constant offset
    (reference math: ``calibrateE``,
    /root/reference/mpes/analysis.py:752-781).

    Returns dict with ``coeffs`` (highest order first, ready for
    ``tof2ev_poly_expr``), ``E0``, ``Tmat``, ``bvec``, ``residual``.
    """
    pos = np.asarray(pos, dtype=float)
    vals = np.asarray(vals, dtype=float)
    n = vals.size
    refid = min(refid, n - 1)
    powers = np.arange(order, 0, -1)

    others = np.delete(np.arange(n), refid)
    others = np.tile(others, aug)
    t_ref = pos[refid] ** powers.reshape(1, -1)
    tmat = t_ref - pos[others].reshape(-1, 1) ** powers.reshape(1, -1)
    bvec = vals[refid] - vals[others]

    a, res, _, _ = np.linalg.lstsq(tmat, bvec, rcond=None)

    out = {
        "coeffs": a,
        "offset": float(pos.min()),
        "Tmat": tmat,
        "bvec": bvec,
        "residual": res,
    }
    if E0 is None and Eref is not None:
        # pin the reference landmark to Eref: E0 = Eref - poly(pos_ref)
        E0 = float(Eref - _poly_eval(a, pos[refid]))
    out["E0"] = E0
    return out


def _poly_eval(a: np.ndarray, t) -> np.ndarray:
    """E(t) without offset: sum a_k t^(order-k), highest order first."""
    e = np.zeros_like(np.asarray(t, dtype=float))
    for c in a:
        e = e * t + c
    return e * t


def poly_energy_axis(a: np.ndarray, E0: float, t: np.ndarray) -> np.ndarray:
    return _poly_eval(np.asarray(a, float), np.asarray(t, float)) + E0


def tof2ev_model(
    d: float, t0: float, E0: float, t, binwidth: float = 4.125e-12, binning: int = 1
) -> np.ndarray:
    """Numpy twin of ``tof2ev_expr`` (same arithmetic)."""
    t = np.asarray(t, dtype=float)
    with np.errstate(divide="ignore"):
        q = d / (t * binwidth * 2**binning - t0)
    return _ME_HALF * q * q + E0


def fit_energy_tof(
    pos,
    vals,
    d_init: float = 1.0,
    t0_init: float = 1e-6,
    E0_init: float | None = None,
    binwidth: float = 4.125e-12,
    binning: int = 1,
    max_iter: int = 200,
    tol: float = 1e-12,
) -> dict:
    """Nonlinear least-squares fit of the drift-model ``E = m_e/2 *
    (d/(t*binwidth*2^binning - t0))^2 + E0`` to landmark (pos, vals)
    pairs — Levenberg–Marquardt with numeric Jacobian (the env has no
    scipy/lmfit; the reference delegates to lmfit's leastsq,
    /root/reference/mpes/analysis.py:653-663). ``t0`` is kept below
    ``min(pos)*binwidth*2^binning`` (the reference's bound) so the
    model pole stays outside the data."""
    pos = np.asarray(pos, dtype=float)
    vals = np.asarray(vals, dtype=float)
    t0_max = (pos.min() - 1) * binwidth * 2**binning
    p = np.array(
        [d_init, min(t0_init, t0_max), vals.min() if E0_init is None else E0_init]
    )

    def resid(p):
        return tof2ev_model(p[0], p[1], p[2], pos, binwidth, binning) - vals

    lam = 1e-3
    r = resid(p)
    cost = float(r @ r)
    for _ in range(max_iter):
        jac = np.empty((pos.size, 3))
        for k in range(3):
            h = max(1e-8 * abs(p[k]), 1e-14)
            pk = p.copy()
            pk[k] += h
            pk[1] = min(pk[1], t0_max)
            jac[:, k] = (resid(pk) - r) / h
        g = jac.T @ r
        hess = jac.T @ jac
        step_ok = False
        for _ in range(30):
            try:
                delta = np.linalg.solve(hess + lam * np.diag(np.diag(hess) + 1e-30), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            p_new = p + delta
            p_new[1] = min(p_new[1], t0_max)
            r_new = resid(p_new)
            c_new = float(r_new @ r_new)
            if c_new < cost:
                p, r, cost = p_new, r_new, c_new
                lam = max(lam / 10, 1e-12)
                step_ok = True
                break
            lam *= 10
        if not step_ok or float(np.abs(delta).max()) < tol:
            break

    return {
        "d": float(p[0]),
        "t0": float(p[1]),
        "E0": float(p[2]),
        "cost": cost,
        "binwidth": binwidth,
        "binning": binning,
    }
