"""Lineshape models, composite-model building, and curve fitting.

The reference composes lineshapes as (params, expression-string) pairs
evaluated with lmfit (``gaussian``/``voigt``, ``func_add``, ``Model``,
``bootstrapfit`` — /root/reference/mpes/analysis.py:2893-3163). Here
models are plain numpy callables composed with parameter suffixes, fit
with a self-contained Levenberg–Marquardt loop (no scipy/lmfit in the
env). The pseudo-Voigt linear combination replaces the Faddeeva-based
Voigt (no scipy.special.wofz); erf uses the Abramowitz–Stegun 7.1.26
rational approximation.

``bootstrapfit`` — line-by-line fitting of a 2-D (k x E) map where
each line's fit seeds the next (the sequential-dependency case
SURVEY §7 risk 5) — runs driver-side, or per-group inside
``applyInPandas`` when batching many maps.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

# ---------------------------------------------------------------------------
# special functions (numpy-only)
# ---------------------------------------------------------------------------

def erf(x: np.ndarray) -> np.ndarray:
    """Abramowitz–Stegun 7.1.26 (|error| < 1.5e-7)."""
    x = np.asarray(x, dtype=float)
    s = np.sign(x)
    a = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * np.exp(-a * a))


# ---------------------------------------------------------------------------
# lineshapes (each: f(x, **params) -> ndarray; default param names)
# ---------------------------------------------------------------------------

def gaussian(x, amp=1.0, xc=0.0, sig=1.0, offset=0.0):
    x = np.asarray(x, dtype=float)
    return amp * np.exp(-((x - xc) ** 2) / (2 * sig**2)) + offset


def lorentzian(x, amp=1.0, xc=0.0, gam=1.0, offset=0.0):
    x = np.asarray(x, dtype=float)
    return amp * gam**2 / ((x - xc) ** 2 + gam**2) + offset


def pseudo_voigt(x, amp=1.0, xc=0.0, sig=1.0, gam=1.0, eta=0.5, offset=0.0):
    """Linear G/L combination — the standard Voigt stand-in when the
    Faddeeva function is unavailable."""
    return (
        eta * lorentzian(x, amp, xc, gam)
        + (1 - eta) * gaussian(x, amp, xc, sig)
        + offset
    )


def skewed_gaussian(x, amp=1.0, xc=0.0, sig=1.0, alpha=0.0, offset=0.0):
    """Skew-normal shape: gaussian * (1 + erf(alpha*(x-xc)/(sig*sqrt2)))."""
    x = np.asarray(x, dtype=float)
    core = gaussian(x, amp, xc, sig)
    return core * (1.0 + erf(alpha * (x - xc) / (sig * np.sqrt(2)))) + offset


MODELS: dict[str, Callable] = {
    "gaussian": gaussian,
    "lorentzian": lorentzian,
    "voigt": pseudo_voigt,
    "skewed_gaussian": skewed_gaussian,
}


def func_add(*components: tuple[str, list[str]]):
    """Compose a sum model from (model_name, param_names) components —
    the ``func_add``/``func_update`` suffix pattern
    (/root/reference/mpes/analysis.py:2967-3031). Returns (fn(x, p) ->
    y, flat param name list); ``p`` is the flat parameter vector."""
    names: list[str] = []
    slices: list[tuple[Callable, slice]] = []
    pos = 0
    for i, (mname, pnames) in enumerate(components):
        fn = MODELS[mname]
        names.extend(f"{p}_{i}" for p in pnames)
        slices.append((fn, slice(pos, pos + len(pnames))))
        pos += len(pnames)

    def model(x, p):
        p = np.asarray(p, dtype=float)
        y = np.zeros_like(np.asarray(x, dtype=float))
        for fn, sl in slices:
            y = y + fn(x, *p[sl])
        return y

    return model, names


# ---------------------------------------------------------------------------
# generic Levenberg–Marquardt
# ---------------------------------------------------------------------------

def lm_fit(
    resid: Callable[[np.ndarray], np.ndarray],
    p0: np.ndarray,
    max_iter: int = 200,
    tol: float = 1e-12,
    bounds: list[tuple[float | None, float | None]] | None = None,
) -> tuple[np.ndarray, float]:
    """Minimize ||resid(p)||^2; numeric Jacobian, diagonal damping,
    optional box clipping. Returns (p, final cost)."""
    p = np.asarray(p0, dtype=float).copy()

    def clip(q):
        if bounds:
            for k, (lo, hi) in enumerate(bounds):
                if lo is not None:
                    q[k] = max(q[k], lo)
                if hi is not None:
                    q[k] = min(q[k], hi)
        return q

    p = clip(p)
    r = resid(p)
    cost = float(r @ r)
    lam = 1e-3
    n = p.size
    for _ in range(max_iter):
        jac = np.empty((r.size, n))
        for k in range(n):
            h = max(1e-8 * abs(p[k]), 1e-12)
            q = p.copy()
            q[k] += h
            jac[:, k] = (resid(clip(q)) - r) / h
        g = jac.T @ r
        hess = jac.T @ jac
        moved = False
        for _ in range(30):
            try:
                delta = np.linalg.solve(hess + lam * np.diag(np.diag(hess) + 1e-30), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            q = clip(p + delta)
            rq = resid(q)
            cq = float(rq @ rq)
            if cq < cost:
                p, r, cost = q, rq, cq
                lam = max(lam / 10, 1e-12)
                moved = True
                break
            lam *= 10
        if not moved or float(np.abs(delta).max()) < tol:
            break
    return p, cost


class Model:
    """Curve-fit wrapper over a composite model (``Model``,
    /root/reference/mpes/analysis.py:3166-3236)."""

    def __init__(self, fn: Callable, param_names: list[str]):
        self.fn = fn
        self.param_names = param_names

    def fit(self, x, y, p0, **kw) -> dict:
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        p, cost = lm_fit(lambda p: self.fn(x, p) - y, np.asarray(p0, float), **kw)
        return {"params": dict(zip(self.param_names, p)), "p": p, "cost": cost,
                "best_fit": self.fn(x, p)}


def bootstrapfit(
    data: np.ndarray,
    x: np.ndarray,
    model: Model,
    p0: np.ndarray,
    axis: int = 0,
    shirley_removal: bool = False,
    **kw,
) -> np.ndarray:
    """Line-by-line fit of a 2-D map: fit line 0 from ``p0``, then
    seed each subsequent line with the previous line's solution
    (``bootstrapfit`` parameter bootstrapping,
    /root/reference/mpes/analysis.py:3034-3163). Returns (nlines,
    nparams) fitted parameters. Sequential by construction — batch
    *maps* (not lines) across the cluster via applyInPandas."""
    from mpes_spark.analysis.background import shirley

    lines = np.moveaxis(np.asarray(data, dtype=float), axis, 0)
    p = np.asarray(p0, dtype=float)
    out = []
    for line in lines:
        y = line - shirley(x, line) if shirley_removal else line
        res = model.fit(x, y, p, **kw)
        p = res["p"]
        out.append(p.copy())
    return np.asarray(out)
