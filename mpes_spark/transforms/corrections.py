"""Distortion / wavefront corrections on the event table.

Covers the reference's correction surface:
- ToF wavefront corrections, 4 radial profiles (``applyECorrection``,
  ``/root/reference/mpes/fprocessing.py:2286-2343``),
- projective/homography coordinate transform (``perspectiveTransform``,
  ``/root/reference/mpes/base.py:650-668``; ``applyKCorrection`` type
  'mattrans', ``/root/reference/mpes/fprocessing.py:2345-2376``),
- thin-plate-spline warp evaluated as column arithmetic
  (``dask_tps._calculate_f``, ``/root/reference/mpes/dask_tps.py:42-53``),
- inverse deformation-field lookup (``dfieldapply``,
  ``/root/reference/mpes/base.py:530-539``) as a broadcast join against
  the flattened field, or a broadcast-ndarray pandas UDF.

Everything scalar-parameterized is pure Column arithmetic (JVM-side,
codegen'd); the dfield lookup is join-shaped so Spark broadcasts the
(at most 2048x2048-row) table and keeps the probe side shuffle-free.
Scalar constants are folded in Python so the SQL oracle sees identical
literals.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _flit(v: float) -> str:
    return repr(float(v))


# ---------------------------------------------------------------------------
# ToF wavefront corrections (applyECorrection)
# ---------------------------------------------------------------------------

def _r2(x: Column, y: Column, xc: float, yc: float) -> Column:
    return (x - F.lit(xc)) * (x - F.lit(xc)) + (y - F.lit(yc)) * (y - F.lit(yc))


def _r2_sql(x: str, y: str, xc: float, yc: float) -> str:
    return (
        f"(({x} - {_flit(xc)}) * ({x} - {_flit(xc)}) + "
        f"({y} - {_flit(yc)}) * ({y} - {_flit(yc)}))"
    )


def tof_correction_expr(
    profile: str,
    t: str | Column = "t",
    x: str | Column = "X",
    y: str | Column = "Y",
    center: tuple[float, float] = (650.0, 650.0),
    amplitude: float = -1.0,
    **kwds,
) -> Column:
    """Corrected ToF column ``t + f(X, Y)`` for one of the four radial
    profiles of ``applyECorrection``
    (``/root/reference/mpes/fprocessing.py:2286-2343``). ``center`` is
    (row, column) = (ycenter, xcenter), matching the reference."""
    tcol, xcol, ycol = _c(t), _c(x), _c(y)
    yc, xc = float(center[0]), float(center[1])
    amp = float(amplitude)

    if profile == "spherical":
        d = float(kwds.get("d", 0.9))
        t0 = float(kwds.get("t0", 0.06))
        inv_d2 = 1.0 / (d * d)
        corr = (F.sqrt(F.lit(1.0) + _r2(xcol, ycol, xc, yc) * F.lit(inv_d2)) - F.lit(1.0)) * F.lit(t0 * amp)
    elif profile == "lorentzian":
        gam = float(kwds.get("gamma", 300.0))
        pref = amp / (gam * math.pi) * gam * gam
        corr = F.lit(pref) / (_r2(xcol, ycol, xc, yc) + F.lit(gam * gam))
    elif profile == "gaussian":
        sig = float(kwds.get("sigma", 300.0))
        pref = amp / math.sqrt(2.0 * math.pi * sig * sig)
        corr = F.lit(pref) * F.exp(-_r2(xcol, ycol, xc, yc) / F.lit(2.0 * sig * sig))
    elif profile == "lorentzian_asymmetric":
        gam = float(kwds.get("gamma", 300.0))
        gam2 = float(kwds.get("gamma2", 300.0))
        amp2 = float(kwds.get("amplitude2", -1.0))
        pref = amp / (gam * math.pi) * gam * gam
        pref2 = amp2 / (gam2 * math.pi) * gam2 * gam2
        dy = (ycol - F.lit(yc)) * (ycol - F.lit(yc))
        dx = (xcol - F.lit(xc)) * (xcol - F.lit(xc))
        corr = F.lit(pref) / (dy + F.lit(gam * gam)) + F.lit(pref2) / (dx + F.lit(gam2 * gam2))
    else:
        raise NotImplementedError(f"unknown ToF correction profile {profile!r}")
    return tcol + corr


def tof_correction_sql(
    profile: str,
    t: str = "t",
    x: str = "X",
    y: str = "Y",
    center: tuple[float, float] = (650.0, 650.0),
    amplitude: float = -1.0,
    **kwds,
) -> str:
    """Oracle twin of :func:`tof_correction_expr`."""
    yc, xc = float(center[0]), float(center[1])
    amp = float(amplitude)
    r2 = _r2_sql(x, y, xc, yc)

    if profile == "spherical":
        d = float(kwds.get("d", 0.9))
        t0 = float(kwds.get("t0", 0.06))
        inv_d2 = 1.0 / (d * d)
        corr = f"((sqrt(1.0 + {r2} * {_flit(inv_d2)}) - 1.0) * {_flit(t0 * amp)})"
    elif profile == "lorentzian":
        gam = float(kwds.get("gamma", 300.0))
        pref = amp / (gam * math.pi) * gam * gam
        corr = f"({_flit(pref)} / ({r2} + {_flit(gam * gam)}))"
    elif profile == "gaussian":
        sig = float(kwds.get("sigma", 300.0))
        pref = amp / math.sqrt(2.0 * math.pi * sig * sig)
        corr = f"({_flit(pref)} * exp(-{r2} / {_flit(2.0 * sig * sig)}))"
    elif profile == "lorentzian_asymmetric":
        gam = float(kwds.get("gamma", 300.0))
        gam2 = float(kwds.get("gamma2", 300.0))
        amp2 = float(kwds.get("amplitude2", -1.0))
        pref = amp / (gam * math.pi) * gam * gam
        pref2 = amp2 / (gam2 * math.pi) * gam2 * gam2
        dy = f"(({y} - {_flit(yc)}) * ({y} - {_flit(yc)}))"
        dx = f"(({x} - {_flit(xc)}) * ({x} - {_flit(xc)}))"
        corr = (
            f"({_flit(pref)} / ({dy} + {_flit(gam * gam)}) + "
            f"{_flit(pref2)} / ({dx} + {_flit(gam2 * gam2)}))"
        )
    else:
        raise NotImplementedError(f"unknown ToF correction profile {profile!r}")
    return f"({t} + {corr})"


# ---------------------------------------------------------------------------
# Homography (perspective transform)
# ---------------------------------------------------------------------------

def perspective_expr(
    x: str | Column, y: str | Column, M: Sequence[Sequence[float]]
) -> tuple[Column, Column]:
    """Projective transform ``(x, y) -> ((M00 x + M01 y + M02)/den, ...)``
    with ``den = M20 x + M21 y + M22`` (``perspectiveTransform``,
    ``/root/reference/mpes/base.py:650-668``)."""
    M = np.asarray(M, dtype=float)
    xcol, ycol = _c(x), _c(y)
    den = F.lit(M[2, 0]) * xcol + F.lit(M[2, 1]) * ycol + F.lit(M[2, 2])
    xt = (F.lit(M[0, 0]) * xcol + F.lit(M[0, 1]) * ycol + F.lit(M[0, 2])) / den
    yt = (F.lit(M[1, 0]) * xcol + F.lit(M[1, 1]) * ycol + F.lit(M[1, 2])) / den
    return xt, yt


def perspective_sql(x: str, y: str, M: Sequence[Sequence[float]]) -> tuple[str, str]:
    M = np.asarray(M, dtype=float)
    den = f"({_flit(M[2,0])} * {x} + {_flit(M[2,1])} * {y} + {_flit(M[2,2])})"
    xt = f"(({_flit(M[0,0])} * {x} + {_flit(M[0,1])} * {y} + {_flit(M[0,2])}) / {den})"
    yt = f"(({_flit(M[1,0])} * {x} + {_flit(M[1,1])} * {y} + {_flit(M[1,2])}) / {den})"
    return xt, yt


# ---------------------------------------------------------------------------
# Thin-plate-spline warp as column arithmetic
# ---------------------------------------------------------------------------

def tps_expr(
    x: str | Column,
    y: str | Column,
    coeffs: np.ndarray,
    points: np.ndarray,
    which: int = 0,
) -> Column:
    """Evaluate a fitted TPS warp for one output coordinate as pure
    column math: ``a1 + ax*x + ay*y + sum_i w_i * U(r_i)`` with
    ``U(r) = r^2 * ln(r)`` (Bookstein; ``_calculate_f`` /
    ``_U_dask``, ``/root/reference/mpes/dask_tps.py:26-53``). ``coeffs``
    is the (n+3, 2) solution of :func:`mpes_spark.calibrate.tps.tps_coeffs`;
    ``which`` selects the output column (0=row, 1=col).

    The r -> 0 kernel limit (U(0) = 0) is realized branch-free as
    ``0.5 * r2 * ln(r2 + 5e-324)``: at r2 = 0 the product is exactly
    0.0 (finite log times zero), and the denormal offset is far below
    double noise for any physical r2. Branch-free matters: the WHEN
    form doubled the expression tree and, multiplied across bin
    filters, pushed whole-stage codegen past its compile budget."""
    xcol, ycol = _c(x), _c(y)
    co = np.asarray(coeffs, dtype=float)[:, which]
    w, (a1, ax, ay) = co[:-3], co[-3:]
    expr: Column = F.lit(float(a1)) + F.lit(float(ax)) * xcol + F.lit(float(ay)) * ycol
    for wi, (px, py) in zip(w, np.asarray(points, dtype=float)):
        r2 = _r2(xcol, ycol, float(px), float(py))
        u = F.lit(0.5) * r2 * F.log(r2 + F.lit(5e-324))
        expr = expr + F.lit(float(wi)) * u
    return expr


def tps_sql(
    x: str, y: str, coeffs: np.ndarray, points: np.ndarray, which: int = 0
) -> str:
    co = np.asarray(coeffs, dtype=float)[:, which]
    w, (a1, ax, ay) = co[:-3], co[-3:]
    terms = [f"{_flit(a1)} + {_flit(ax)} * {x} + {_flit(ay)} * {y}"]
    for wi, (px, py) in zip(w, np.asarray(points, dtype=float)):
        r2 = _r2_sql(x, y, float(px), float(py))
        u = f"(0.5 * {r2} * ln({r2} + 5e-324))"
        terms.append(f"{_flit(wi)} * {u}")
    return "(" + " + ".join(terms) + ")"


# ---------------------------------------------------------------------------
# Inverse deformation-field lookup (dfieldapply)
# ---------------------------------------------------------------------------

def dfield_table(spark: SparkSession, dfield: np.ndarray) -> DataFrame:
    """Flatten a (2, H, W) inverse deformation field into a lookup
    relation ``(xi, yi, newX, newY)`` suitable for a broadcast join —
    the join-shaped re-expression of ``dfieldapply``
    (``/root/reference/mpes/base.py:530-539``). NaN boundary cells (cf.
    ``generateDfield``, ``/root/reference/mpes/base.py:570-572``) are
    kept; downstream filters drop them."""
    _, h, wdt = dfield.shape
    xi, yi = np.meshgrid(np.arange(h), np.arange(wdt), indexing="ij")
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "xi": xi.ravel().astype("int32"),
            "yi": yi.ravel().astype("int32"),
            "newX": dfield[0].ravel().astype("float64"),
            "newY": dfield[1].ravel().astype("float64"),
        }
    )
    return spark.createDataFrame(pdf)


# Broadcast budget for the dfield lookup relation: full detector
# resolution (2048 x 2048) flattens to 4.19e6 rows x 24 B
# (int32 xi, int32 yi, float64 newX, float64 newY) = 96 MiB raw
# columnar. The JVM HashedRelation roughly doubles that in executor
# memory — still well under a 4 GiB executor, and constant in event
# count, so the broadcast is safe at any corpus scale. Asserted at
# full resolution in tests/test_dfield_production.py.
DFIELD_BROADCAST_BUDGET_BYTES = 160 * 2**20


def dfield_broadcast_bytes(shape: tuple[int, int]) -> int:
    """Raw columnar size estimate of ``dfield_table`` for an (H, W)
    field: rows x (4 + 4 + 8 + 8) bytes."""
    h, w = shape
    return h * w * 24


def apply_dfield_join(
    df: DataFrame,
    lookup: DataFrame,
    x: str = "X",
    y: str = "Y",
    new_x: str = "Xm",
    new_y: str = "Ym",
) -> DataFrame:
    """Per-event inverse-deformation lookup via broadcast-hash join on
    the truncated integer pixel index (int16 cast in the reference,
    ``/root/reference/mpes/base.py:538``). The lookup table is at most
    2048^2 rows (96 MiB raw, see ``DFIELD_BROADCAST_BUDGET_BYTES``) —
    always broadcastable; the event side stays shuffle-free."""
    keyed = df.withColumn("_xi", F.col(x).cast("int")).withColumn(
        "_yi", F.col(y).cast("int")
    )
    out = keyed.join(
        F.broadcast(lookup),
        (F.col("_xi") == F.col("xi")) & (F.col("_yi") == F.col("yi")),
        "left",
    )
    return (
        out.withColumn(new_x, F.col("newX"))
        .withColumn(new_y, F.col("newY"))
        .drop("_xi", "_yi", "xi", "yi", "newX", "newY")
    )


def apply_dfield_udf(
    df: DataFrame,
    dfield: np.ndarray,
    x: str = "X",
    y: str = "Y",
    new_x: str = "Xm",
    new_y: str = "Ym",
) -> DataFrame:
    """Alternative dfield application: broadcast the ndarray and gather
    per-batch with an Arrow pandas UDF — avoids materializing the
    lookup relation when the field is dense and the join columns are
    not needed downstream.

    Out-of-range events get NaN — identical to the join path's NULL and
    the reference's NaN boundary cells (``generateDfield``,
    /root/reference/mpes/base.py:570-572) — so ``how='udf'`` and
    ``how='join'`` agree row-for-row."""
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(dfield, dtype="float64"))

    @F.pandas_udf("struct<nx: double, ny: double>")
    def _lookup(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        fld = bc.value
        xi = xs.to_numpy(dtype="int64")
        yi = ys.to_numpy(dtype="int64")
        ok = (
            (xi >= 0) & (xi < fld.shape[1]) & (yi >= 0) & (yi < fld.shape[2])
        )
        nx = np.full(len(xi), np.nan)
        ny = np.full(len(xi), np.nan)
        nx[ok] = fld[0, xi[ok], yi[ok]]
        ny[ok] = fld[1, xi[ok], yi[ok]]
        return pd.DataFrame({"nx": nx, "ny": ny})

    out = df.withColumn("_m", _lookup(F.col(x), F.col(y)))
    return (
        out.withColumn(new_x, F.col("_m.nx"))
        .withColumn(new_y, F.col("_m.ny"))
        .drop("_m")
    )
