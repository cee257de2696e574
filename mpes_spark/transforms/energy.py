"""Energy-axis calibration transforms: time-of-flight -> energy.

Column-expression factories parameterized by fitted calibration
coefficients — the Spark analog of the reference's ``MapParser``
partial-function pattern (``/root/reference/mpes/base.py:280-286``).
Each factory has a ``*_sql`` twin emitting the identical arithmetic so
the DuckDB oracle performs the same IEEE-754 double operations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: electron rest mass / 2 in eV * s^2/m^2 as used by the reference
#: (``tof2ev``, /root/reference/mpes/base.py:435-458)
_ME_HALF = 2.84281e-12


def _flit(v: float) -> str:
    return repr(float(v))


def tof2ev_poly_expr(a: Sequence[float], E0: float, t: str | Column = "t") -> Column:
    """Polynomial ToF->energy: ``E = sum_{d=1..n} a_d * t^d + E0``
    with ``a`` given highest-order first (``tof2evpoly``,
    ``/root/reference/mpes/base.py:406-432``). Evaluated as a Horner
    chain — pure column arithmetic, no UDF."""
    x = F.col(t) if isinstance(t, str) else t
    # Horner: E = ((...(a_n)*t + a_{n-1})*t + ... + a_1)*t + E0
    expr: Column = F.lit(float(a[0]))
    for c in list(a)[1:]:
        expr = expr * x + F.lit(float(c))
    return expr * x + F.lit(float(E0))


def tof2ev_poly_sql(a: Sequence[float], E0: float, t_sql: str = "t") -> str:
    expr = _flit(a[0])
    for c in list(a)[1:]:
        expr = f"(({expr}) * {t_sql} + {_flit(c)})"
    return f"(({expr}) * {t_sql} + {_flit(E0)})"


def tof2ev_expr(
    d: float,
    t0: float,
    E0: float,
    t: str | Column = "t",
    binwidth: float = 4.125e-12,
    binning: int = 1,
) -> Column:
    """Drift-distance ToF->energy: ``E = m_e/2 * (d / (t*binwidth*2^binning
    - t0))^2 + E0`` (``tof2ev``, ``/root/reference/mpes/base.py:435-458``).
    The square is written as a self-product so Spark and the SQL oracle
    execute the same multiply (no libm pow).

    Division is NULL-safe (``try_divide``): a time exactly at ``t0``
    yields NULL, which the bin-range filter then drops — mirroring the
    reference's numpy ``inf`` falling out of the histogram range
    (``/root/reference/mpes/base.py:435-458``). Under Spark 4 ANSI mode
    a raw ``/`` would instead abort the whole job on the first zero
    denominator (observed at sf0.1)."""
    x = F.col(t) if isinstance(t, str) else t
    scale = float(binwidth) * float(2**binning)
    q = F.try_divide(F.lit(float(d)), x * F.lit(scale) - F.lit(float(t0)))
    return F.lit(_ME_HALF) * q * q + F.lit(float(E0))


def tof2ev_sql(
    d: float,
    t0: float,
    E0: float,
    t_sql: str = "t",
    binwidth: float = 4.125e-12,
    binning: int = 1,
) -> str:
    scale = float(binwidth) * float(2**binning)
    # NULLIF mirrors Spark's try_divide: zero denominator -> NULL row,
    # dropped by the bin-range filter on both engines.
    q = f"({_flit(d)} / NULLIF({t_sql} * {_flit(scale)} - {_flit(t0)}, 0.0))"
    return f"({_flit(_ME_HALF)} * {q} * {q} + {_flit(E0)})"
