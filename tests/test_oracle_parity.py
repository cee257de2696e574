"""Local replica of the driver's correctness gate: run every
registered Spark query at sf0.01 and compare against its DuckDB
oracle — row count, schema width, and order-insensitive values
(columns sorted by name, rows sorted by all columns, exact equality
after canonicalization)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].astype("float64")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert list(_canon(got).columns) == list(_canon(want).columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if not _values_equal(a, b)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


def _query_names():
    import __spark_entry__ as ent

    return sorted(ent.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as ent

    q = ent.queries()[name]
    got = q(spark, SF_ORACLE).toPandas()
    sql = ent.oracle_sql().get(name)
    if sql is None:
        assert len(got) >= 0  # rows-only: must run and be well-formed
        assert len(got.columns) > 0
        return
    want = duck.execute(sql).df()
    _compare(name, got, want)


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2
