"""Opt-in full oracle parity at sf0.1 (the bench scale).

The driver's correctness gate runs at sf0.01; round 1 showed that
sf0.1 contains edge values sf0.01 lacks (value=0.0 -> the ANSI
divide-by-zero crash). This suite re-runs every oracled query against
DuckDB at sf0.1. Slow (~2 min) -> enabled with
``SPARK_GRAFT_FULL_PARITY=1``.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_PARITY"),
    reason="set SPARK_GRAFT_FULL_PARITY=1 for the slow sf0.1 parity sweep",
)


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    from tests.conftest import TABLES

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{SF_BENCH}/{tb}.parquet'")
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _names():
    import __spark_entry__ as ent

    return sorted(ent.oracle_sql().keys())


@pytest.mark.parametrize("name", _names())
def test_oracle_parity_at_bench_scale(spark, duck01, name):
    import __spark_entry__ as ent

    got = _canon(ent.queries()[name](spark, SF_BENCH).toPandas())
    want = _canon(duck01.execute(ent.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        for a, b in zip(got[c].tolist(), want[c].tolist()):
            if isinstance(a, float) and isinstance(b, float):
                assert (math.isnan(a) and math.isnan(b)) or a == b, f"{name}.{c}: {a!r} != {b!r}"
            else:
                assert a == b, f"{name}.{c}: {a!r} != {b!r}"
