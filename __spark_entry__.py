"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query definitions live in ``mpes_spark.registry``; this
module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_ROOT)

# Executor Python workers (pandas UDF / applyInPandas queries) must be
# able to import mpes_spark regardless of the harness's cwd or session
# builder — export before any SparkSession exists (workers inherit the
# driver env in local mode).
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        f"{_REPO_ROOT}{os.pathsep}{os.environ['PYTHONPATH']}"
        if os.environ.get("PYTHONPATH")
        else _REPO_ROOT
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    pipeline — range filter -> polynomial energy calibration ->
    1-D binned histogram (EP2, SURVEY §3) — as one fused Spark plan."""
    from mpes_spark.binning.spec import BinAxis
    from mpes_spark.pipeline import EventPipeline
    from mpes_spark.registry import t
    from mpes_spark.transforms.energy import tof2ev_poly_expr

    events = t(spark, "/root/testdata/sf0.001", "events")
    pipe = (
        EventPipeline(events)
        .filter_range("value", lb=10.0, ub=480.0)
        .with_column("E", tof2ev_poly_expr([2e-9, -1e-6, 0.05], 1.0, "value"))
    )
    return pipe.bin_sparse([BinAxis("E", nbins=200, lo=0.0, hi=30.0)])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mpes_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from mpes_spark.registry import all_oracles

    return all_oracles()
