"""Storage-level bucketing: the amortize-the-shuffle-once seam.

At 100 TB the dominant cost of every user-keyed join/aggregation is
the exchange. Hive-style bucketed tables (``bucketBy`` + saveAsTable)
pay that shuffle ONCE at write time; every subsequent equi-join or
aggregation on the bucket key between co-bucketed tables (same key,
same bucket count) runs with ZERO Exchange — Catalyst recognizes the
output partitioning from the table metadata. ``sortBy`` additionally
removes the per-task Sort under sort-merge joins.

The plan contract is asserted in tests/test_bucketed.py: a join of two
co-bucketed tables contains no Exchange node and equals the plain-join
result row for row.

Sizing guidance (SCALING.md): pick n_buckets ≈ target parallelism at
the biggest consumer (cluster cores, or 2x), NOT file-size-driven —
each bucket is one file per writing task; too few buckets caps join
parallelism, too many makes small files. Bucket counts must match (or
divide) across tables meant to co-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) on ``bucket_cols`` — the one-time shuffle that makes every
    later key-equi-join/agg between co-bucketed tables exchange-free."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides along from the
    catalog — a plain ``spark.table``; the helper exists so call sites
    document intent)."""
    return spark.table(table)
