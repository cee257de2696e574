"""Bucketed-table plan contract: co-bucketed tables join with ZERO
Exchange and match the plain join exactly; a non-bucketed join of the
same data shuffles both sides (the control that proves the assertion
has teeth)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mpes_spark.io.bucketed import read_bucketed, write_bucketed
from mpes_spark.registry import t
from tests.conftest import SF_SMALL


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange", plan))


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucketdb_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_cobucketed_join_is_exchange_free(spark, bucket_db):
    ev = t(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    orders = t(spark, SF_SMALL, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_totalprice"
    )
    write_bucketed(ev, f"{bucket_db}.ev_b", ["user_id"], 8, sort_cols=["user_id"])
    write_bucketed(
        orders, f"{bucket_db}.ord_b", ["user_id"], 8, sort_cols=["user_id"]
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_bucketed(spark, f"{bucket_db}.ev_b")
        b = read_bucketed(spark, f"{bucket_db}.ord_b")
        joined = a.join(b, "user_id").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        # the whole join+agg pipeline: ZERO shuffles (bucket metadata
        # satisfies the join AND the aggregation's required
        # distribution); AQE final stage may add a coalesce-only read
        assert _exchanges(joined) == 0, "co-bucketed join must not shuffle"

        # control: the identical join on the raw parquet shuffles
        plain = ev.join(orders, "user_id").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("s"),
        )
        assert _exchanges(plain) >= 2, "control join should exchange both sides"

        # and the results are identical
        got = sorted(map(tuple, joined.collect()))
        want = sorted(map(tuple, plain.collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_skips_exchange(spark, bucket_db):
    ev = t(spark, SF_SMALL, "events").select("user_id", "value")
    write_bucketed(ev, f"{bucket_db}.ev_agg", ["user_id"], 8)
    agg = (
        read_bucketed(spark, f"{bucket_db}.ev_agg")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _exchanges(agg) == 0, "bucket-keyed aggregation must not shuffle"
    want = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, want.collect()))


def test_morton_tile_layout_prunes_partitions(spark, tmp_path):
    """The z-order layout claim, MEASURED: events written
    partitioned-by-z-tile, then a rectangular (value, user) window
    expressed as its covering tile set scans only those partitions —
    the plan carries PartitionFilters and the partition count read is
    a small fraction of the total."""
    import re

    from pyspark.sql import functions as F

    from mpes_spark.registry import t
    from mpes_spark.transforms.columns import morton_key_expr
    from tests.conftest import SF_SMALL

    ev = t(spark, SF_SMALL, "events").filter(
        (F.col("value") >= 0) & (F.col("value") < 1024)
    )
    x = F.floor(F.col("value") / 8.0).cast("bigint")
    y = F.col("user_id") % 64
    z = morton_key_expr([x, y], bits=7)
    out = str(tmp_path / "ztiles")
    ev.withColumn("tile", F.floor(z / 64).cast("bigint")).write.partitionBy(
        "tile"
    ).parquet(out)

    laid = spark.read.parquet(out)
    n_tiles = laid.select("tile").distinct().count()
    assert n_tiles > 10  # the layout is genuinely spread

    # rectangle x in [0,8), y in [0,8) -> covering tiles computed
    # exactly from the key function
    def z_ref(xx, yy, bits=7):
        o = 0
        for b in range(bits):
            o |= ((xx >> b) & 1) << (2 * b) | ((yy >> b) & 1) << (2 * b + 1)
        return o

    tiles = sorted({z_ref(xx, yy) // 64 for xx in range(8) for yy in range(8)})
    got = laid.filter(F.col("tile").isin(tiles))
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "no partition filter pushed"
    # correctness: the tile scan is a superset of the true rectangle,
    # and restricting it equals filtering the raw table
    rect = (F.floor(F.col("value") / 8.0) < 8) & (F.col("user_id") % 64 < 8)
    want = ev.filter(rect).count()
    assert got.filter(rect).count() == want
    # and it genuinely pruned: way fewer partitions than the total
    assert len(tiles) < n_tiles / 2
