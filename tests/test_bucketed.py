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
