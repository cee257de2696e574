"""Salted two-phase aggregation: exact equivalence with the plain
aggregation for every supported merge function."""

from __future__ import annotations

from pyspark.sql import functions as F

from mpes_spark.registry import t
from mpes_spark.transforms.columns import salted_agg
from tests.conftest import SF_SMALL


def test_salted_agg_matches_plain(spark):
    ev = t(spark, SF_SMALL, "events")
    got = salted_agg(
        ev, ["event_type"], {"value": "min", "user_id": "max", "event_id": "count"},
        salt_buckets=8,
    )
    want = ev.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("user_id").alias("max_user_id"),
        F.count("event_id").alias("count_event_id"),
    )
    g = {r.event_type: (r.min_value, r.max_user_id, r.count_event_id) for r in got.collect()}
    w = {r.event_type: (r.min_value, r.max_user_id, r.count_event_id) for r in want.collect()}
    assert g == w


def test_salted_agg_spreads_partials(spark):
    """The salt really spreads a key: phase-1 produces more than one
    partial row per group."""
    ev = t(spark, SF_SMALL, "events")
    salted = ev.withColumn("_salt", (F.rand(42) * 8).cast("int"))
    per_key = (
        salted.groupBy("event_type", "_salt")
        .count()
        .groupBy("event_type")
        .count()
        .collect()
    )
    assert all(r["count"] > 1 for r in per_key)


def test_aqe_skew_join_activates_on_hot_key(spark):
    """The 100 TB skew story leans on AQE's skew-join split
    (SCALING.md); this asserts it actually FIRES: a join where one key
    carries ~95% of the rows, with test-scale skew thresholds, must
    show skew-handled partitions in the final adaptive plan
    ('skew=true' marker) and still produce exact results."""
    import re

    from pyspark.sql import functions as F

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        # hot key 0 carries 200k rows with a fat payload; 50 cold keys
        fact = spark.range(210_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise(F.pmod(F.col("id"), F.lit(50)) + 1)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(51).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        # global aggregate on top: a groupBy on the join key would
        # FORBID the skew split (it requires the join's hash
        # partitioning) — that interaction is exactly worth pinning
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )
        row = joined.collect()[0]
        # AQE rewrites the plan during execution; inspect the FINAL plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"skew=true", plan), (
            "AQE skew-join did not activate:\n" + plan[:2000]
        )
        # 200k hot rows at v=0 + 200 rows per cold key k at v=10k
        assert row.n == 200_000 + 200 * 50
        assert row.s == sum(200 * 10 * k for k in range(1, 51))
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
