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
