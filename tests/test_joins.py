"""asof_join / range_join_binned — semantics vs pandas.merge_asof and a
naive cross-join reference, plus physical-plan shape assertions."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mpes_spark.transforms.joins import asof_join, range_join_binned


@pytest.fixture(scope="module")
def asof_data(spark):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "key": rng.integers(0, 8, n_l),
            "ts": rng.integers(0, 10_000, n_l).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "key": rng.integers(0, 8, n_r),
            "ts": rng.integers(0, 10_000, n_r).astype("int64"),
            "val": rng.integers(0, 1_000, n_r).astype("int64"),
        }
    )
    # deterministic: one right row per (key, ts)
    right = right.groupby(["key", "ts"], as_index=False).agg(val=("val", "max"))
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    return (
        pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable"),
            on="ts",
            by="key",
            direction=direction,
            **kw,
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tolerance", [None, 500])
def test_asof_matches_merge_asof(spark, asof_data, direction, tolerance):
    left, right = asof_data
    lf = spark.createDataFrame(left)
    rf = spark.createDataFrame(right)
    got = (
        asof_join(
            lf, rf, on="key", direction=direction, tolerance=tolerance
        )
        .orderBy("lid")
        .toPandas()
    )
    exp = _pandas_asof(left, right, direction, tolerance)
    assert got["lid"].tolist() == exp["lid"].tolist()
    pd.testing.assert_series_equal(
        got["val"].astype("float"), exp["val"].astype("float"), check_names=False
    )


def test_asof_exact_tie_is_inclusive(spark):
    lf = spark.createDataFrame(pd.DataFrame({"key": [1], "ts": [100]}))
    rf = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1], "ts": [100, 90], "val": [7, 3]})
    )
    for direction in ("backward", "forward", "nearest"):
        row = asof_join(lf, rf, on="key", direction=direction).collect()[0]
        assert row["val"] == 7 and row["matched_ts"] == 100


def test_asof_unmatched_keeps_left_row(spark):
    lf = spark.createDataFrame(pd.DataFrame({"key": [1, 2], "ts": [100, 100]}))
    rf = spark.createDataFrame(pd.DataFrame({"key": [1], "ts": [150], "val": [5]}))
    out = {
        r["key"]: r for r in asof_join(lf, rf, on="key", direction="backward").collect()
    }
    assert len(out) == 2
    assert out[1]["val"] is None and out[2]["val"] is None


def test_asof_plan_is_one_shuffle_no_join(spark, asof_data):
    left, right = asof_data
    j = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="key"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join operator
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.fixture(scope="module")
def range_data(spark):
    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {"pid": np.arange(500), "x": rng.uniform(-10, 110, 500).round(3)}
    )
    # overlapping, boundary-aligned, and degenerate (empty) intervals
    iv = pd.DataFrame(
        {
            "iid": np.arange(40),
            "s": np.concatenate(
                [np.arange(0, 100, 5.0), np.arange(0, 100, 5.0) + 2.5]
            )[:40],
            "e": np.concatenate(
                [np.arange(0, 100, 5.0) + 7.5, np.arange(0, 100, 5.0) + 2.5]
            )[:40],
        }
    )
    return pts, iv


@pytest.mark.parametrize("bin_width", [1.0, 5.0, 40.0])
def test_range_join_matches_naive(spark, range_data, bin_width):
    pts, iv = range_data
    pf, ivf = spark.createDataFrame(pts), spark.createDataFrame(iv)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join_binned(
            pf, ivf, point="x", start="s", end="e", bin_width=bin_width
        ).collect()
    )
    exp = sorted(
        (r["pid"], r["iid"])
        for r in pf.crossJoin(ivf)
        .filter((F.col("x") >= F.col("s")) & (F.col("x") < F.col("e")))
        .collect()
    )
    assert got == exp and len(got) > 0


def test_range_join_no_nested_loop_when_broadcast_disabled(spark, range_data):
    pts, iv = range_data
    s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    j = range_join_binned(
        s.createDataFrame(pts),
        s.createDataFrame(iv),
        point="x",
        start="s",
        end="e",
        bin_width=5.0,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_range_join_rejects_bad_width(spark, range_data):
    pts, iv = range_data
    with pytest.raises(ValueError):
        range_join_binned(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            point="x",
            start="s",
            end="e",
            bin_width=0.0,
        )


def test_overlap_join_binned_matches_bruteforce_no_dups(spark):
    """Random intervals: the binned overlap join must equal the
    brute-force inequality join exactly — including multiplicity
    (the canonical-bin rule emits each pair once, no distinct)."""
    import random

    from mpes_spark.transforms.joins import overlap_join_binned

    rnd = random.Random(11)
    left = [(i, rnd.uniform(0, 100), 0.0) for i in range(60)]
    left = [(i, s, s + rnd.uniform(0.1, 25)) for i, s, _ in left]
    right = [(j, rnd.uniform(0, 100), 0.0) for j in range(60)]
    right = [(j, s, s + rnd.uniform(0.1, 25)) for j, s, _ in right]
    ldf = spark.createDataFrame(left, ["lid", "ls", "le"])
    rdf = spark.createDataFrame(right, ["rid", "rs", "re"])
    got = sorted(
        (r.lid, r.rid)
        for r in overlap_join_binned(
            ldf, rdf, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bin_width=7.0,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, ls, le in left
        for j, rs, re in right
        if ls < re and rs < le
    )
    assert got == want and len(want) > 100


def test_overlap_join_binned_no_nested_loop(spark):
    from mpes_spark.transforms.joins import overlap_join_binned

    ldf = spark.range(50).select(
        F.col("id").alias("lid"),
        (F.col("id") * 2.0).alias("ls"),
        (F.col("id") * 2.0 + 3.0).alias("le"),
    )
    rdf = spark.range(50).select(
        F.col("id").alias("rid"),
        (F.col("id") * 1.7).alias("rs"),
        (F.col("id") * 1.7 + 2.0).alias("re"),
    )
    df = overlap_join_binned(
        ldf, rdf, left_start="ls", left_end="le",
        right_start="rs", right_end="re", bin_width=4.0,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
