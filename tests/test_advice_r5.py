"""Regression tests for the round-5 ADVICE findings: keyed-rollup
merge safety, DQ NULL semantics, weighted-PageRank zero-weight mass
loss, oracle-SQL quote escaping, and the empty-profile salted-agg
guard."""

import pytest
from pyspark.sql import functions as F


# -- ADVICE #1 (medium): merge_rollups / coarsen must not silently
#    collapse keyed rollups when keys= is omitted -----------------------


def _keyed_rollup(spark):
    from mpes_spark.transforms.rollup import time_rollup

    rows = [
        (1_000_000_000 * t, k, float(v))
        for t, k, v in [
            (5, "a", 1.0),
            (65, "a", 2.0),
            (65, "b", 10.0),
            (125, "b", 20.0),
        ]
    ]
    df = spark.createDataFrame(rows, "ts long, k string, value double")
    return time_rollup(
        df, measure="value", bucket_ns=60 * 1_000_000_000, keys=["k"]
    )


def test_merge_rollups_infers_keys(spark):
    from mpes_spark.transforms.rollup import merge_rollups

    r = _keyed_rollup(spark)
    merged = merge_rollups(r, r)  # keys omitted -> inferred from schema
    assert "k" in merged.columns
    got = {(x["bucket"], x["k"]): (x["cnt"], x["sum_m"]) for x in merged.collect()}
    # doubling the same rollup doubles cnt/sum per (bucket, key) group
    assert got[(1, "a")] == (2, 4.0)
    assert got[(1, "b")] == (2, 20.0)


def test_merge_rollups_rejects_explicit_key_omission(spark):
    from mpes_spark.transforms.rollup import coarsen, merge_rollups

    r = _keyed_rollup(spark)
    with pytest.raises(ValueError, match="key-like columns"):
        merge_rollups(r, r, keys=[])
    with pytest.raises(ValueError, match="key-like columns"):
        coarsen(r, 60, keys=[])
    with pytest.raises(ValueError, match="not in rollup columns"):
        coarsen(r, 60, keys=["nope"])


def test_coarsen_infers_keys(spark):
    from mpes_spark.transforms.rollup import coarsen

    r = _keyed_rollup(spark)
    hours = coarsen(r, 60)
    got = {(x["bucket"], x["k"]): x["sum_m"] for x in hours.collect()}
    assert got == {(0, "a"): 3.0, (0, "b"): 30.0}


# -- ADVICE #2 (low): Unique must count NULL rows; NULL metric/passed
#    must read as failure ----------------------------------------------


def test_unique_counts_null_rows(spark):
    from mpes_spark.dq import Unique, check_constraints

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "id bigint"
    )
    row = check_constraints(df, [Unique("id")]).collect()[0]
    # 2 distinct over 4 rows: half the table is NULL -> not a PK
    assert row["metric"] == 0.5
    assert row["passed"] == 0


def test_all_null_and_empty_fail_not_pass(spark):
    from mpes_spark.dq import NotNull, Unique, check_constraints

    all_null = spark.createDataFrame([(None,), (None,)], "id bigint")
    rep = {
        r["check_name"]: r["passed"]
        for r in check_constraints(all_null, [Unique("id"), NotNull("id")]).collect()
    }
    assert rep == {"unique_id": 0, "notnull_id": 0}

    empty = spark.createDataFrame([], "id bigint")
    for r in check_constraints(empty, [Unique("id"), NotNull("id")]).collect():
        assert r["passed"] == 0  # NULL metric coalesces to failure


def test_unique_oracle_twin_matches(spark, duck):
    """Spark and DuckDB agree on the new count(*) denominator,
    NULL-heavy input included."""
    import pandas as pd

    from mpes_spark.dq import NotNull, Unique, check_constraints, dq_report_sql

    pdf = pd.DataFrame({"id": pd.array([1, 2, 2, None], dtype="Int64")})
    sdf = spark.createDataFrame([(1,), (2,), (2,), (None,)], "id bigint")
    checks = [Unique("id"), NotNull("id")]
    got = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in check_constraints(sdf, checks).collect()
    }
    duck.register("advice_dq_t", pdf)
    want = {
        name: (metric, passed)
        for name, metric, passed in duck.execute(
            dq_report_sql("advice_dq_t", checks)
        ).fetchall()
    }
    duck.unregister("advice_dq_t")
    assert got == want


# -- ADVICE #3 (low): weighted PageRank with zero-weight sources --------


def test_weighted_pagerank_zero_weight_source_is_dangling(spark):
    """A source whose weights sum to 0 must be treated as dangling —
    no NULL-divide mass loss; ranks still sum to 1."""
    from mpes_spark.analysis.graph import pagerank

    edges = [
        ("a", "b", 0.0),  # a's only out-edge has zero weight
        ("b", "c", 1.0),
        ("c", "b", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=6, weight="w").collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    assert all(v > 0 for v in got.values())
    # a must rank exactly like a node with NO out-edges: same graph with
    # the zero edge replaced by a never-taken self-loop of weight 0 is
    # not expressible, so compare against an explicit dangling node 'a'
    # (edge list without a's out-edge, but with 'a' kept in the node set
    # via a zero-weight in-edge it already has none of — instead assert
    # the structural consequence: b and c, who never receive from a's
    # out-edge, split all non-teleport mass).
    assert got["b"] > got["a"] and got["c"] > got["a"]


# -- ADVICE #4 (low): oracle-SQL string escaping ------------------------


def test_inset_sql_escapes_quotes(duck):
    import pandas as pd

    from mpes_spark.dq import InSet, dq_report_sql

    pdf = pd.DataFrame({"name": ["O'Brien", "O'Brien", "plain"]})
    duck.register("advice_q_t", pdf)
    sql = dq_report_sql(
        "advice_q_t", [InSet("name", ("O'Brien",), min_fraction=0.5)]
    )
    (name, metric, passed) = duck.execute(sql).fetchall()[0]
    duck.unregister("advice_q_t")
    assert name == "inset_name"
    assert metric == pytest.approx(2 / 3, abs=1e-6)
    assert passed == 1


def test_inset_spark_and_sql_agree_on_quoted_values(spark, duck):
    import pandas as pd

    from mpes_spark.dq import InSet, check_constraints, dq_report_sql

    pdf = pd.DataFrame({"name": ["O'Brien", "x", None]})
    sdf = spark.createDataFrame(pdf, "name string")
    checks = [InSet("name", ("O'Brien", "it's"), min_fraction=0.4)]
    got = check_constraints(sdf, checks).collect()[0]
    duck.register("advice_q2_t", pdf)
    want = duck.execute(dq_report_sql("advice_q2_t", checks)).fetchall()[0]
    duck.unregister("advice_q2_t")
    assert (got["check_name"], got["metric"], got["passed"]) == want


# -- ADVICE #5 (low): auto_salted_agg on empty / all-NULL-key input -----


def test_auto_salted_agg_empty_input(spark):
    from mpes_spark.diagnostics import auto_salted_agg

    empty = spark.createDataFrame([], "k string, v double")
    out, decision = auto_salted_agg(empty, ["k"], {"v": "sum"})
    assert decision["salt_buckets"] == 1
    assert out.count() == 0

    all_null = spark.createDataFrame([(None, 1.0), (None, 2.0)], "k string, v double")
    out2, decision2 = auto_salted_agg(all_null, ["k"], {"v": "sum"})
    assert decision2["salt_buckets"] == 1
    rows = out2.collect()
    assert len(rows) == 1 and rows[0]["sum_v"] == 3.0


# -- VERDICT r4 #5: sampled-threshold perplexity bucketing ---------------


def test_perplexity_sampled_vs_exact_disagreement(spark):
    """Per-doc bucket assignments from the production sampled-threshold
    path must agree with the exact ntile rendering for all but a
    boundary sliver (<= 1% of docs)."""
    from pyspark.sql import Window

    from mpes_spark.extras.search import (
        lm_perplexity_per_doc,
        perplexity_bucket_assignments,
        perplexity_buckets,
        perplexity_buckets_sampled,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    per = lm_perplexity_per_doc(docs, 0.5, "text", "doc_id", keep=("lang",))
    w = Window.partitionBy("lang").orderBy(
        F.round(F.col("ppl"), 6), F.col("doc_id")
    )
    exact = per.withColumn("bucket_e", F.ntile(3).over(w)).select(
        "doc_id", "bucket_e"
    )
    sampled = perplexity_bucket_assignments(docs, nbuckets=3).select(
        "doc_id", F.col("bucket").alias("bucket_s")
    )
    joined = exact.join(sampled, "doc_id")
    total = joined.count()
    assert total > 0
    disagree = joined.filter(F.col("bucket_e") != F.col("bucket_s")).count()
    assert disagree / total <= 0.01, f"{disagree}/{total} docs moved bucket"

    # aggregate rendering: same schema as the exact form, full coverage
    agg = perplexity_buckets_sampled(docs, nbuckets=3)
    assert agg.columns == perplexity_buckets(docs, nbuckets=3).columns
    assert agg.agg(F.sum("n_docs")).collect()[0][0] == total


def test_perplexity_sampled_no_sort_in_plan(spark):
    """The production path must not contain a per-language sort: no
    Sort/Window over the full per-doc relation, thresholds broadcast."""
    from mpes_spark.extras.search import perplexity_buckets_sampled
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    df = perplexity_buckets_sampled(docs, nbuckets=3)
    df.collect()  # materialize so AQE settles the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the exact rendering runs ntile over a Window; the production
    # path must have NO window operator (and no per-lang sort feeding
    # one) — "ntile" itself can't be grepped, percentile_approx
    # contains it as a substring
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # thresholds join is broadcast


# -- r5 additions: PSI drift monitor -------------------------------------


def test_psi_drift_identical_and_shifted(spark):
    from mpes_spark.diagnostics import psi_drift

    a = spark.range(0, 2000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(0, 2000).select(((F.col("id") % 100) + 60).cast("double").alias("v"))
    # identical distributions: PSI ~ 0 (exactly 0 up to smoothing)
    same = psi_drift(a, a, "v", 0.0, 100.0, nbins=10)
    total_same = same.agg(F.sum("psi_term")).collect()[0][0]
    assert abs(total_same) < 1e-9
    # disjoint-ish shift: large PSI, and the out-of-range bin (-1)
    # appears for the shifted side
    diff = psi_drift(a, b, "v", 0.0, 100.0, nbins=10)
    rows = {r["bin"]: r for r in diff.collect()}
    total_diff = sum(r["psi_term"] for r in rows.values())
    assert total_diff > 0.25  # "action" threshold
    assert -1 in rows and rows[-1]["p_cur"] > rows[-1]["p_base"]
    with pytest.raises(ValueError, match="nbins"):
        psi_drift(a, b, "v", 5.0, 1.0)
