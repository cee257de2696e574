"""Semantic tests for analysis/graph.py and extras/sketches.py —
the oracle parity tests prove cross-engine equality; these prove the
MATH is right (numpy power-iteration reference, sketch error bounds,
mass conservation, dangling handling)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mpes_spark.analysis.graph import pagerank
from tests.conftest import SF_ORACLE


def _pagerank_numpy(edges, iters, damping):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_reference(spark):
    # a small graph WITH a dangling node (d has no out-edges)
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=5, damping=0.85).collect()
    }
    want = _pagerank_numpy(edges, iters=5, damping=0.85)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_mass_conserved_and_normalized(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = [r["rank"] for r in pagerank(df, iters=4).collect()]
    assert sum(ranks) == pytest.approx(1.0, abs=1e-12)
    norm = [r["rank_norm"] for r in pagerank(df, iters=4, normalize=True).collect()]
    assert np.mean(norm) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_checkpoint_path_equivalent(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iters=6).collect()}
    ckpt = {
        r["node"]: r["rank"]
        for r in pagerank(df, iters=6, checkpoint_every=2).collect()
    }
    for k in plain:
        assert ckpt[k] == pytest.approx(plain[k], abs=1e-12)


def test_cms_one_sided_error_all_tokens(spark):
    """CMS estimates are >= exact for EVERY token (not just top-k):
    run the estimate with topk covering the whole vocab."""
    from mpes_spark.extras.sketches import cms_topk_estimate_sql

    sql = cms_topk_estimate_sql(
        f"parquet.`{SF_ORACLE}/documents.parquet`",
        "spark",
        width=16,
        topk=10_000,
    )
    rows = spark.sql(sql).collect()
    assert rows, "empty estimate"
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)
    # width 16 on a 31-token vocab must collide somewhere
    assert any(r["cms_est"] > r["exact_cnt"] for r in rows)


def test_hll_estimate_within_bound(spark):
    """HLL standard error is 1.04/sqrt(m); assert 5 sigma at m=256
    (~6.5%) against the exact distinct count."""
    from mpes_spark.extras.sketches import hll_estimate_sql

    sql = hll_estimate_sql(
        f"parquet.`{SF_ORACLE}/events.parquet`", "user_id", "spark"
    )
    row = spark.sql(sql).collect()[0]
    assert row["m"] == 256
    exact = row["exact_distinct"]
    err = abs(row["est_distinct"] - exact) / exact
    assert err < 5 * 1.04 / np.sqrt(256)


def test_hll_register_layout_deterministic(spark):
    """Same input twice -> identical estimate (pure column math, no
    sampling, no session state)."""
    from mpes_spark.extras.sketches import hll_estimate_sql

    sql = hll_estimate_sql(
        f"parquet.`{SF_ORACLE}/events.parquet`", "user_id", "spark"
    )
    a = spark.sql(sql).collect()[0]
    b = spark.sql(sql).collect()[0]
    assert a == b
