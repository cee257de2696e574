"""frequent_items (MG two-pass exact heavy hitters) and the time-rollup
cascade — exactness vs naive plans, MG unit properties, plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mpes_spark.extras.frequent import frequent_items, mg_summary
from mpes_spark.transforms.rollup import coarsen, finalize_rollup, time_rollup


def test_mg_summary_caps_size_and_preserves_heavy():
    rng = np.random.default_rng(3)
    # zipf-ish stream: item 0 is ~30% of mass
    items = rng.zipf(1.5, 20_000) % 500
    counts: dict = {}
    k = 50
    for chunk in np.array_split(items, 40):
        vals, cs = np.unique(chunk, return_counts=True)
        for v, c in zip(vals, cs):
            counts[int(v)] = counts.get(int(v), 0) + int(c)
        counts = mg_summary(counts, k)
    assert len(counts) <= k
    true_top = pd.Series(items).value_counts()
    # every item above n/(k+1) must survive
    for item, freq in true_top.items():
        if freq > len(items) / (k + 1):
            assert item in counts


@pytest.mark.parametrize("n_part", [1, 7])
def test_frequent_items_exact_vs_naive(spark, n_part):
    rng = np.random.default_rng(5)
    toks = [f"w{z}" for z in rng.zipf(1.3, 30_000) % 2000]
    df = spark.createDataFrame(pd.DataFrame({"tok": toks})).repartition(n_part)
    got = {
        (r["tok"], r["freq"])
        for r in frequent_items(df, "tok", min_frac=0.005, k=400).collect()
    }
    n = len(toks)
    naive = {
        (r["tok"], r["freq"])
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .filter(F.col("freq") >= 0.005 * n)
        .collect()
    }
    assert got == naive and len(naive) > 0


def test_frequent_items_rejects_unsafe_k(spark):
    df = spark.createDataFrame(pd.DataFrame({"tok": ["a", "b"]}))
    with pytest.raises(ValueError):
        frequent_items(df, "tok", min_frac=0.001, k=100)  # 1/(k+1) > min_frac


def test_frequent_items_exact_pass_broadcasts_candidates(spark):
    df = spark.createDataFrame(pd.DataFrame({"tok": ["a"] * 50 + ["b"] * 50}))
    plan = (
        frequent_items(df, "tok", min_frac=0.1, k=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # candidates never shuffle the corpus


@pytest.fixture(scope="module")
def ts_events(spark):
    rng = np.random.default_rng(9)
    n = 5_000
    base = 1_700_000_000_000_000_000  # epoch ns
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": base + rng.integers(0, 86_400_000_000_000, n),
                "value": rng.uniform(0, 100, n).round(3),
            }
        )
    )


def test_cascade_equals_direct(spark, ts_events):
    hour_ns = 3_600_000_000_000
    minutes = time_rollup(ts_events, measure="value", bucket_ns=60_000_000_000)
    # compare the raw mergeable stats (pre-rounding): the cascade must
    # agree with the direct rollup to float-summation noise
    via_cascade = coarsen(minutes, 60).orderBy("bucket").collect()
    direct = (
        time_rollup(ts_events, measure="value", bucket_ns=hour_ns)
        .orderBy("bucket")
        .collect()
    )
    assert len(via_cascade) == len(direct) > 0
    for a, b in zip(via_cascade, direct):
        assert a["bucket"] == b["bucket"] and a["cnt"] == b["cnt"]
        assert a["min_m"] == b["min_m"] and a["max_m"] == b["max_m"]
        assert abs(a["sum_m"] - b["sum_m"]) < 1e-7 * max(1.0, abs(b["sum_m"]))


def test_cascade_composes(spark, ts_events):
    minutes = time_rollup(ts_events, measure="value", bucket_ns=60_000_000_000)
    days = coarsen(coarsen(minutes, 60), 24)
    direct = time_rollup(ts_events, measure="value", bucket_ns=86_400_000_000_000)
    got = {(r["bucket"], r["cnt"]) for r in days.collect()}
    want = {(r["bucket"], r["cnt"]) for r in direct.collect()}
    assert got == want


def test_coarsen_rejects_non_rollup(spark, ts_events):
    with pytest.raises(ValueError):
        coarsen(ts_events, 60)


def test_dsir_ranks_target_like_docs_higher(spark):
    """Docs written in the target slice's vocabulary must outscore
    docs in the out-of-domain vocabulary, regardless of their own
    slice label — the importance weight tracks content, not metadata."""
    import pandas as pd

    from mpes_spark.extras.curation import dsir_weights

    tgt_text = "alpha beta gamma delta " * 10
    src_text = "uno dos tres cuatro " * 10
    rows = (
        [(i, tgt_text.strip(), "en") for i in range(10)]
        + [(100 + i, src_text.strip(), "de") for i in range(10)]
        # held-out docs, one per vocabulary, both labeled out-of-target
        + [(500, tgt_text.strip(), "de"), (501, src_text.strip(), "de")]
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    w = {r["doc_id"]: r["weight"] for r in dsir_weights(df).collect()}
    assert w[500] > w[501]  # target-vocabulary doc wins
    assert w[0] > w[101]
