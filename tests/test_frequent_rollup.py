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


def test_rollup_floor_buckets_negative_ts(spark):
    """Pre-1970 (negative) epoch-nanos bucket with FLOOR semantics:
    truncating `div` would send -90s to minute -1 and let bucket 0
    absorb two bucket-widths (ADVICE r3)."""
    rows = [
        (-90_000_000_000, 1.0),
        (-30_000_000_000, 2.0),
        (30_000_000_000, 4.0),
        (90_000_000_000, 8.0),
    ]
    df = spark.createDataFrame(rows, "ts long, value double")
    minute = time_rollup(df, measure="value", bucket_ns=60_000_000_000)
    assert {r["bucket"]: r["cnt"] for r in minute.collect()} == {
        -2: 1,
        -1: 1,
        0: 1,
        1: 1,
    }
    # cascade == direct across the epoch, same floor rule at both levels
    direct = time_rollup(df, measure="value", bucket_ns=120_000_000_000)
    via = coarsen(minute, 2)
    want = {(-1, 2), (0, 2)}
    assert {(r["bucket"], r["cnt"]) for r in via.collect()} == want
    assert {(r["bucket"], r["cnt"]) for r in direct.collect()} == want


def test_frequent_items_non_string_column(spark):
    """The MG candidate pass must carry the input column's own type
    (ADVICE r3): a string-typed candidate set would equi-join back via
    implicit casts and can silently miss non-string items."""
    rng = np.random.default_rng(11)
    vals = [int(v) for v in rng.zipf(1.3, 20_000) % 1000]
    df = spark.createDataFrame(pd.DataFrame({"item": vals})).repartition(5)
    got = {
        (r["item"], r["freq"])
        for r in frequent_items(df, "item", min_frac=0.02).collect()
    }
    n = len(vals)
    naive = pd.Series(vals).value_counts()
    assert got == {
        (int(i), int(c)) for i, c in naive.items() if c >= 0.02 * n
    }
    assert all(isinstance(i, int) for i, _ in got)


def test_dsir_sql_twin_honors_custom_predicate(spark, duck):
    """The oracle twin must project whatever columns target_pred
    references (ADVICE r3): a predicate on `source` broke the old
    hardcoded-`lang` inner projection."""
    from tests.conftest import SF_ORACLE

    from mpes_spark.extras.curation import dsir_weights, dsir_weights_sql
    from mpes_spark.registry import t

    pred = "source = 'src3'"
    got = (
        dsir_weights(t(spark, SF_ORACLE, "documents"), target_pred=pred)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = (
        duck.execute(dsir_weights_sql("documents", target_pred=pred))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(got) == len(want) > 0
    assert (got["n_tokens"].to_numpy() == want["n_tokens"].to_numpy()).all()
    assert (got["weight"].to_numpy() == want["weight"].to_numpy()).all()


def test_value_runs_hand_computed(spark):
    """A A B B A -> three runs; NULL values form their own runs
    (NULL-safe comparison); per-group independence."""
    from mpes_spark.transforms.rollup import value_runs

    rows = [
        (1, 10, "A"), (1, 20, "A"), (1, 30, "B"), (1, 40, "B"), (1, 50, "A"),
        (2, 10, None), (2, 20, None), (2, 30, "C"),
    ]
    df = spark.createDataFrame(rows, "uid long, pos long, v string")
    out = sorted(
        (r["uid"], r["run_seq"], r["v"], r["run_start"], r["run_end"], r["n_events"])
        for r in value_runs(df, value="v", order=["pos"], group="uid").collect()
    )
    assert out == [
        (1, 1, "A", 10, 20, 2),
        (1, 2, "B", 30, 40, 2),
        (1, 3, "A", 50, 50, 1),
        (2, 1, None, 10, 20, 2),
        (2, 2, "C", 30, 30, 1),
    ]


def test_time_weighted_avg_hand_computed(spark):
    """Value 10 held for 30s then 100 for 10s: TWAP = (10*30 +
    100*10)/40 = 32.5 — a plain AVG of the three samples would say
    ~43.3 (base nanos; single-observation groups yield NULL)."""
    from mpes_spark.transforms.rollup import time_weighted_avg

    G = 1_000_000_000
    rows = [
        (1, 1, 0 * G, 10.0),
        (1, 2, 30 * G, 100.0),
        (1, 3, 40 * G, 7.0),   # last obs: no duration, no weight
        (2, 4, 5 * G, 99.0),   # singleton -> NULL twap
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts long, value double")
    out = {r["user_id"]: r for r in
           time_weighted_avg(df, ts="ts", value="value", group="user_id").collect()}
    assert out[1]["n_obs"] == 3 and out[1]["twap"] == 32.5
    assert out[2]["n_obs"] == 1 and out[2]["twap"] is None
