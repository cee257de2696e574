"""Tests for FileCollection set ops, metadata gathering, dynamics
matrix, and sorted-array lookups."""

from __future__ import annotations

import numpy as np
import pytest

from mpes_spark.analysis.dynamics import (
    binarysearch,
    build_dynamic_matrix,
    searchinterp,
)
from mpes_spark.io.metadata import gather_metadata, resolve_aperture, resolve_lens_mode
from mpes_spark.io.readers import FileCollection
from mpes_spark.registry import t
from tests.conftest import SF_SMALL


def test_file_collection_ops(tmp_path):
    names = ["scan_2.parquet", "scan_10.parquet", "scan_1.parquet", "other_1.parquet"]
    for n in names:
        (tmp_path / n).write_bytes(b"")
    fc = FileCollection.gather(str(tmp_path))
    # natural sort: scan_1, scan_2, scan_10 (not lexicographic)
    basenames = [f.split("/")[-1] for f in fc.filter("scan").files]
    assert basenames == ["scan_1.parquet", "scan_2.parquet", "scan_10.parquet"]
    a = fc.filter("scan")
    b = fc.filter("other")
    assert len(a + b) == 4
    assert len((a + b) - b) == 3
    assert len(a.select([0, 2])) == 2
    assert len(a.select([0], update="remove")) == 2


def test_file_collection_read(spark):
    fc = FileCollection([f"{SF_SMALL}/events.parquet"])
    df = fc.read(spark, with_file=True)
    assert df.count() > 0 and "file" in df.columns
    with pytest.raises(ValueError):
        FileCollection([]).read(spark)


def test_gather_metadata(spark):
    ev = t(spark, SF_SMALL, "events")
    md = gather_metadata(
        ev,
        aperture_value=120.0,
        aperture_intervals=[(0.0, 50.0, "S"), (50.0, 200.0, "M"), (200.0, 400.0, "L")],
        lens_voltages=np.array([100.0, 200.4]),
        lens_mode_table={"modeA": np.array([100.0, 200.0]), "modeB": np.array([50.0, 60.0])},
    )
    assert md["timing"]["n_events"] == ev.count()
    assert md["timing"]["elapsed_s"] > 0
    assert sum(md["counts_by_type"].values()) == ev.count()
    assert md["instrument"]["aperture"] == "M"
    assert md["instrument"]["lens_mode"] == "modeA"  # within 0.5% rtol


def test_resolve_helpers():
    assert resolve_aperture(400.0, [(0.0, 100.0, "S")]) is None
    assert resolve_lens_mode(np.array([1.0]), {"m": np.array([1.01])}, rtol=0.005) is None


def test_build_dynamic_matrix():
    fp = np.array([[1.0, 10.0], [1.5, 10.0], [2.0, 0.0]])
    dyn = build_dynamic_matrix(fp, baseline_index=0)
    assert dyn.shape == (3, 3, 2)
    np.testing.assert_allclose(dyn[0], fp)
    np.testing.assert_allclose(dyn[1][1], [0.5, 0.0])
    np.testing.assert_allclose(dyn[2][1], [0.5, 0.0])


def test_hll_within_tolerance(spark):
    from mpes_spark.registry import all_queries

    qs = all_queries()
    approx = {
        r.event_type: r.n_users_approx
        for r in qs["hll_distinct_users"](spark, SF_SMALL).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in qs["distinct_users"](spark, SF_SMALL).collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.05 * exact[k])


def test_sorted_lookups():
    arr = np.array([0.0, 1.0, 4.0, 9.0])
    assert binarysearch(arr, 4.0) == 2
    assert binarysearch(arr, 3.9) == 1
    assert binarysearch(arr, -1.0) == -1
    assert searchinterp(arr, 2.5) == pytest.approx(1.5)
    assert searchinterp(arr, 100.0) == 3.0


def test_time_queries_are_timezone_independent(spark):
    """Every time-arithmetic query must return identical rows under a
    non-UTC session timezone: the driver's correctness harness owns its
    own SparkSession and this library cannot assume UTC. Asia/Kolkata
    (+05:30) also catches half-hour shifts a whole-hour zone would
    miss."""
    from mpes_spark.registry import all_queries
    from tests.conftest import SF_SMALL

    shifted = spark.newSession()
    shifted.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    qs = all_queries()
    for name in (
        "orders_before_cutoff",
        "asof_join_value",
        "rollup_cascade_1h",
        "tumbling_window_rate",
        "session_scan_segments",
        "count_rate",
    ):
        utc = sorted(map(tuple, qs[name](spark, SF_SMALL).collect()))
        kol = sorted(map(tuple, qs[name](shifted, SF_SMALL).collect()))
        assert utc == kol, f"{name} shifts under a non-UTC session timezone"


def test_funnel_window_excludes_late_steps(spark, tmp_path):
    """The 24 h per-step window is enforced: a click 25 h after the
    first view does not advance the funnel, a click 1 h after does,
    and a purchase BEFORE its click never counts (order matters)."""
    from mpes_spark.registry import all_queries

    h = 3_600_000_000_000  # 1 h in ns
    rows = [
        # user 1: view -> click(+1h) -> purchase(+2h): completes
        (1, 1 * h, 1, "view"), (2, 2 * h, 1, "click"), (3, 3 * h, 1, "purchase"),
        # user 2: view -> click(+25h): click outside the window
        (4, 1 * h, 2, "view"), (5, 26 * h, 2, "click"),
        # user 3: purchase BEFORE click: purchase must not count
        (6, 1 * h, 3, "view"), (7, 2 * h, 3, "click"), (8, 1 * h, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        [(e, ts, u, k, 1.0, "{}") for e, ts, u, k in rows],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r["step"]: r["users"]
        for r in all_queries()["funnel_conversion"](spark, str(tmp_path)).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_offsets(spark, tmp_path):
    """Cohort cells: a user active in weeks {w, w+2} lands in offsets
    0 and 2 of cohort w; a later-joining user forms its own cohort."""
    from mpes_spark.registry import all_queries

    wk = 604_800_000_000_000
    rows = [
        (1, 0 * wk + 5, 1), (2, 2 * wk + 5, 1),   # cohort 0, offsets {0, 2}
        (3, 1 * wk + 5, 2), (4, 1 * wk + 9, 2),   # cohort 1, offset {0}
    ]
    df = spark.createDataFrame(
        [(e, ts, u, "view", 1.0, "{}") for e, ts, u in rows],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in all_queries()["cohort_retention"](spark, str(tmp_path)).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_event_transitions_counts_planted_path(spark, tmp_path):
    """view->click->purchase for one user yields exactly the two
    transitions in order; a second user's single event yields none;
    equal-ts events order by event_id."""
    from mpes_spark.registry import all_queries

    rows = [
        (1, 100, 1, "view"), (2, 200, 1, "click"), (3, 300, 1, "purchase"),
        (4, 100, 2, "view"),
        (5, 500, 3, "view"), (6, 500, 3, "click"),  # tie -> event_id order
    ]
    df = spark.createDataFrame(
        [(e, ts, u, k, 1.0, "{}") for e, ts, u, k in rows],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r.from_type, r.to_type): r.cnt
        for r in all_queries()["event_transitions"](spark, str(tmp_path)).collect()
    }
    assert got == {("view", "click"): 2, ("click", "purchase"): 1}


def test_rfm_quartiles_order_users(spark, tmp_path):
    """With 4 users of strictly increasing frequency, f_q is exactly
    their frequency order; monetary counts only purchase values."""
    from mpes_spark.registry import all_queries

    rows = []
    eid = 0
    for u in range(1, 5):
        for j in range(u):  # user u has u events
            eid += 1
            rows.append((eid, 100 * eid, u, "purchase", float(10 * u), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r.user_id: r
        for r in all_queries()["rfm_segments"](spark, str(tmp_path)).collect()
    }
    assert [out[u].f_q for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[3].monetary == 90.0  # 3 purchases x 30
    assert out[4].r_q == 4  # latest activity


def test_twap_weights_by_holding_time(spark, tmp_path):
    """value 10 held for 9 s then value 100 held for 1 s -> TWAP 19
    (a plain avg would say 55); the final observation has no interval
    and carries no weight."""
    from mpes_spark.registry import all_queries

    s = 1_000_000_000
    rows = [
        (1, 0 * s, 1, "view", 10.0),
        (2, 9 * s, 1, "view", 100.0),
        (3, 10 * s, 1, "view", 999.0),  # last point: weightless
    ]
    df = spark.createDataFrame(
        [(e, ts, u, k, v, "{}") for e, ts, u, k, v in rows],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = all_queries()["time_weighted_avg"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["twap"] == 19.0 and out[0]["n_intervals"] == 2


def test_table_checksum_order_insensitive_and_sensitive_to_rows(spark):
    from mpes_spark.dq import table_checksum

    rows = [(1, "a", 10.25), (2, "b", -3.5), (3, "c", 0.0)]
    df1 = spark.createDataFrame(rows, ["id", "name", "bal"])
    df2 = spark.createDataFrame(list(reversed(rows)), ["id", "name", "bal"])
    c1 = table_checksum(df1, "t", ["id", "name", "bal"], ["bal"]).collect()[0]
    c2 = table_checksum(df2, "t", ["id", "name", "bal"], ["bal"]).collect()[0]
    assert (c1.n_rows, c1.checksum) == (c2.n_rows, c2.checksum)
    # one cent of corruption flips the digest
    bad = spark.createDataFrame(
        [(1, "a", 10.26), (2, "b", -3.5), (3, "c", 0.0)], ["id", "name", "bal"]
    )
    c3 = table_checksum(bad, "t", ["id", "name", "bal"], ["bal"]).collect()[0]
    assert c3.checksum != c1.checksum
    # a duplicated row XORs itself away -- the row count catches it
    dup = spark.createDataFrame(rows + [rows[0], rows[0]], ["id", "name", "bal"])
    c4 = table_checksum(dup, "t", ["id", "name", "bal"], ["bal"]).collect()[0]
    assert c4.checksum == c1.checksum and c4.n_rows != c1.n_rows


def test_exact_quantile_matches_numpy(spark):
    import numpy as np

    from mpes_spark.diagnostics import exact_quantile

    rs = np.random.RandomState(3)
    vals = np.concatenate([
        rs.normal(50, 10, 4000),
        rs.uniform(0, 1, 1000),      # heavy low cluster
        np.full(500, 42.0),          # duplicate spike
    ])
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    s = np.sort(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        k = int((len(vals) - 1) * q)
        got = exact_quantile(df, "x", q, nbins=64, passes=2)
        assert got == s[k], (q, got, s[k])


def test_exact_quantile_duplicate_heavy_cell(spark):
    from mpes_spark.diagnostics import exact_quantile

    # 90% of the column is one value: the median's cell never narrows,
    # but the ordered tail take still answers exactly
    rows = [(7.5,)] * 900 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, ["x"])
    assert exact_quantile(df, "x", 0.5, nbins=16, passes=2) == 7.5


def test_exact_quantile_duplicate_stall_single_value_fallback(spark):
    """A cell whose survivors exceed tail_limit but are ALL one value
    returns that value (narrowing stalled, but the cell IS the
    answer) instead of raising; >1 distinct value still raises."""
    import pytest

    from mpes_spark.diagnostics import exact_quantile

    rows = [(7.5,)] * 900 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, ["x"])
    assert exact_quantile(df, "x", 0.5, nbins=16, passes=2, tail_limit=10) == 7.5
    with pytest.raises(ValueError, match="distinct"):
        # q=0.93 lands in the 90..99 spread with a 5-row budget and
        # one pass over 2 bins: the surviving cell holds many
        # distinct values, so no single-value fallback applies
        exact_quantile(df, "x", 0.97, nbins=2, passes=1, tail_limit=5)


def test_exact_quantile_cell_edge_values(spark):
    """Values sitting exactly ON histogram cell edges (the ulp-
    disagreement zone between floor-binning and recomputed range
    bounds): the re-filter now uses the binning expression itself, so
    every rank stays exact."""
    import numpy as np

    from mpes_spark.diagnostics import exact_quantile

    # span [0, 16) with nbins=16 -> every integer is a cell edge
    vals = [float(v) for v in range(17)] * 3
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    s = np.sort(vals)
    for q in (0.0, 0.2, 0.33, 0.5, 0.77, 1.0):
        k = int((len(vals) - 1) * q)
        assert exact_quantile(df, "x", q, nbins=16, passes=2) == s[k], q


def test_kmeans_rejects_degenerate_params(spark):
    import pytest

    from mpes_spark.extras.cluster import kmeans_fixed, kmeans_fixed_sql

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="iters"):
        kmeans_fixed(df, k=2, iters=0)
    with pytest.raises(ValueError, match="k must"):
        kmeans_fixed(df, k=0, iters=1)
    with pytest.raises(ValueError, match="iters"):
        kmeans_fixed_sql("embeddings", k=2, iters=0)
    with pytest.raises(ValueError, match="k must"):
        kmeans_fixed_sql("embeddings", k=0, iters=1)


def test_diff_feed_roundtrip_and_semantics(spark):
    """apply_diff_feed(old, table_diff_feed(old, new)) == new, and
    the feed rows carry the right ops including NULL transitions."""
    from mpes_spark.transforms.cdc import apply_diff_feed, table_diff_feed

    old = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 3.5), (4, 4.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 2.0), (3, 3.5), (4, None), (5, 5.0)], "k long, v double"
    )
    feed = table_diff_feed(old, new, key="k", compare=["v"]).collect()
    ops = {r.k: r.op for r in feed}
    assert ops == {1: "delete", 2: "update", 4: "update", 5: "insert"}
    assert 3 not in ops  # unchanged never enters the feed
    applied = apply_diff_feed(
        old, table_diff_feed(old, new, key="k", compare=["v"]),
        key="k", compare=["v"],
    )
    got = sorted((r.k, r.v) for r in applied.collect())
    want = sorted((r.k, r.v) for r in new.collect())
    assert got == want


def test_partition_digest_diff_localizes_divergence(spark):
    """Merkle-bucket diff semantics: identical tables produce an
    empty diff; a single modified row surfaces exactly one bucket
    with equal counts but differing checksums; a deleted row
    surfaces exactly one bucket with n_a = n_b + 1."""
    from mpes_spark.dq import digest_diff, partition_digests

    rows = [(i, f"u{i % 7}", float(i) + 0.25) for i in range(500)]
    schema = "k long, name string, amount double"
    a = spark.createDataFrame(rows, schema)
    cols = (["k", "name", "amount"], ["amount"])

    da = partition_digests(a, "k", *cols, nbuckets=16)
    assert digest_diff(da, partition_digests(a, "k", *cols, nbuckets=16)).collect() == []

    modified = [(k, n, amt if k != 123 else amt + 0.01) for k, n, amt in rows]
    dm = partition_digests(
        spark.createDataFrame(modified, schema), "k", *cols, nbuckets=16
    )
    d = digest_diff(da, dm).collect()
    assert len(d) == 1 and d[0]["n_a"] == d[0]["n_b"]
    assert d[0]["checksum_a"] != d[0]["checksum_b"]

    deleted = [r for r in rows if r[0] != 321]
    dd = partition_digests(
        spark.createDataFrame(deleted, schema), "k", *cols, nbuckets=16
    )
    d2 = digest_diff(da, dd).collect()
    assert len(d2) == 1 and d2[0]["n_a"] == d2[0]["n_b"] + 1


def test_join_delta_multiset_exact(spark):
    """The delta rule's output is the exact multiset difference of
    the full new join over the full old join — verified on data that
    exercises all four quadrants (old⋈old excluded, old⋈Δ, Δ⋈old,
    Δ⋈Δ, plus duplicate keys on both sides)."""
    from collections import Counter

    from mpes_spark.transforms.cdc import join_delta

    l_old = spark.createDataFrame(
        [(1, "lo1"), (1, "lo2"), (2, "lo3"), (9, "lo4")], "k long, lv string"
    )
    l_new = spark.createDataFrame(
        [(1, "ld1"), (3, "ld2"), (2, "ld3")], "k long, lv string"
    )
    r_old = spark.createDataFrame(
        [(1, "ro1"), (2, "ro2"), (2, "ro3"), (8, "ro4")], "k long, rv string"
    )
    r_new = spark.createDataFrame(
        [(2, "rd1"), (3, "rd2"), (1, "rd3")], "k long, rv string"
    )
    got = Counter(
        (r["k"], r["lv"], r["rv"])
        for r in join_delta(l_old, l_new, r_old, r_new, on="k").collect()
    )
    full_new = Counter(
        (r["k"], r["lv"], r["rv"])
        for r in l_old.unionByName(l_new)
        .join(r_old.unionByName(r_new), "k")
        .collect()
    )
    full_old = Counter(
        (r["k"], r["lv"], r["rv"]) for r in l_old.join(r_old, "k").collect()
    )
    assert got == full_new - full_old
    assert sum(got.values()) > 0


def test_join_delta_signed_round_trip_mixed_churn(spark):
    """Signed-count join IVM under MIXED churn: derive each side's
    D/U/I feed with table_diff_feed, lift to ±1 multiplicity rows,
    run the three-term signed delta rule, and apply it to the old
    join view — the maintained view must equal the full recompute of
    the new join EXACTLY (per-row net multiplicities), with every
    churn kind present on both sides and churn kinds interacting
    (an updated-left key joining an updated-right key, a delete
    joining an insert)."""
    from collections import Counter

    from mpes_spark.transforms.cdc import (
        feed_to_signed_delta,
        join_delta_signed,
        table_diff_feed,
    )

    # left keyed by k: key 1 updated, key 2 deleted, key 3 inserted,
    # key 4 unchanged, key 9 deleted (matches a right insert)
    l_old = spark.createDataFrame(
        [(1, "P"), (2, "Q"), (4, "S"), (9, "T")], "k long, lv string"
    )
    l_new = spark.createDataFrame(
        [(1, "P2"), (3, "R"), (4, "S")], "k long, lv string"
    )
    # right keyed by rk, join column k non-unique: key 1 updated (the
    # update-update interaction), one key-2 row deleted, key-3 and
    # key-9 rows inserted, one key-4 row updated, one unchanged
    r_old = spark.createDataFrame(
        [(10, 1, 100), (20, 2, 200), (21, 2, 210), (40, 4, 400),
         (41, 4, 410)],
        "rk long, k long, c long",
    )
    r_new = spark.createDataFrame(
        [(10, 1, 150), (21, 2, 210), (30, 3, 300), (40, 4, 444),
         (41, 4, 410), (90, 9, 900)],
        "rk long, k long, c long",
    )
    dl = feed_to_signed_delta(
        table_diff_feed(l_old, l_new, "k", ["lv"]), "k", ["lv"]
    )
    dr = feed_to_signed_delta(
        table_diff_feed(r_old, r_new, "rk", ["k", "c"]), "rk", ["k", "c"]
    )
    delta = join_delta_signed(l_old, dl, r_old, dr, on="k")
    net: Counter = Counter()
    for r in delta.collect():
        net[(r["k"], r["lv"], r["rk"], r["c"])] += r["m"]
    view_old = Counter(
        (r["k"], r["lv"], r["rk"], r["c"])
        for r in l_old.join(r_old, "k").collect()
    )
    view_new = Counter(
        (r["k"], r["lv"], r["rk"], r["c"])
        for r in l_new.join(r_new, "k").collect()
    )
    maintained = view_old.copy()
    maintained.update(net)  # Counter-add signed multiplicities
    assert {k: v for k, v in maintained.items() if v} == dict(view_new)
    # the delta really exercised retraction: negative net rows exist
    assert any(v < 0 for v in net.values())
    # and insert-joins-insert (delta x delta) rows exist: key 3
    assert any(k == 3 and v > 0 for (k, _, _, _), v in net.items())


def test_mad_hand_computed(spark):
    """MAD on a hand-built group with one wild outlier: the median
    and MAD must ignore it (robustness), where stddev would not."""
    from __spark_entry__ import queries
    import pyspark.sql.functions as F

    rows = [("a", 1, float(v)) for v, _ in zip([10, 12, 14, 16, 18, 1_000_000], range(6))]
    df = spark.createDataFrame(
        [(t, i, v) for i, (t, _, v) in enumerate(rows)],
        "event_type string, event_id long, value double",
    )
    med = df.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("m")
    )
    out = (
        df.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("m"), 6).alias("median_value"),
            F.round(F.expr("percentile(abs(value - m), 0.5D)"), 6).alias("mad"),
        )
        .collect()[0]
    )
    # values sorted: 10 12 14 16 18 1e6 -> median 15, |dev| sorted:
    # 1 1 3 3 5 999985 -> mad 3
    assert out["median_value"] == 15.0
    assert out["mad"] == 3.0


def test_equidepth_property(spark):
    """Equi-depth means equal depth: within each group the bucket
    row-counts differ by at most 1, buckets tile the value range in
    order (lo of bucket k+1 >= hi of bucket k), and counts sum to
    the group total."""
    from __spark_entry__ import queries

    rows = queries()["equidepth_hist"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["event_type"], []).append(r)
    assert by_group
    for g, rs in by_group.items():
        rs.sort(key=lambda r: r["bucket"])
        counts = [r["n_rows"] for r in rs]
        assert max(counts) - min(counts) <= 1, (g, counts)
        for a, b in zip(rs, rs[1:]):
            assert b["lo"] >= a["hi"] - 1e-9, (g, a, b)


def test_morton_key_matches_python_reference(spark):
    """Morton/Z-order key (r8): the Column expression must equal a
    bit-twiddling python reference, and aligned 2x2 blocks must occupy
    4 CONSECUTIVE z values (the locality property that makes z-sorted
    layout prune rectangular scans)."""
    import numpy as np
    from pyspark.sql import functions as F

    from mpes_spark.transforms.columns import morton_key_expr, morton_key_sql

    def z_ref(x, y, bits=7):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    rng = np.random.default_rng(0)
    pts = [(int(a), int(b)) for a, b in rng.integers(0, 128, size=(300, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", morton_key_expr(["x", "y"], bits=7).alias("z")).collect()
    }
    assert got == {(x, y): z_ref(x, y) for x, y in pts}
    # SQL twin renders the same values through spark.sql
    sql_z = {
        (r.x, r.y): r.z
        for r in spark.sql(
            f"SELECT x, y, {morton_key_sql(['x', 'y'], bits=7)} AS z "
            f"FROM {{df}}", df=df
        ).collect()
    }
    assert sql_z == got
    # 2x2 aligned block -> 4 consecutive z values
    for bx, by in [(0, 0), (2, 6), (124, 88)]:
        zs = sorted(z_ref(bx + dx, by + dy) for dx in (0, 1) for dy in (0, 1))
        assert zs == list(range(zs[0], zs[0] + 4)), (bx, by, zs)
    # 3-d variant round-trips against its own reference
    def z3_ref(x, y, w, bits=4):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (3 * b)
            out |= ((y >> b) & 1) << (3 * b + 1)
            out |= ((w >> b) & 1) << (3 * b + 2)
        return out

    p3 = [(int(a), int(b), int(c)) for a, b, c in rng.integers(0, 16, size=(60, 3))]
    d3 = spark.createDataFrame(p3, "x long, y long, w long")
    got3 = {
        (r.x, r.y, r.w): r.z
        for r in d3.select(
            "x", "y", "w", morton_key_expr(["x", "y", "w"], bits=4).alias("z")
        ).collect()
    }
    assert got3 == {(x, y, w): z3_ref(x, y, w) for x, y, w in p3}
