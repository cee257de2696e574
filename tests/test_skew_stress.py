"""Adversarial-skew stress for the dedup stack (VERDICT r3 #8): a
template-spam corpus — a large block of (near-)identical documents —
is the case where LSH bucket sizes explode quadratically and a forced
pair-side broadcast would OOM at scale. The AQE-strategy verify join
(`verify_jaccard(broadcast_pairs=None)`) was built for exactly this;
here we run the full minhash_neardup_pairs -> connected_components
pipeline through it with the broadcast threshold lowered to the
at-scale regime (the half-million-row candidate relation must NOT be
broadcast) and assert completion, exact clique completeness on the
identical block, one transitive cluster, and bounded CC rounds.

Everything is deterministic (xxhash64, fixed corpus) — no flaky
randomness; the probabilistic LSH miss rate for the one-token
variants is ~1e-4 per band-set against each of 600 identical
partners, so the single-cluster outcome is fixed once and for all by
the hash family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mpes_spark.extras.dedup import (
    cluster_summary,
    connected_components,
    minhash_neardup_pairs,
)

N_IDENTICAL = 600
N_VARIANT = 400
N_CLEAN = 1000
_TEMPLATE = " ".join(f"tok{i}" for i in range(40))


def _spam_corpus(spark):
    rows = []
    toks = _TEMPLATE.split(" ")
    for i in range(N_IDENTICAL):
        rows.append((i, _TEMPLATE))
    for i in range(N_VARIANT):
        # one token swapped -> shingle Jaccard ~0.93 vs the template
        mut = list(toks)
        mut[i % 40] = f"spam{i}"
        rows.append((N_IDENTICAL + i, " ".join(mut)))
    for i in range(N_CLEAN):
        # disjoint vocabulary per doc: never a candidate
        base = 1_000_000 + i * 50
        rows.append(
            (N_IDENTICAL + N_VARIANT + i, " ".join(f"w{base + j}" for j in range(40)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_template_spam_survives_lsh_and_cc(spark):
    docs = _spam_corpus(spark).repartition(8)
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024))
    try:
        pairs = minhash_neardup_pairs(docs, threshold=0.5).persist()
        n_pairs = pairs.count()
        # identical block: signatures are equal, every band collides,
        # Jaccard is exactly 1 -> the full clique MUST come out
        ident = pairs.filter(
            (F.col("id_a") < N_IDENTICAL) & (F.col("id_b") < N_IDENTICAL)
        ).count()
        assert ident == N_IDENTICAL * (N_IDENTICAL - 1) // 2
        # clean docs (disjoint vocab) never pair with anything
        clean_lo = N_IDENTICAL + N_VARIANT
        assert pairs.filter(F.col("id_b") >= clean_lo).count() == 0
        assert n_pairs >= ident  # variants add edges on top

        # a clique is depth-1: min-label propagation must resolve the
        # whole spam block to cluster 0 within 2 rounds (1 propagate
        # + 1 converged-check), nowhere near the max_iter=25 ceiling
        # (driver_edge_limit=0 pins the DISTRIBUTED path under stress)
        cc = connected_components(pairs, max_iter=2, driver_edge_limit=0)
        summary = cluster_summary(cc).collect()
        assert len(summary) == 1
        assert summary[0]["cluster_id"] == 0
        assert summary[0]["n_docs"] == N_IDENTICAL + N_VARIANT
        pairs.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)


def test_chain_converges_by_pointer_jumping(spark):
    """The other CC extreme: a 64-deep chain (boilerplate that mutates
    gradually — consecutive docs near-dup, distant ones not). Pointer
    jumping must converge in O(log depth) rounds: depth 64 within 8
    iterations, NOT the 63 a plain propagation would need."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    cc = connected_components(edges, max_iter=8, driver_edge_limit=0)
    got = {r["doc_id"]: r["cluster_id"] for r in cc.collect()}
    assert got == {i: 0 for i in range(64)}
    # the small-graph driver tier must agree exactly
    tiny = connected_components(edges, max_iter=8)
    assert {r["doc_id"]: r["cluster_id"] for r in tiny.collect()} == got


# -- VERDICT r4 #7: skew-stress the GRAPH stack the way the above
#    stresses dedup: a power-law (hub-heavy) edge set through pagerank
#    and connected_components. The hub key is the skew case for the
#    per-iteration contribution shuffle (every one of its edges lands
#    in one groupBy(dst) partition pre-AQE) and for min-label
#    propagation; correctness invariants (mass conservation, known
#    component structure, bounded rounds) must hold regardless of how
#    the planner splits the hub. Deterministic construction, no
#    randomness. -----------------------------------------------------------

N_HUB_SPOKES = 60_000
N_CHAIN = 2_000


def _powerlaw_edges(spark):
    """One mega-hub (node 0) with 60k spokes — a degree ~30x the next
    tier — plus heavy-tail mid hubs (node i has ~60000/i spokes for
    i in 1..20, Zipf-ish) in the SAME component, and a disjoint
    2k-node chain that must remain a separate component."""
    hub = spark.range(1, N_HUB_SPOKES + 1).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    mids = []
    for i in range(1, 21):
        n = N_HUB_SPOKES // (30 * i)
        # mid hub i links into a slice of the hub's spokes -> connected
        mids.append(
            spark.range(1, n + 1).select(
                F.lit(i).cast("long").alias("src"),
                (F.col("id") % N_HUB_SPOKES + 1).alias("dst"),
            )
        )
    chain_base = 10_000_000
    chain = spark.range(chain_base, chain_base + N_CHAIN - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    out = hub
    for m in mids:
        out = out.unionByName(m)
    return out.unionByName(chain)


def test_powerlaw_pagerank_mass_and_hub_rank(spark):
    from mpes_spark.analysis.graph import pagerank

    edges = _powerlaw_edges(spark).repartition(8)
    ranks = pagerank(edges, iters=3, damping=0.85)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    # the mega-hub receives from nothing (it only emits), so node 0
    # sits at the teleport floor while spokes that ALSO receive from
    # mid hubs rank measurably above it — i.e. the skewed 60k-edge
    # fanout actually delivered mass (a hub fanout DISPERSES rank:
    # each spoke gets hub_rank/60000, so the gap is small-x, not
    # orders of magnitude).
    top = ranks.orderBy(F.desc("rank")).limit(1).collect()[0]
    floor = ranks.agg(F.min("rank")).collect()[0][0]
    assert top["node"] != 0
    assert top["rank"] > 2 * floor


def test_powerlaw_connected_components_two_tiers(spark):
    from mpes_spark.analysis.graph import connected_components

    edges = _powerlaw_edges(spark).repartition(8)
    for limit in (10_000_000, 0):  # driver union-find, then distributed
        comp = connected_components(edges, driver_edge_limit=limit)
        sizes = (
            comp.groupBy("component").count().orderBy("component").collect()
        )
        assert len(sizes) == 2, f"expected 2 components, got {len(sizes)}"
        star = {r["component"]: r["count"] for r in sizes}
        assert star[0] == N_HUB_SPOKES + 1  # hub + spokes (+ mid hubs, ids <= 20 are spokes too)
        assert star[10_000_000] == N_CHAIN


def test_decision_shapes_survive_hub_key_skew(spark):
    """Hub-customer skew through the semi-join + HAVING shapes: one
    customer owns 30% of all orders and one order carries 2000 lines.
    The Q4/Q18-shaped plans key their shuffles on orderkey (never on
    the skewed custkey before reduction), so results stay exact and
    no plan degenerates to a nested loop. AQE's skew-split handles
    the hot orderkey partition at scale; here we assert correctness
    under the same distribution plus the no-NLJ invariant."""
    import random

    from mpes_spark.decision import decision_queries  # noqa: F401

    rnd = random.Random(7)
    orders, lines = [], []
    # 3000 orders for 100 customers; customer 0 takes ~30%
    for ok in range(3000):
        ck = 0 if rnd.random() < 0.3 else rnd.randint(1, 99)
        orders.append((ok, ck, "P%d" % (ok % 5)))
    # order 0 is a monster: 2000 lines; others 1-4 lines
    for ok in range(3000):
        n = 2000 if ok == 0 else rnd.randint(1, 4)
        for ln in range(n):
            lines.append(
                (ok, rnd.randint(1, 50), float(rnd.randint(1, 50)),
                 "R" if rnd.random() < 0.25 else "N")
            )
    odf = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderpriority string"
    )
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_quantity double, "
        "l_returnflag string"
    )

    # Q4 shape: orders with a returned line, counted per priority
    r = ldf.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    semi = (
        odf.join(r, odf.o_orderkey == r.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r_.o_orderpriority: r_.n for r_ in semi.collect()}
    want = {}
    r_orders = {o for o, _s, _q, f in lines if f == "R"}
    for ok, _ck, pr in orders:
        if ok in r_orders:
            want[pr] = want.get(pr, 0) + 1
    assert got == want
    plan = semi._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # Q18 shape: qty-sum HAVING against the monster order
    big = (
        ldf.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300.0)
    )
    got_big = {r_.l_orderkey for r_ in big.collect()}
    sums = {}
    for ok, _s, q, _f in lines:
        sums[ok] = sums.get(ok, 0.0) + q
    assert got_big == {ok for ok, s in sums.items() if s > 300.0}
    assert 0 in got_big  # the monster order qualifies


def test_triangle_orientation_tames_celebrity_hub(spark):
    """Celebrity-hub graph through triangle_count (VERDICT r6 #6): one
    hub adjacent to every spoke, spokes in a ring. Un-oriented wedge
    enumeration at the hub is C(H, 2) ≈ 4.5M; degree-ordered
    orientation gives the hub OUT-degree 0 (every hub edge points
    spoke -> hub) so the wedge volume collapses to O(m). Both wedge
    volumes are MEASURED with the same (deg, id) orientation rule the
    operator uses, and the triangle counts are asserted exactly."""
    H = 3000
    hub = H  # highest id; spokes 0..H-1
    edges = [(hub, i) for i in range(H)]
    edges += [(i, (i + 1) % H) for i in range(H)]  # ring
    e = spark.createDataFrame(edges, "src long, dst long")

    from mpes_spark.analysis.graph import triangle_count

    got = {r["node"]: r["n_triangles"] for r in triangle_count(e).collect()}
    # ring is triangle-free; every triangle is hub-i-(i+1): H of them
    assert got[hub] == H
    assert all(got[i] == 2 for i in range(H))

    # measured wedge bound, same canonicalization + orientation rule
    canon = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    m = canon.count()
    naive_wedges = (
        deg.select(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
        ).collect()[0]["w"]
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ku = F.struct(F.col("deg_u").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("deg_v").alias("d"), F.col("v").alias("n"))
    outdeg = (
        canon.join(du, "u")
        .join(dv, "v")
        .select(F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("lo"))
        .groupBy("lo")
        .agg(F.count(F.lit(1)).alias("od"))
    )
    stats = outdeg.select(
        F.max("od").alias("mx"),
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w"),
    ).collect()[0]
    # un-oriented: the hub alone contributes C(3000, 2) = 4.4985M
    assert naive_wedges >= H * (H - 1) / 2
    # oriented: out-degree bounded by sqrt(2m) -- here the hub keeps
    # ZERO out-edges and spokes keep <= 3; wedge volume is O(m)
    assert stats["mx"] <= int((2 * m) ** 0.5)
    assert stats["w"] <= 3 * m  # measured: ~6k vs ~4.5M naive
    assert stats["w"] < naive_wedges / 500


def test_blocked_linkage_degenerate_block_guard(spark):
    """Degenerate block through blocked_best_match (VERDICT r6 #6):
    every canonical name shares pass A's block key (first char), so
    pass A alone is the quadratic blowup; max_block drops it before
    the join and pass B (4-char suffix) still recovers every match.
    Candidate volumes are MEASURED with the same pass construction
    the operator uses."""
    from mpes_spark.extras.linkage import blocked_best_match

    N_CANON, N_MENT = 5000, 500
    canon = [(i, "x%06dq%03d" % (i, i % 997)) for i in range(N_CANON)]
    # every 10th entity mentioned with one char corrupted at pos 2
    mentions = [
        (i, nm[:2] + "z" + nm[3:]) for i, nm in canon if i % 10 == 0
    ]
    cdf = spark.createDataFrame(canon, "canon_id long, canon_name string")
    mdf = spark.createDataFrame(
        mentions, "mention_id long, mention_name string"
    )
    pass_a = lambda c: F.substring(c, 1, 1)  # noqa: E731 — all 'x'
    pass_b = lambda c: F.substring(c, -4, 4)  # noqa: E731 — q%03d tail

    # measured candidate volume: pass A un-capped is mentions x canon
    cand_a = (
        mdf.withColumn("bk", pass_a(F.col("mention_name")))
        .join(cdf.withColumn("bk", pass_a(F.col("canon_name"))), "bk")
        .count()
    )
    assert cand_a == N_MENT * N_CANON  # the quadratic core
    cap = 100
    capped_cdf = cdf.withColumn("bk", pass_a(F.col("canon_name")))
    ok = (
        capped_cdf.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= cap)
        .select("bk")
    )
    assert capped_cdf.join(ok, "bk").count() == 0  # block fully dropped
    # pass B blocks are <= ceil(5000/997)+1 = 6 canonicals each
    cand_b = (
        mdf.withColumn("bk", pass_b(F.col("mention_name")))
        .join(cdf.withColumn("bk", pass_b(F.col("canon_name"))), "bk")
        .count()
    )
    assert cand_b <= N_MENT * 6

    got = blocked_best_match(
        mdf, cdf, [pass_a, pass_b], max_dist=2, max_block=cap
    ).collect()
    # full recall purely via pass B, exact resolution, distance 1
    assert len(got) == N_MENT
    assert all(r["canon_id"] == r["mention_id"] for r in got)
    assert all(r["lev_dist"] == 1 for r in got)


def test_prefix_dual_pairs_template_spam(spark):
    """r7 dual-measure join under template spam: a 150-doc identical
    block makes EVERY shared element ubiquitous — candidate volume is
    inherently quadratic in the block (the pairs are all real dups,
    so completeness demands them), but the df=1 prune must still
    strip the clean tail's unique elements, and the identical block
    must come back as the full clique with jaccard = containment = 1.
    Measured: candidates from the clean tail stay ~0 (their tokens
    are df=1 or shared only with the block's disjoint vocab)."""
    from pyspark.sql import functions as F

    from mpes_spark.extras.dedup import prefix_dual_pairs

    n_block, n_clean = 150, 500
    template = " ".join(f"spam{i}" for i in range(12))
    rows = [(i, template) for i in range(n_block)]
    rows += [
        (1000 + i, " ".join(f"uniq_{i}_{j}" for j in range(12)))
        for i in range(n_clean)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = prefix_dual_pairs(
        docs, jaccard_threshold=0.9, containment_threshold=0.9, n=1
    )
    rows_out = out.collect()
    # exact clique on the block: C(150, 2) pairs, all at 1.0/1.0
    assert len(rows_out) == n_block * (n_block - 1) // 2
    assert all(
        r["jaccard"] == 1.0 and r["containment"] == 1.0 for r in rows_out
    )
    ids = {r["id_a"] for r in rows_out} | {r["id_b"] for r in rows_out}
    assert ids == set(range(n_block))  # clean tail emitted nothing


def test_prefix_cross_join_batch_vs_spam_corpus(spark):
    """r7 cross-ingest join under a skewed corpus: a batch of 5 docs
    probed against a corpus holding a 200-doc identical block. A
    batch doc matching the block must pair with ALL 200 (complete,
    per-pair), a fresh batch doc with none; candidate volume stays
    (block x matching-batch-docs)-sized, never corpus x batch."""
    from mpes_spark.extras.dedup import prefix_filtered_join

    template = " ".join(f"blk{i}" for i in range(12))
    corpus_rows = [(i, template) for i in range(200)]
    corpus_rows += [
        (5000 + i, " ".join(f"c_{i}_{j}" for j in range(12)))
        for i in range(300)
    ]
    batch_rows = [(9001, template)] + [
        (9100 + i, " ".join(f"b_{i}_{j}" for j in range(12))) for i in range(4)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    got = prefix_filtered_join(batch, corpus, threshold=0.9, n=1).collect()
    assert len(got) == 200
    assert {r["id_a"] for r in got} == {9001}
    assert {r["id_b"] for r in got} == set(range(200))
    assert all(r["jaccard"] == 1.0 for r in got)
