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
