"""Property-based fuzz of the similarity-join COMPLETENESS contracts:
the prefix-filtered joins advertise zero recall loss as a theorem,
so random corpora must reproduce brute force EXACTLY — not just the
hand-built fixtures. Corpora are drawn with a mixed common/rare
vocabulary (the regime that exercises both the df=1 prune and the
rare-token prefixes) and deliberately include exact duplicates,
subset embeddings, and empty overlaps.

Examples are kept small (Spark round-trip per example); the seeds
hypothesis finds are replayed from .hypothesis/ on re-run.
"""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tokens: w0-w4 common (many docs reuse), r0-r29 rare
_VOCAB = [f"w{i}" for i in range(5)] + [f"r{i}" for i in range(30)]

_doc = st.lists(
    st.sampled_from(_VOCAB), min_size=2, max_size=10
).map(lambda toks: " ".join(toks))

_corpus = st.lists(_doc, min_size=3, max_size=8)

_threshold = st.sampled_from([0.3, 0.5, 0.7])

_FUZZ = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sets(rows):
    return {i: set(s.split()) for i, s in rows}


@_FUZZ
@given(corpus=_corpus, t=_threshold)
def test_fuzz_prefix_pairs_complete(spark, corpus, t):
    from mpes_spark.extras.dedup import prefix_filtered_pairs

    rows = list(enumerate(corpus))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filtered_pairs(docs, threshold=t, n=1).collect()
    }
    sets = _sets(rows)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= t:
            want[(a, b)] = round(j, 6)
    assert got == want


@_FUZZ
@given(corpus=_corpus, tj=_threshold, tc=st.sampled_from([0.6, 0.8, 1.0]))
def test_fuzz_dual_measure_complete(spark, corpus, tj, tc):
    from mpes_spark.extras.dedup import prefix_dual_pairs

    rows = list(enumerate(corpus))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["jaccard"],
            r["containment"],
            r["jaccard_dup"],
            r["containment_dup"],
        )
        for r in prefix_dual_pairs(
            docs, jaccard_threshold=tj, containment_threshold=tc, n=1
        ).collect()
    }
    sets = _sets(rows)
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        icnt = len(sets[a] & sets[b])
        if not icnt:
            continue
        j = icnt / len(sets[a] | sets[b])
        c = icnt / min(len(sets[a]), len(sets[b]))
        if j >= tj or c >= tc:
            want[(a, b)] = (round(j, 6), round(c, 6), int(j >= tj), int(c >= tc))
    assert got == want


@_FUZZ
@given(batch=_corpus, corpus=_corpus, t=_threshold)
def test_fuzz_cross_join_complete(spark, batch, corpus, t):
    from mpes_spark.extras.dedup import prefix_filtered_join

    brows = [(100 + i, s) for i, s in enumerate(batch)]
    crows = list(enumerate(corpus))
    bdf = spark.createDataFrame(brows, "doc_id long, text string")
    cdf = spark.createDataFrame(crows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filtered_join(bdf, cdf, threshold=t, n=1).collect()
    }
    bs, cs = _sets(brows), _sets(crows)
    want = {}
    for a, sa in bs.items():
        for b, sb in cs.items():
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                want[(a, b)] = round(j, 6)
    assert got == want


@_FUZZ
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=40),
    n_shards=st.sampled_from([1, 3, 8]),
)
def test_fuzz_balanced_shards_exact_rank(spark, sizes, n_shards):
    """Two-phase global rank == the plain sort's rank for ANY size
    multiset (heavy ties included); serpentine shard matches the
    closed-form formula per rank."""
    from mpes_spark.extras.curation import balanced_shards

    rows = [(i, " ".join(f"t{j}" for j in range(sz))) for i, sz in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["rank"], r["shard"])
        for r in balanced_shards(docs, n_shards=n_shards).collect()
    }
    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    for rank0, i in enumerate(order):
        rank = rank0 + 1
        pos = rank0 % n_shards
        shard = pos if (rank0 // n_shards) % 2 == 0 else n_shards - 1 - pos
        assert got[i] == (rank, shard), (i, got[i], (rank, shard))


@_FUZZ
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=30,
    ),
    k=st.sampled_from([2, 3]),
)
def test_fuzz_kcore_matches_driver_peel(spark, edges, k):
    """kcore with rounds >= node count must equal the driver-loop
    fixpoint peel on ANY small graph (self-loops and duplicate edges
    canonicalized away)."""
    from mpes_spark.analysis.graph import kcore

    clean = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not clean:
        return
    e = spark.createDataFrame(sorted(clean), "src long, dst long")
    got = {
        r["node"]: r["deg_core"]
        for r in kcore(e, k=k, rounds=13).collect()
    }
    adj = {}
    for a, b in clean:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        drop = {n for n, nb in adj.items() if len(nb) < k}
        changed = bool(drop)
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(nb) for n, nb in adj.items()}
    assert got == want


@_FUZZ
@given(
    specs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # source idx
            st.integers(min_value=1, max_value=60),  # token count
            st.booleans(),                           # duplicate of a prior doc?
        ),
        min_size=2,
        max_size=12,
    )
)
def test_fuzz_curation_audit_vs_python(spark, specs):
    """curation_audit against a pure-Python reference on random
    corpora: same first-failing-stage verdict per doc, same failure
    count — including exact-dup attribution to the min-id canonical
    and the wordcount/meanlen/stopword/dup2gram rule order."""
    from mpes_spark.extras.curation import AUDIT_STAGES, curation_audit
    from mpes_spark.extras.text import GOPHER_RULES

    stop_words = {"the", "and", "of", "to", "a", "in", "is", "it"}
    rows = []
    for i, (src, ntok, dup) in enumerate(specs):
        if dup and rows:
            text = rows[i % len(rows)][2]
        else:
            toks = []
            for j in range(ntok):
                if j % 7 == 0:
                    toks.append("the")
                elif j % 11 == 0:
                    toks.append("and")
                else:
                    toks.append(f"w{i}x{j}")
            text = " ".join(toks)
        rows.append((i, f"s{src}", text))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: (r["verdict"], r["n_rules_failed"])
        for r in curation_audit(docs).collect()
    }

    def norm(t):
        return " ".join(t.strip().lower().split())

    first_by_fp = {}
    for i, _, text in rows:
        fp = norm(text)
        first_by_fp.setdefault(fp, i)
    r = GOPHER_RULES
    for i, _, text in rows:
        toks = text.split()
        n = len(toks)
        mwl = sum(len(w) for w in toks) / n
        stop = sum(1 for w in toks if w in stop_words)
        grams = [" ".join(toks[j : j + 2]) for j in range(n - 1)]
        dup2 = 0.0 if n < 2 else round(1 - len(set(grams)) / len(grams), 6)
        fails = {
            "exact_dup": first_by_fp[norm(text)] != i,
            "wordcount": not (r["wordcount"][0] <= n <= r["wordcount"][1]),
            "meanlen": not (r["meanlen"][0] <= mwl <= r["meanlen"][1]),
            "stopword": stop < r["stopword"][0],
            "dup2gram": dup2 > r["dup2gram"][1],
        }
        verdict = next(
            (s for s in AUDIT_STAGES if fails[s]), "kept"
        )
        nf = sum(fails.values())
        assert got[i] == (verdict, nf), (i, got[i], (verdict, nf), text)
