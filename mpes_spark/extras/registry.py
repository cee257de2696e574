"""Registry entries for the LLM-data-pipeline operators (extras/).

Queries over the ``documents`` and ``embeddings`` tables, each paired
with a DuckDB oracle where the operator is SQL-expressible. The
production sketches run on xxhash64 (no DuckDB twin -> rows-only
checks), but each has a structurally identical md5-hash-family twin
(`minhash_lsh_oracle`, `simhash_lsh_oracle`) that puts the FULL
sketch -> band -> verify pipeline under the hash-match gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mpes_spark.binning.engine import bin_sparse, bin_sparse_sql
from mpes_spark.binning.spec import BinAxis
from mpes_spark.extras import curation as CU
from mpes_spark.extras import dedup as DD
from mpes_spark.extras import multimodal as MM
from mpes_spark.extras import search as SR
from mpes_spark.extras import sketches as SK
from mpes_spark.extras import similarity as SIM
from mpes_spark.extras import text as TX
from mpes_spark.extras import tokenizer as TK
from mpes_spark.dq import profile_sql as _profile_sql


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None


_REGISTRY: list[Query] = []


def _q(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY.append(Query(name, fn, sql))
        return fn

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE: the local corpus is one row group -> a 1-task scan. A
    # repartition() here was tried and measured a NET LOSS at sf0.1
    # (A/B over 25 doc/emb queries: 59.2 s with vs 37.7 s without):
    # the extra exchange hides the scan's small size from AQE, which
    # then demotes downstream broadcast joins to shuffle joins
    # (embed_neardup_banded 1.9 -> 8.1 s), and adds a codegen stage
    # per query. At 100 TB the input is thousands of row groups wide
    # and the question doesn't arise. See SCALING.md "Single-file
    # scan parallelism".
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _pq(sf_dir: str, name: str) -> str:
    """Spark SQL table expression for a parquet path."""
    return f"parquet.`{sf_dir}/{name}.parquet`"


# ===========================================================================
# text analysis
# ===========================================================================

@_q(
    "text_stats",
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    f"round(avg({TX.token_count_sql('text')}), 6) AS avg_tokens, "
    f"round(avg({TX.bpe_token_count_sql('text')}), 6) AS avg_bpe_tokens, "
    f"CAST(sum({TX.stopword_count_sql('text')}) AS BIGINT) AS stopwords, "
    f"round(avg({TX.quality_score_sql('text')}), 6) AS avg_quality "
    "FROM documents GROUP BY source",
)
def text_stats(spark, sf_dir):
    """Per-source corpus statistics — length/stopword/quality columns
    (SURVEY Phase 6; quality-filter shape per C4/Gopher heuristics).
    Single scan, column-pruned to (source, text)."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg(TX.token_count_expr("text")), 6).alias("avg_tokens"),
        F.round(F.avg(TX.bpe_token_count_expr("text")), 6).alias("avg_bpe_tokens"),
        F.sum(TX.stopword_count_expr("text")).cast("bigint").alias("stopwords"),
        F.round(F.avg(TX.quality_score_expr("text")), 6).alias("avg_quality"),
    )


@_q(
    "lang_id_heuristic",
    f"SELECT {TX.lang_id_sql('text')} AS lang_guess, lang AS labeled, "
    "CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang_guess, labeled",
)
def lang_id_heuristic(spark, sf_dir):
    """Marker-word language ID vs the labeled lang column (confusion
    counts)."""
    d = _docs(spark, sf_dir)
    return d.groupBy(
        TX.lang_id_expr("text").alias("lang_guess"), F.col("lang").alias("labeled")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


@_q(
    "doc_rolling_hash",
    f"SELECT doc_id, {TX.rolling_hash_sql('text')} AS rhash "
    "FROM documents WHERE doc_id < 200",
)
def doc_rolling_hash(spark, sf_dir):
    """Rabin–Karp rolling-hash fingerprint as pure fold column math —
    value-identical on both engines (modular BIGINT arithmetic)."""
    d = _docs(spark, sf_dir)
    return d.filter(F.col("doc_id") < 200).select(
        "doc_id", TX.rolling_hash_expr("text").alias("rhash")
    )


@_q(
    "doc_fingerprint",
    "SELECT source, CAST(count(DISTINCT "
    f"{TX.fingerprint_sql('text')}) AS BIGINT) AS n_unique, "
    "CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source",
)
def doc_fingerprint(spark, sf_dir):
    """Normalized-content fingerprint cardinality per source."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.countDistinct(TX.fingerprint_expr("text")).cast("bigint").alias("n_unique"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )


def _gopher_query_sql() -> str:
    metrics = ", ".join(
        f"{fn('text')} AS {name}" for name, fn in TX.GOPHER_METRICS_SQL.items()
    )
    fl = TX.gopher_flags_sql()
    fails = ", ".join(
        f"CAST(sum(CASE WHEN {expr} THEN 0 ELSE 1 END) AS BIGINT) AS n_fail_{rule}"
        for rule, expr in fl.items()
    )
    pass_all = " AND ".join(fl.values())
    return (
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        f"{fails}, "
        f"CAST(sum(CASE WHEN {pass_all} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all, "
        "round(avg(m_dup2), 6) AS avg_dup2gram "
        f"FROM (SELECT source, {metrics} FROM documents) m GROUP BY source"
    )


@_q("curation_audit", CU.curation_audit_sql("documents"))
def curation_audit(spark, sf_dir):
    """Per-document drop-reason attribution: the FIRST stage of the
    canonical curation recipe (exact-dup, then the four Gopher rules
    in order) that would drop each doc, or 'kept' — plus how many
    rules it fails in total. ONE pass: the only shuffle is the
    16-byte fingerprint exchange for the keep-first dedup window;
    metrics are computed once in a narrow projection and the verdict
    is a CASE cascade. At 100 TB 'the filter dropped 12%' is not
    actionable; which stage, on which slice, is."""
    return CU.curation_audit(_docs(spark, sf_dir))


@_q("curation_funnel", CU.curation_funnel_sql("documents"))
def curation_funnel(spark, sf_dir):
    """Aggregated curation audit: docs per (source, first-failing
    stage) — the funnel dashboards read; same one-pass plan as
    curation_audit plus one source-keyed groupBy."""
    return CU.curation_funnel(_docs(spark, sf_dir))


@_q("vocab_growth", CU.vocab_growth_sql("documents"))
def vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve: per-doc new word types (in
    id order) and running (cum_tokens, cum_vocab) — a saturating
    curve flags template-dominated / near-duplicated data before
    dedup metrics do. 'Cumulative distinct' is never computed by
    prefix scans: each type attributes to its FIRST doc (min-id agg,
    the novelty owner trick on unigrams), then two-phase running
    sums; oracle is the plain global window, gating the
    decomposition exact."""
    return CU.vocab_growth(_docs(spark, sf_dir))


@_q("balanced_shards", CU.balanced_shards_sql("documents", n_shards=16))
def balanced_shards(spark, sf_dir):
    """Token-balanced shard assignment: serpentine (boustrophedon)
    placement over the global (n_tokens DESC, id) rank — hash
    sharding balances doc counts, and long-doc skew then makes
    token-heavy shards every epoch's stragglers. The global rank is
    two-phase (band-partitioned window + driver prefix-sum of band
    counts, the pack_sequences decomposition applied to ranking);
    the oracle is the plain global window, so the gate asserts the
    decomposition is EXACT per doc."""
    return CU.balanced_shards(_docs(spark, sf_dir), n_shards=16)


@_q("shard_balance", CU.shard_balance_sql("documents", n_shards=16))
def shard_balance(spark, sf_dir):
    """Shard manifest (shard, n_docs, total_tokens) for the
    serpentine token-balanced assignment — the balance evidence:
    serpentine pairs each pass's large remainders with small ones,
    so max-min total is bounded by ~one max doc per pass pair."""
    return CU.shard_balance(_docs(spark, sf_dir), n_shards=16)


@_q("quality_gopher", _gopher_query_sql())
def quality_gopher(spark, sf_dir):
    """Gopher-style quality-rule audit (Rae et al. 2021 §A1.1): per-
    source counts of docs failing each rule (word count, mean word
    length, stopword presence, repeated-2-gram fraction) and passing
    all. Each heavy metric (array n-gram math) is computed once in a
    narrow projection; the flags read the metric columns, so the only
    shuffle is the final groupBy(source)."""
    m = _docs(spark, sf_dir).select(
        "source",
        *[fn("text").alias(name) for name, fn in TX.GOPHER_METRICS_EXPR.items()],
    )
    fl = TX.gopher_flags_expr(
        F.col("m_ntok"), F.col("m_mwl"), F.col("m_stop"), F.col("m_dup2")
    )
    pass_all = None
    for c in fl.values():
        pass_all = c if pass_all is None else (pass_all & c)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")]
    aggs += [
        F.sum(F.when(c, 0).otherwise(1)).cast("bigint").alias(f"n_fail_{rule}")
        for rule, c in fl.items()
    ]
    aggs.append(
        F.sum(F.when(pass_all, 1).otherwise(0)).cast("bigint").alias("n_pass_all")
    )
    aggs.append(F.round(F.avg("m_dup2"), 6).alias("avg_dup2gram"))
    return m.groupBy("source").agg(*aggs)


def _pii_augmented_sql(dialect: str) -> str:
    """Corpus with synthetic PII injected into a deterministic subset
    (the synthetic word-soup corpus contains none) — emails on
    doc_id%10=0, phones on %10=1, SSNs on %10=2. Rendered per dialect
    only for the int->string cast spelling."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    did = f"CAST(doc_id AS {s})"
    pad4 = f"lpad(CAST(doc_id % 10000 AS {s}), 4, '0')"
    return (
        "SELECT doc_id, source, concat(text, CASE "
        f"WHEN doc_id % 10 = 0 THEN concat(' reach me at user', {did}, '@example.com') "
        f"WHEN doc_id % 10 = 1 THEN concat(' call 415-555-', {pad4}) "
        f"WHEN doc_id % 10 = 2 THEN concat(' ssn 123-45-', {pad4}) "
        "ELSE '' END) AS text"
    )


@_q(
    "pii_scan",
    f"WITH aug AS ({_pii_augmented_sql('duckdb')} FROM documents) "
    "SELECT source, "
    f"CAST(sum({TX.pii_count_sql('email')}) AS BIGINT) AS n_emails, "
    f"CAST(sum({TX.pii_count_sql('phone')}) AS BIGINT) AS n_phones, "
    f"CAST(sum({TX.pii_count_sql('ssn')}) AS BIGINT) AS n_ssns, "
    f"CAST(sum(CASE WHEN {TX.redact_pii_sql('text')} <> text THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_docs_redacted, "
    f"CAST(sum(length({TX.redact_pii_sql('text')})) AS BIGINT) AS redacted_len "
    "FROM aug GROUP BY source",
)
def pii_scan(spark, sf_dir):
    """PII detect + redact sweep (emails / phones / SSNs) over the
    corpus with synthetic PII injected on a deterministic subset —
    the standard pre-training scrub. Stateless regexp projections
    (JVM codegen, no UDF) + one narrow groupBy(source); redaction
    integrity asserted via changed-doc count and redacted lengths."""
    aug = spark.sql(f"{_pii_augmented_sql('spark')} FROM {_pq(sf_dir, 'documents')}")
    red = TX.redact_pii_expr("text")
    return aug.groupBy("source").agg(
        F.sum(TX.pii_count_expr("email", "text")).cast("bigint").alias("n_emails"),
        F.sum(TX.pii_count_expr("phone", "text")).cast("bigint").alias("n_phones"),
        F.sum(TX.pii_count_expr("ssn", "text")).cast("bigint").alias("n_ssns"),
        F.sum(F.when(red != F.col("text"), 1).otherwise(0)).cast("bigint").alias("n_docs_redacted"),
        F.sum(F.length(red)).cast("bigint").alias("redacted_len"),
    )


@_q(
    "bm25_search",
    SR.bm25_topk_sql("documents", k=10),
)
def bm25_search(spark, sf_dir):
    """BM25 top-10 keyword search for the default query bag — one
    corpus scan (pivoted per-term tf in a single groupBy(doc)), a
    1-row broadcast stats aggregate, TakeOrderedAndProject for the
    ranked limit. The retrieval primitive of the text pillar."""
    return SR.bm25_topk(_docs(spark, sf_dir), k=10)


@_q(
    "lm_perplexity",
    SR.lm_perplexity_by_source_sql("documents", ppl_threshold=30.0),
)
def lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity profile per source (add-0.5 smoothing,
    trained and applied in one job — the CC-Net-shape fluency
    filter). Count tables are corpus groupBys joined back on the
    n-gram key; threshold counts use rounded ppl for cross-engine
    determinism."""
    return SR.lm_perplexity_by_source(_docs(spark, sf_dir), ppl_threshold=30.0)


@_q(
    "perplexity_buckets",
    SR.perplexity_buckets_sql("documents", nbuckets=3),
)
def perplexity_buckets(spark, sf_dir):
    """CC-Net head/middle/tail split (Wenzek et al. 2020): per-lang
    ntile(3) over bigram-LM perplexity, aggregated per (lang,
    bucket). The bucket id is the curation signal CC-Net filters on;
    exact ntile is the oracle-checkable rendering of the production
    path ``search.perplexity_buckets_sampled`` (approx_percentile
    thresholds, no per-lang sort; disagreement-rate-tested against
    this exact form)."""
    return SR.perplexity_buckets(_docs(spark, sf_dir), nbuckets=3)


@_q("perplexity_buckets_sampled", None)  # sketch thresholds: rows-only
def perplexity_buckets_sampled(spark, sf_dir):
    """The PRODUCTION rendering of the CC-Net head/middle/tail split:
    bucket thresholds from one approx_percentile sketch aggregation
    (no per-lang ntile sort — the path that survives 10^9 docs per
    language), then the same (lang, bucket) rollup as
    `perplexity_buckets`. Registered rows-only so the scale path
    carries a bench number next to its exact twin; the <=1%
    assignment-disagreement bound vs exact ntile is asserted in
    tests/test_extras.py."""
    return SR.perplexity_buckets_sampled(_docs(spark, sf_dir), nbuckets=3)


@_q(
    "tfidf_topterms",
    SR.tfidf_topk_sql("documents", k=3),
)
def tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per doc (smoothed sklearn idf): keyword
    extraction over the corpus. df falls out of the distinct
    (doc, term) relation; N is one broadcast row; per-doc top-k is a
    doc-partitioned row_number — no global sort."""
    return SR.tfidf_topk(_docs(spark, sf_dir), k=3)


@_q(
    "temperature_mix",
    CU.temperature_mix_weights_sql("documents", alpha=0.3, token_budget=500_000),
)
def temperature_mix(spark, sf_dir):
    """Temperature-scaled domain sampling weights (q ∝ p^0.3, Lample
    & Conneau 2019) with a 500k-token budget split — the soft-mixing
    counterpart of token_budget_mix's hard caps. One corpus agg to
    nsources rows; windows run over the reduced relation only."""
    return CU.temperature_mix_weights(
        _docs(spark, sf_dir), alpha=0.3, token_budget=500_000
    )


@_q(
    "hybrid_search_rrf",
    SR.hybrid_rrf_sql("documents", "embeddings", k=10, depth=20),
)
def hybrid_search_rrf(spark, sf_dir):
    """Hybrid lexical+dense retrieval: BM25 top-20 and embedding-
    cosine top-20 (query = vec 0) fused by reciprocal rank fusion
    (1/(60+rank), Cormack et al. 2009). Each arm keeps its own scaled
    plan; the fusion join runs over depth-bounded relations only."""
    return SR.hybrid_rrf(
        _docs(spark, sf_dir), _embs(spark, sf_dir), k=10, depth=20
    )


@_q(
    "pmi_collocations",
    SR.pmi_topk_sql("documents", k=30, min_count=5),
)
def pmi_collocations(spark, sf_dir):
    """Top-30 adjacent word pairs by PMI (Church & Hanks 1990) with a
    min-count-5 floor: collocation / phrase mining. Bigrams are built
    row-local as an array column (no positional self-join); both count
    aggs are vocab-bounded; the unigram relation broadcasts back; the
    top-k is an ordered limit, never a global sort."""
    return SR.pmi_topk(_docs(spark, sf_dir), k=30, min_count=5)


@_q(
    "weighted_sample",
    CU.weighted_sample_sql("documents", k=8),
)
def weighted_sample(spark, sf_dir):
    """Per-source weighted sampling without replacement (Efraimidis &
    Spirakis A-ES, 8 docs/source, weight = n_chars): the primitive
    behind quality-weighted corpus mixing. The draw is the portable
    md5-prefix uniform, so the oracle replays it bit-for-bit; one
    group-partitioned window, no global sort."""
    return CU.weighted_sample(_docs(spark, sf_dir), k=8)


# ===========================================================================
# deduplication
# ===========================================================================

def _recrawl(d: DataFrame) -> DataFrame:
    """Union the corpus with a simulated re-crawl of every 7th doc
    (new ids, same text) — the standard exact-dup scenario."""
    dup = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    return d.unionByName(dup)


_RECRAWL_SQL = (
    "SELECT * FROM documents UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars "
    "FROM documents WHERE doc_id % 7 = 0"
)


@_q(
    "exact_dedup_groups",
    f"SELECT {TX.fingerprint_sql('text')} AS fingerprint, "
    "CAST(count(*) AS BIGINT) AS n_copies, min(doc_id) AS keep_id "
    f"FROM ({_RECRAWL_SQL}) u GROUP BY fingerprint HAVING count(*) > 1",
)
def exact_dedup_groups(spark, sf_dir):
    """Exact duplicate groups (md5-fingerprint groupBy) on the
    re-crawl union — one 16-byte-key shuffle, map-side combined."""
    return DD.duplicate_groups(_recrawl(_docs(spark, sf_dir)))


@_q(
    "exact_dedup_count",
    f"SELECT CAST(count(DISTINCT {TX.fingerprint_sql('text')}) AS BIGINT) "
    f"AS n_after, CAST(count(*) AS BIGINT) AS n_before FROM ({_RECRAWL_SQL}) u",
)
def exact_dedup_count(spark, sf_dir):
    """Row counts before/after keep-first exact dedup. Computed as a
    two-level aggregation over ONE pass of the re-crawl union (r11,
    guide §2.4): rows-after equals the number of distinct
    fingerprints (keep-first retains exactly one row per fingerprint
    — the identity the oracle SQL itself states), so
    ``groupBy(fingerprint).count()`` followed by
    ``(count(*), sum(count))`` yields both numbers — the old shape
    ran the union lineage twice (a raw count and the full
    ``exact_dedup`` semi-join's count: 8 parquet scans in the plan,
    now 2)."""
    u = _recrawl(_docs(spark, sf_dir))
    per_fp = u.groupBy(TX.fingerprint_expr("text").alias("_fp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return per_fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_before"),
    ).select("n_after", "n_before")


@_q(
    "neardup_jaccard",
    DD.blocked_jaccard_sql("documents", "duckdb", n=3, block_tokens=2, threshold=0.2),
)
def neardup_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard over prefix-blocked candidate pairs —
    the oracle-expressible verification core of near-dedup (the
    SQL template renders for both engines)."""
    return spark.sql(
        DD.blocked_jaccard_sql(
            _pq(sf_dir, "documents"), "spark", n=3, block_tokens=2, threshold=0.2
        )
    )


@_q(
    "neardup_weighted_jaccard",
    DD.blocked_weighted_jaccard_sql(
        "documents", "duckdb", n=3, block_tokens=2, threshold=0.2
    ),
)
def neardup_weighted_jaccard(spark, sf_dir):
    """WEIGHTED (multiset) Jaccard near-dup: sum(min)/sum(max) over
    the 3-gram bags — the repetition-aware verdict set Jaccard
    misses (a doc repeating one template paragraph 50x has set J=1.0
    against a single copy; its bag similarity correctly drops). The
    identity sum(max) = na + nb - sum(min) keeps the plan the exact
    set-verify shape with icnt -> sum(min); all-integer
    numerator/denominator, one IEEE divide."""
    return DD.blocked_weighted_jaccard(
        _docs(spark, sf_dir), n=3, block_tokens=2, threshold=0.2
    )


@_q(
    "neardup_containment",
    DD.blocked_containment_sql(
        "documents", "duckdb", n=3, block_tokens=2, threshold=0.3
    ),
)
def neardup_containment(spark, sf_dir):
    """Asymmetric near-dup: n-gram CONTAINMENT |A∩B| / min(|A|,|B|)
    over prefix-blocked pairs — catches a short document embedded
    verbatim in a long one, where symmetric Jaccard tends to 0
    (boilerplate-wrapped articles, quoted posts). Same
    blocked-candidate scale shape as neardup_jaccard."""
    return spark.sql(
        DD.blocked_containment_sql(
            _pq(sf_dir, "documents"), "spark", n=3, block_tokens=2, threshold=0.3
        )
    )


@_q(
    "neardup_prefix_filter",
    DD.prefix_filtered_pairs_sql("documents", "duckdb", threshold=0.7, n=3),
)
def neardup_prefix_filter(spark, sf_dir):
    """All-pairs 3-gram-shingle similarity join via rare-element
    PREFIX filtering (PPJoin family): candidates only from collisions
    among each doc's p = n - ceil(t*n) + 1 globally-rarest shingles —
    COMPLETE at Jaccard >= t (no recall trade, unlike LSH), and
    ubiquitous elements never generate candidates. Shingles, not
    unigrams: prefix filtering prunes only when the df distribution
    has a rare tail, which a fixed-vocab corpus's unigrams lack
    (measured 142 s vs ~3 s at sf0.1 — SCALING.md). Exact-Jaccard
    verify; completeness-vs-brute-force property test in
    tests/test_extras.py."""
    return DD.prefix_filtered_pairs(_docs(spark, sf_dir), threshold=0.7, n=3)


@_q(
    "neardup_prefix_waved",
    DD.prefix_filtered_pairs_sql("documents", "duckdb", threshold=0.7, n=3),
)
def neardup_prefix_waved(spark, sf_dir):
    """WAVED execution of the prefix-filtered similarity join (r11,
    the sf10 scratch-ceiling fix — SCALING.md): candidate+verify runs
    in 3 hash bands of the prefix element key, each wave eagerly
    materialized so peak shuffle scratch is ~1/waves of the un-waved
    plan (the shingle relation is ~40x corpus bytes; the sf10 probe
    hit the 78 GB box ceiling). Hash-gated against the SAME oracle as
    neardup_prefix_filter — waving is a physical-execution choice and
    must be result-invisible: every qualifying pair shares a prefix
    element, that element hashes into exactly one band, and each wave
    verifies against full per-doc shingle sets."""
    return DD.prefix_filtered_pairs(
        _docs(spark, sf_dir), threshold=0.7, n=3, waves=3
    )


_BATCH_PRED = "source IN ('src0', 'src1')"


@_q(
    "neardup_cross_ingest",
    DD.prefix_filtered_join_sql(
        f"(SELECT * FROM documents WHERE {_BATCH_PRED})",
        f"(SELECT * FROM documents WHERE NOT ({_BATCH_PRED}))",
        "duckdb",
        threshold=0.7,
        n=3,
    ),
)
def neardup_cross_ingest(spark, sf_dir):
    """Cross-relation prefix-filtered similarity join — the R-S form
    of the PPJoin self-join: an incoming batch (2 sources) checked
    against the standing corpus (the other 18) with ZERO recall loss,
    unlike LSH ingest dedup. Element df over the UNION gives one
    consistent global order; each side keeps its own rarest-element
    prefix; completeness via the Chaudhuri et al. prefix-filter
    principle at overlap >= ceil(t*max(na,nb)). The (small) batch
    prefix is the natural broadcast side — AQE decides."""
    docs = _docs(spark, sf_dir)
    batch = docs.filter(F.expr(_BATCH_PRED))
    corpus = docs.filter(~F.expr(_BATCH_PRED))
    return DD.prefix_filtered_join(batch, corpus, threshold=0.7, n=3)


@_q(
    "neardup_dual_measure",
    DD.prefix_dual_pairs_sql(
        "documents", "duckdb", jaccard_threshold=0.7,
        containment_threshold=0.9, n=3,
    ),
)
def neardup_dual_measure(spark, sf_dir):
    """Jaccard AND containment verdicts from ONE shared candidate
    relation and ONE intersection aggregate (the SCALING.md "shared
    work" note made real): a one-sided prefix join — prefix(A) vs
    full-elements(B) at t_eff = min(tj, tc) — is complete for BOTH
    measures (Jaccard via the PPJoin pigeonhole; containment because
    the SMALLER doc's prefix must hold a shared element), and both
    ratios derive from the single (id_a, id_b) intersection count.
    Running the two operators separately costs two candidate passes
    and two intersection joins; this costs one of each."""
    return DD.prefix_dual_pairs(
        _docs(spark, sf_dir), jaccard_threshold=0.7,
        containment_threshold=0.9, n=3,
    )


_SSD_RE = r"((?:\S+ ){7}\S+) "  # Java/RE2-common: every 8 words
# Punctuation-rich fixture (r10): after the every-8-words period, four
# word swaps plant abbreviation dots, initials, and !/? boundaries —
# literal replacements, so both dialects render them byte-identically.
_SSD_SWAPS = [
    (r"\bthe\b", "Dr."),   # abbreviation the segmenter must NOT split
    (r"\band\b", "J. K."), # single-letter initials
    (r"\bof\b", "why?"),   # '? ' sentence boundary
    (r"\bto\b", "now!"),   # '! ' sentence boundary
]


def _ssd_fixture_sql() -> str:
    e = f"regexp_replace(text, '{_SSD_RE}', '\\1. ', 'g')"
    for pat, rep in _SSD_SWAPS:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    return f"(SELECT doc_id, {e} AS text FROM documents) src"


@_q("sentence_span_dedup", DD.sentence_span_dedup_sql(_ssd_fixture_sql()))
def sentence_span_dedup(spark, sf_dir):
    """C4 sentence-span dedup accounting (Raffel et al. 2020 §2.2 —
    r9 late, the sentence-granularity member of the dedup family
    between chunk-level paragraphs and token-substring dup spans):
    per doc the 3-sentence-window counts, corpus-duplicated windows,
    and windows C4 would REMOVE (keep-first = min (doc, idx)
    ownership, carried in the SAME struct-min pass as the frequency
    agg — one shuffle on the span key, no count-distinct). All-integer
    output: exact gate. The fixture corpus has no punctuation, so the
    gate synthesizes it (a period after every 8th word, then planted
    abbreviations / initials / !? boundaries — _SSD_SWAPS), and the
    segmenter under test is the r10 RULE segmenter
    (:func:`mpes_spark.extras.dedup.sentence_split_expr`) rather than
    the old bare '. ' seam."""
    docs = _docs(spark, sf_dir).withColumn(
        "text", F.regexp_replace("text", _SSD_RE, "$1. ")
    )
    for pat, rep in _SSD_SWAPS:
        docs = docs.withColumn("text", F.regexp_replace("text", pat, rep))
    return DD.sentence_span_dedup(docs)


@_q("dup_span_stats", DD.dup_span_stats_sql("documents", n=5, min_docs=2))
def dup_span_stats(spark, sf_dir):
    """Exact substring-level dedup report (Lee et al. 2022): per doc,
    the maximal spans covered by 5-grams occurring in >= 2 distinct
    documents — (n_spans, dup_tokens, total_tokens, dup_frac). The
    distributable suffix-array alternative: positioned n-grams linear
    in tokens, ONE exact two-level dup-gram agg (distinct (sh, doc)
    then count — never a count-distinct over raw positions), one
    equi-join of positions onto the dup set (AQE splits viral
    boilerplate grams), one gaps-and-islands window per doc. The
    masked-corpus product (``dup_span_mask``) reuses the same spans
    with a higher-order token filter — no UDF anywhere."""
    return DD.dup_span_stats(_docs(spark, sf_dir), n=5, min_docs=2)


@_q("dup_span_mask", DD.dup_span_mask_sql("documents", n=5, min_docs=2))
def dup_span_mask(spark, sf_dir):
    """The CLEANED-CORPUS product of the gated span detector (r9,
    VERDICT #5): duplicated spans removed from each token stream via
    one higher-order array filter (no UDF), emitted as the masked
    text plus its kept-token count. The oracle rebuilds the same
    masked strings from the identical span pipeline (token explode ->
    span anti-join -> ordered reassembly), so the hash gate is
    string-exact on the artifact a pipeline actually ships."""
    out = DD.dup_span_mask(_docs(spark, sf_dir), n=5, min_docs=2)
    return out.select(
        "doc_id",
        F.when(F.col("masked_text") == "", F.lit(0))
        .otherwise(F.size(F.split("masked_text", " ")))
        .cast("bigint")
        .alias("kept_tokens"),
        "masked_text",
    )


@_q("ngram_novelty", DD.ngram_novelty_sql("documents", "duckdb", n=3))
def ngram_novelty(spark, sf_dir):
    """Per-document novelty: fraction of the doc's distinct 3-gram
    shingles with corpus frequency 1 (Lee et al. 2022 counting
    shape). Two aggregations, no shingle self-join: the frequency agg
    carries min(doc_id) as each unique shingle's owner, so df=1 rows
    re-aggregate straight to per-doc counts — a ubiquitous shingle
    costs one map-side-combined count, never a skewed join."""
    return DD.ngram_novelty(_docs(spark, sf_dir), n=3)


@_q(
    "ngram_novelty_k",
    DD.ngram_novelty_k_sql("documents", "duckdb", n=3, k=2),
)
def ngram_novelty_k(spark, sf_dir):
    """df<=K novelty (k=2): fraction of each doc's distinct 3-gram
    shingles appearing in at most 2 documents corpus-wide. Count-first
    list-second shape: the df agg runs before any owner list exists,
    and slice(sort_array(collect_set(id)), 1, k) only ever aggregates
    groups the df<=k filter already bounded to k rows — common
    shingles never materialize lists or join rows (SCALING.md
    "n-gram novelty" extension, now a gate row)."""
    return DD.ngram_novelty_k(_docs(spark, sf_dir), n=3, k=2)


@_q(
    "minhash_lsh_oracle",
    DD.minhash_lsh_sql("documents", "duckdb", n=3, k=8, bands=4, threshold=0.2),
)
def minhash_lsh_oracle(spark, sf_dir):
    """MinHash + banded LSH + exact-Jaccard verify with the FULL
    pipeline under the hash-match gate: md5-prefix integer hashes
    (the one hash family both engines compute bit-for-bit) replace
    xxhash64, so signatures, band buckets, candidates, and the
    verified pairs are all oracle-replayed. The production query
    (`minhash_lsh_pairs`) keeps the identical structure on the
    ~4x-faster xxhash64."""
    return spark.sql(
        DD.minhash_lsh_sql(
            _pq(sf_dir, "documents"), "spark", n=3, k=8, bands=4, threshold=0.2
        )
    )


@_q("minhash_lsh_pairs", None)  # xxhash64 sketch: rows-only by design
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash (k=32) + banded LSH (8 bands x 4 rows) candidate pairs,
    exact-Jaccard verified at 0.2 — candidates only ever form inside
    band buckets (no all-pairs)."""
    return DD.minhash_neardup_pairs(
        _docs(spark, sf_dir), n=3, k=32, bands=8, threshold=0.2
    )


@_q(
    "simhash_lsh_oracle",
    DD.simhash_lsh_sql("documents", "duckdb", nbits=32, bands=4, max_hamming=2),
)
def simhash_lsh_oracle(spark, sf_dir):
    """SimHash near-dup with every stage oracle-replayed (md5 hash
    family, 32-bit per-bit majority fingerprint, pigeonhole banding,
    bit_count(xor) verify; 16 bits collides quadratically on a
    random-text corpus — measured 2.1M pairs at sf0.1 vs 9k at 32
    bits). The production path (`simhash_neardup`) keeps the
    identical structure at 48 bits on packed xxhash64 counters."""
    return spark.sql(
        DD.simhash_lsh_sql(
            _pq(sf_dir, "documents"), "spark", nbits=32, bands=4, max_hamming=2
        )
    )


@_q("simhash_neardup", None)  # xxhash64 sketch: rows-only by design
def simhash_neardup(spark, sf_dir):
    """SimHash(48-bit) near-dup pairs within hamming<=3, banded
    bucketing. max_hamming = bands-1 keeps the pigeonhole guarantee
    exact (a pair within distance d < bands must agree on >= 1 band),
    so the output is complete, not best-effort. The packed-counter
    simhash (16 small sums, dedup.py) stays inside the JIT method
    budget, so this runs fully fused — the round-2
    heavy_expr_session fallback is gone."""
    return DD.simhash_neardup_pairs(
        _docs(spark, sf_dir), nbits=48, bands=4, max_hamming=3
    )


def _recrawl_table(table: str) -> str:
    """Aliased re-crawl union as a table expression (both dialects)."""
    return (
        f"(SELECT * FROM {table} UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars "
        f"FROM {table} WHERE doc_id % 7 = 0) rc"
    )


@_q(
    "dedup_clusters",
    DD.connected_components_sql(
        DD.blocked_jaccard_sql(
            _recrawl_table("documents"), "duckdb", n=3, block_tokens=2, threshold=0.2
        )
    ),
)
def dedup_clusters(spark, sf_dir):
    """Duplicate-CLUSTER resolution on the re-crawl union: near-dup
    pairs (exact blocked Jaccard >= 0.2) -> connected components ->
    per-cluster size and id range. Pairs only give edges; keep/drop
    needs the transitive closure (A~B, B~C collapses all three even
    when A~C was never emitted). Spark runs log-rounds min-label
    propagation with pointer jumping (dedup.py:connected_components);
    the oracle is the recursive-CTE reachability fixpoint — same
    clusters, two renderings."""
    d = _docs(spark, sf_dir)
    rc = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    pairs = DD.blocked_jaccard_pairs(rc, n=3, block_tokens=2, threshold=0.2)
    return DD.cluster_summary(DD.connected_components(pairs))


def _cluster_safe_split_sql() -> str:
    """Oracle for leakage-safe splitting: CC labels over near-dup
    pairs -> every doc keyed by its cluster root (singletons by their
    own id) -> the md5 split draw on the ROOT -> per-split rollup plus
    a global count of roots spanning >1 split (must be 0 — the whole
    point)."""
    ctes = DD._cc_label_ctes(
        DD.blocked_jaccard_sql("documents", "duckdb", n=3, block_tokens=2, threshold=0.2)
    )
    assigned = CU.dataset_split_sql("rooted", by="root")
    return f"""
WITH RECURSIVE {ctes},
rooted AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS root
  FROM documents d LEFT JOIN lab l ON l.node = d.doc_id
),
assigned AS ({assigned}),
spanning AS (
  SELECT count(*) AS n_span FROM (
    SELECT root FROM (SELECT DISTINCT root, split FROM assigned) rs
    GROUP BY root HAVING count(*) > 1
  ) v
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(n_span AS BIGINT) AS roots_spanning
FROM assigned CROSS JOIN spanning
GROUP BY split, n_span
""".strip()


@_q("cluster_safe_splits", _cluster_safe_split_sql())
def cluster_safe_splits(spark, sf_dir):
    """Leakage-safe train/val/test assignment (the contamination guard
    Lee et al./GPT-3 appendix splits need): near-dup CLUSTERS, not
    docs, are the split unit — CC labels over blocked-Jaccard pairs
    give every doc a cluster root (singletons key by their own id),
    the deterministic md5 draw assigns the ROOT, so near-identical
    docs can never straddle train/test. Output: per-split doc/root
    counts plus the global roots-spanning-splits count, which the
    construction forces to ZERO (gated, not asserted). Composes three
    gated components (pair gen, CC, split draw); one extra shuffle on
    the root key beyond the cluster pass."""
    d = _docs(spark, sf_dir)
    pairs = DD.blocked_jaccard_pairs(d, n=3, block_tokens=2, threshold=0.2)
    cc = DD.connected_components(pairs)
    rooted = d.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("root")
    )
    assigned = CU.dataset_split(rooted, by="root")
    per_root = assigned.select("root", "split").distinct()
    spanning = (
        per_root.groupBy("root")
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_span"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("root").cast("bigint").alias("n_roots"),
        )
        .crossJoin(F.broadcast(spanning))
        .select(
            "split", "n_docs", "n_roots",
            F.col("n_span").cast("bigint").alias("roots_spanning"),
        )
    )


@_q(
    "dedup_canonical_quality",
    DD.canonical_by_quality_sql(
        DD.blocked_jaccard_sql(
            _recrawl_table("documents"), "duckdb", n=3, block_tokens=2, threshold=0.2
        ),
        _recrawl_table("documents"),
    ),
)
def dedup_canonical_quality(spark, sf_dir):
    """Quality-based near-dup retention on the re-crawl union: the
    dedup_clusters pipeline with the keep decision upgraded from
    min-id to per-cluster BEST QUALITY (n_chars, ties to the lower
    id — so an exact re-crawl copy always loses to its original).
    One row per duplicate cluster with the canonical winner and the
    cluster's doc/quality mass; the per-cluster argmax is a window
    over independent cluster partitions, never a global sort."""
    d = _docs(spark, sf_dir)
    rc = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    pairs = DD.blocked_jaccard_pairs(rc, n=3, block_tokens=2, threshold=0.2)
    return DD.canonical_by_quality(rc, pairs)


@_q(
    "domain_cap_sample",
    CU.domain_cap_sql("documents", cap=15),
)
def domain_cap_sample(spark, sf_dir):
    """Per-domain cardinality cap (C4/Gopher rule): keep at most 15
    docs per source, highest n_chars first (ties to lower id) — the
    bound that stops one crawled host from dominating the mixture
    regardless of its size (temperature reweighting rescales;
    the cap bounds the worst case). One per-domain ranking window,
    no global sort."""
    return CU.domain_cap(_docs(spark, sf_dir), cap=15).select(
        "doc_id", "source", "n_chars", "keep_rank"
    )


@_q(
    "rouge2_eval",
    SR.rouge_n_sql(
        "SELECT a.doc_id AS pair_id, a.text AS ref_text, b.text AS cand_text "
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
        "AND a.doc_id < 40",
        n=2,
    ),
)
def rouge2_eval(spark, sf_dir):
    """ROUGE-2 (clipped bigram overlap, multiset semantics) between
    consecutive document pairs — the generated-data eval loop
    (distillation filtering, paraphrase QA) exercised as a
    deterministic pair relation. Integer gram counts end-to-end;
    precision/recall rounded once, F1 from the rounded values —
    exact cross-engine."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("ref_text")
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("text").alias("cand_text"),
    )
    pairs = a.join(b, "pair_id")
    return SR.rouge_n(pairs, n=2)


@_q(
    "bleu2_eval",
    SR.bleu2_sql(
        "SELECT a.doc_id AS pair_id, a.text AS ref_text, b.text AS cand_text "
        "FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1 "
        "AND a.doc_id < 40"
    ),
)
def bleu2_eval(spark, sf_dir):
    """Sentence-level BLEU-2 (clipped n-gram precision + brevity
    penalty) over the same consecutive-pair relation as
    `rouge2_eval` — the precision-family twin of that recall-family
    metric, closing the standard generated-data grading pair.
    Integer counts end-to-end; the geometric mean is mul+sqrt (both
    correctly rounded -> bit-identical cross-engine); only the
    brevity penalty's exp() carries the usual ulp-class residual,
    confined by the floor-based 6 dp round."""
    d = _docs(spark, sf_dir)
    a = d.filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("ref_text")
    )
    b = d.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("text").alias("cand_text"),
    )
    return SR.bleu2(a.join(b, "pair_id"))


@_q(
    "dataset_split_counts",
    "SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_chars) AS BIGINT) AS total_chars FROM ("
    + CU.dataset_split_sql("documents")
    + ") s GROUP BY split, lang",
)
def dataset_split_counts(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5, md5-prefix
    uniform on doc_id — seedless, engine-portable, no shuffle) rolled
    up per (split, lang). The leakage-free grouped variant (same key
    -> same split via ``by=``) is pinned by pytest; this gates the
    draw + threshold arithmetic end-to-end against DuckDB."""
    return (
        CU.dataset_split(_docs(spark, sf_dir))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@_q(
    "repeated_substrings",
    DD.winnow_dup_sql("documents", k=16, w=8),
)
def repeated_substrings(spark, sf_dir):
    """Cross-doc repeated-substring scan (the exact-substring-dedup
    concern of Lee et al. 2022) via winnowing fingerprints (Schleimer
    et al. 2003, MOSS): every 16-gram hashed, sliding-window-8 minima
    kept (~2/9 density), per-doc fraction of fingerprints shared with
    other docs. Any cross-doc span >= 23 chars is caught wherever it
    sits — no stride-alignment caveat — and doc-level MinHash misses
    these when surrounding text differs. Key-partitioned agg +
    same-key join (exchange reuse), never all-pairs. spread= widens
    the pre-shuffle fingerprint projection past the local corpus's
    1-task scan; on a wide production input it stays None."""
    return DD.winnow_dup_stats(
        _docs(spark, sf_dir),
        k=16,
        w=8,
        spread=spark.sparkContext.defaultParallelism,
    )


# ===========================================================================
# similarity search
# ===========================================================================

_PLANES = SIM.hyperplanes(dim=64, nplanes=8, seed=7)


@_q(
    "topk_cosine",
    SIM.topk_cosine_sql("embeddings", "vec_id < 8", k=3),
)
def topk_cosine(spark, sf_dir):
    """Brute-force exact top-3 cosine neighbors for 8 query vectors —
    the ANN baseline; query side broadcast, corpus scanned once."""
    e = _embs(spark, sf_dir)
    return SIM.topk_cosine(e, e.filter(F.col("vec_id") < 8), k=3)


@_q(
    "ann_lsh_cosine",
    SIM.ann_lsh_cosine_sql("embeddings", "vec_id < 8", _PLANES, k=3),
)
def ann_lsh_cosine(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN: queries only score their own
    bucket (8 seeded Gaussian planes -> 256 buckets)."""
    e = _embs(spark, sf_dir)
    return SIM.ann_lsh_cosine(e, e.filter(F.col("vec_id") < 8), _PLANES, k=3)


@_q(
    "ann_multiprobe_cosine",
    SIM.ann_multiprobe_cosine_sql("embeddings", "vec_id < 8", _PLANES, k=3),
)
def ann_multiprobe_cosine(spark, sf_dir):
    """Multi-probe hyperplane LSH (Lv et al. VLDB'07): each query
    scores its own bucket PLUS all 8 Hamming-1 flips — most of a
    second hash table's recall for zero extra index storage; the
    bucketed corpus (the big side) is built once, probes are p+1
    partition reads. Recall-vs-single-probe dominance is asserted in
    pytest; the full probe-set -> score -> rank pipeline is
    hash-gated."""
    e = _embs(spark, sf_dir)
    return SIM.ann_multiprobe_cosine(
        e, e.filter(F.col("vec_id") < 8), _PLANES, k=3
    )


@_q(
    "embed_neardup_lsh",
    SIM.embedding_neardup_sql("embeddings", _PLANES, threshold=0.4),
)
def embed_neardup_lsh(spark, sf_dir):
    """Embedding-cosine near-dup pairs within LSH buckets (>= 0.4
    cosine on this synthetic corpus; production threshold ~0.95)."""
    return SIM.embedding_neardup_pairs(_embs(spark, sf_dir), _PLANES, threshold=0.4)


# 4 bands x 6 planes: w = 6 per the SCALING.md sizing rule
# w >= log2(n / target_bucket_rows) with the bench corpus n = 2000 and
# ~30 rows/bucket — measured: w = 4 left 125 rows/bucket and made the
# verify stage evaluate 23% of ALL pairs (467k cosines), defeating the
# bucketing; w = 6 cuts candidates ~4x.
_BANDED_PLANES = SIM.hyperplanes(dim=64, nplanes=24, seed=11)


@_q(
    "embed_neardup_banded",
    SIM.embedding_neardup_banded_sql(
        "embeddings", _BANDED_PLANES, bands=4, threshold=0.4
    ),
)
def embed_neardup_banded(spark, sf_dir):
    """Banded hyperplane-LSH near-dup (4 bands x 6 planes) — the
    corpus-scale variant: band width sets bucket granularity
    (2^w buckets per band), band count restores recall
    (P = 1 - (1 - p^w)^bands); candidates distinct'd before the exact
    cosine verify. Full oracle twin (UNION-ALL band rendering)."""
    return SIM.embedding_neardup_banded(
        _embs(spark, sf_dir), _BANDED_PLANES, bands=4, threshold=0.4
    )


@_q(
    "semantic_dedup",
    "WITH pairs AS ("
    + SIM.embedding_neardup_banded_sql("embeddings", _BANDED_PLANES, bands=4, threshold=0.4)
    + "), drops AS (SELECT DISTINCT id_b FROM pairs) "
    "SELECT label, CAST(count(*) AS BIGINT) AS n_vecs, "
    "CAST(sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped "
    "FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.id_b GROUP BY label",
)
def semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication: embedding near-dup pairs
    (banded LSH buckets, exact-cosine verified) reduced by the
    keep-lowest-id rule — any vector appearing as the higher id of a
    pair is dropped, survivors stay. Per-label survival counts. The
    drop set is an equi-anti-join (no broadcast hint; AQE sizes it),
    and the pair generation reuses the bucketed plan — nothing is
    all-pairs at any stage."""
    e = _embs(spark, sf_dir)
    pairs = SIM.embedding_neardup_banded(e, _BANDED_PLANES, bands=4, threshold=0.4)
    drops = pairs.select(F.col("id_b").alias("drop_id")).distinct()
    return (
        e.join(drops, e.vec_id == F.col("drop_id"), "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("drop_id").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


@_q(
    "ivf_ann_fullprobe",
    SIM.topk_cosine_sql("embeddings", "vec_id < 8", k=3),
)
def ivf_ann_fullprobe(spark, sf_dir):
    """IVF at nprobe = nlist probes EVERY inverted list, which makes
    it exactly brute force — so the whole IVF machinery (k-means
    quantizer, list assignment, probe join, per-list scoring, global
    re-rank) runs under the brute-force SQL oracle's hash gate. The
    learned quantizer only decides WHICH lists are probed; at full
    probe its output cannot affect the result, so the oracle is exact
    by construction, not by luck."""
    e = _embs(spark, sf_dir)
    cent = SIM.train_ivf_centroids(e, k=8, sample_rows=2000, iters=8, seed=7)
    return SIM.ivf_topk_cosine(
        e, e.filter(F.col("vec_id") < 8), cent, k=3, nprobe=8
    )


_PCA_GATE_DIR = "/root/testdata/sf0.01"
try:
    _PCA_COMPS, _PCA_MU = SIM.pca_components_from_parquet(
        f"{_PCA_GATE_DIR}/embeddings.parquet", k=4
    )
    _PCA_SQL = SIM.pca_project_sql("embeddings", _PCA_COMPS, _PCA_MU)
except Exception:  # noqa: BLE001 - no gate-SF testdata: degrade to rows-only
    _PCA_SQL = None


@_q("pca_project_oracle", _PCA_SQL)
def pca_project_oracle(spark, sf_dir):
    """PCA projection with a LEARNED-component oracle twin — the
    IVF/PQ oracle-construction pattern extended to spectral methods:
    the top-4 principal axes are solved driver-side (numpy eigh of
    the (dim x dim) covariance — driver-trivial at ANY corpus size;
    id-sorted moment sums make the float summation order a data
    property, and a largest-|entry|-positive convention fixes eigh's
    sign freedom), then inlined as LITERALS into both the Spark
    projection (JVM fold per axis + scalar centering) and the DuckDB
    twin (sequential list_dot_product) — built at import from the
    gate-SF table. The SAME trained axes are applied at every SF
    (train once, project anywhere — the production pattern), so both
    engines project whatever corpus the runner mounts onto
    bit-identical literal axes and parity holds at sf0.01 AND the
    sf0.1 full sweep (r8 fix: the Spark side used to re-train per
    sf_dir, diverging from the literal-axis oracle off the gate SF).
    Only when the gate-SF table was unavailable at import (so no
    oracle exists either) does the query fall back to self-trained
    axes."""
    if _PCA_SQL is not None:
        return SIM.pca_project(_embs(spark, sf_dir), _PCA_COMPS, _PCA_MU)
    comps, mu = SIM.pca_components_from_parquet(
        f"{sf_dir}/embeddings.parquet", k=4
    )
    return SIM.pca_project(_embs(spark, sf_dir), comps, mu)


@_q("ivf_ann_cosine", None)  # learned buckets (kmeans+UDF): rows-only
def ivf_ann_cosine(spark, sf_dir):
    """IVF ANN: driver-trained coarse quantizer (k-means on a bounded
    sample), inverted lists by nearest centroid, nprobe=2 probing.
    Recall-vs-brute-force is asserted in tests/test_extras.py."""
    e = _embs(spark, sf_dir)
    cent = SIM.train_ivf_centroids(e, k=8, sample_rows=2000, iters=8, seed=7)
    return SIM.ivf_topk_cosine(
        e, e.filter(F.col("vec_id") < 8), cent, k=3, nprobe=2
    )


@_q("ivfpq_ann_cosine", None)  # learned quantizers: rows-only
def ivfpq_ann_cosine(spark, sf_dir):
    """IVFADC — the composed production ANN stack: IVF prune (8
    lists, nprobe=3) -> in-list PQ table-lookup scoring -> exact
    re-rank of the 50-deep shortlist. Recall-vs-brute-force asserted
    in tests/test_extras.py."""
    e = _embs(spark, sf_dir)
    cent = SIM.train_ivf_centroids(e, k=8, sample_rows=2000, iters=8, seed=7)
    books = SIM.train_pq_codebooks(e, m=8, ksub=16, sample_rows=2000, iters=8, seed=7)
    return SIM.ivfpq_topk_cosine(
        e, e.filter(F.col("vec_id") < 8), cent, books, k=3, nprobe=3, rerank=50
    )


@_q("pq_ann_cosine", None)  # learned codebooks (kmeans+UDF): rows-only
def pq_ann_cosine(spark, sf_dir):
    """Product-quantization ANN (Jégou 2011 IVFADC shape): driver-
    trained codebooks (8 subspaces x 16 centroids on a seeded
    sample), corpus encoded to 8 sub-codes via one Arrow pass, ADC
    table-lookup scoring selects a 100-deep shortlist per query, and
    the final top-3 is exact cosine over the shortlist only.
    Recall-vs-brute-force asserted in tests/test_extras.py."""
    e = _embs(spark, sf_dir)
    books = SIM.train_pq_codebooks(e, m=8, ksub=16, sample_rows=2000, iters=8, seed=7)
    return SIM.pq_topk_cosine(
        e, e.filter(F.col("vec_id") < 8), books, k=3, rerank=100
    )


@_q(
    "pq_ann_fullcodebook",
    SIM.pq_topk_cosine_fixed_sql(
        "embeddings", "vec_id < 8", SIM.fixed_pq_codebooks(), k=3
    ),
)
def pq_ann_fullcodebook(spark, sf_dir):
    """PQ ADC scoring under the driver's hash gate: with FIXED
    (non-learned) dyadic-rational codebooks the encode + table-lookup
    scoring pipeline is oracle-expressible, so the raw ADC ordering
    (``rerank=None`` — scores in the output, not just the shortlist)
    hash-matches a DuckDB twin. The ivf_ann_fullprobe construction
    applied to the PQ half; the learned-codebook path
    (``pq_ann_cosine``) stays rows-only by design."""
    e = _embs(spark, sf_dir)
    return SIM.pq_topk_cosine(
        e, e.filter(F.col("vec_id") < 8), SIM.fixed_pq_codebooks(), k=3
    )


# ===========================================================================
# corpus curation (sampling / decontamination / chunking)
# ===========================================================================

@_q(
    "stratified_sample",
    CU.stratified_sample_sql("documents", quota=5),
)
def stratified_sample(spark, sf_dir):
    """Per-source quota sampling (5 docs/source) ranked by a
    deterministic content hash — one window per source partition."""
    return CU.stratified_sample(_docs(spark, sf_dir), quota=5)


def _hash_sample_sql(dialect: str, pct: int = 10) -> str:
    """Deterministic pct% Bernoulli-by-content-hash sample of the
    documents table — dual-dialect via the shared md5 family."""
    h = DD._md5_hash_sql(42, "CAST(doc_id AS " +
                         ("STRING" if dialect == "spark" else "VARCHAR") + ")",
                         dialect)
    return (
        f"SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars "
        f"FROM documents WHERE ({h}) % 100 < {pct}"
    )


@_q("hash_fraction_sample", _hash_sample_sql("duckdb", pct=10))
def hash_fraction_sample(spark, sf_dir):
    """Deterministic 10% Bernoulli sample by seeded content hash —
    what production quick-looks actually run instead of
    TABLESAMPLE: reproducible across engines and runs (no RNG
    state), composable (the same predicate re-selects the same rows
    downstream), and a pure pushable filter — no shuffle, no
    sort, survives as a scan predicate at any scale. The md5 family
    makes the Spark and DuckDB selections bit-identical."""
    sql = _hash_sample_sql("spark", pct=10).replace(
        "FROM documents", f"FROM {_pq(sf_dir, 'documents')}"
    )
    return spark.sql(sql)


_EQUI_NTILES = 8


@_q(
    "equidepth_hist",
    f"""
SELECT event_type, bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(value), 6) AS lo,
       round(max(value), 6) AS hi
FROM (
  SELECT event_type, value,
         ntile({_EQUI_NTILES}) OVER (
           PARTITION BY event_type ORDER BY value, event_id
         ) AS bucket
  FROM events
) t GROUP BY event_type, bucket
""".strip(),
)
def equidepth_hist(spark, sf_dir):
    """Equi-depth histogram per group — the statistic a cost-based
    optimizer collects (equal-COUNT buckets adapt resolution to the
    data's density; equi-width buckets waste bins on empty ranges
    under skew): 8 ntile buckets per event_type with row count and
    [lo, hi] bounds. Deterministic under ties via the (value,
    event_id) order; the window partitions by group, so partition
    size is group-bounded. Each bucket's n_rows differing by at most
    1 within a group is the equi-depth property itself."""
    from pyspark.sql import Window as _Win

    w = _Win.partitionBy("event_type").orderBy("value", "event_id")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "value"
    )
    return (
        ev.withColumn("bucket", F.ntile(_EQUI_NTILES).over(w))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


@_q(
    "contamination_check",
    CU.contamination_sql("documents", "duckdb", n=8),
)
def contamination_check(spark, sf_dir):
    """Eval-set decontamination: per-source count of train docs
    sharing >= 1 word 8-gram with the benchmark split
    (doc_id % 50 = 0) — shingle semi-join, benchmark side small."""
    return spark.sql(
        CU.contamination_sql(_pq(sf_dir, "documents"), "spark", n=8)
    )


@_q(
    "contamination_severity",
    CU.contamination_severity_sql("documents", "duckdb", n=8),
)
def contamination_severity(spark, sf_dir):
    """Graded decontamination: per train doc, the FRACTION of its
    distinct 8-grams colliding with the benchmark split and a
    clean/partial/heavy verdict — the binary any-hit check treats a
    doc quoting one benchmark sentence like a verbatim copy;
    decontamination policy needs the distinction (drop heavy,
    scrub-or-keep partial). Same equi-keyed shingle join as the
    binary check (benchmark side broadcasts) plus one doc-keyed
    count; boundary determinism is one IEEE divide vs the same
    literal on both engines."""
    docs = _docs(spark, sf_dir)
    bench_pred = F.col("doc_id") % 50 == 0
    return CU.contamination_severity(
        docs.filter(~bench_pred), docs.filter(bench_pred), n=8
    )


@_q(
    "quality_quantile_gate",
    "SELECT * FROM ("
    + CU.quality_quantile_filter_sql("documents", q=0.25)
    + ") g WHERE doc_id < 1000",
)
def quality_quantile_gate(spark, sf_dir):
    """Per-source adaptive quality floor: keep docs at/above their
    source's 25th quality percentile (exact percent_rank window per
    group — the CC-Net-style per-domain calibration; fixed thresholds
    over/under-prune across domains). Row-level oracle over the
    deterministic (score, id) ordering."""
    return CU.quality_quantile_filter(_docs(spark, sf_dir), q=0.25).filter(
        F.col("doc_id") < 1000
    )


# Deterministic raw URL synthesized from the documents table (the
# testdata carries no URL column): upper-cased scheme/host noise,
# default port, tracking params in shuffled order, trailing-slash
# variants — everything the canonicalizer must collapse. Spark and
# DuckDB build the IDENTICAL string, so the canonical key is fully
# hash-gated.
_URL_RAW = (
    "concat('HTTPS://WWW.', source, '.Example.COM:443/docs/', "
    "CAST(doc_id % 40 AS {stype}), "
    "CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&b=2&a=1&fbclid=x' "
    "WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '/' END)"
)


@_q(
    "url_dedup",
    "WITH d AS (SELECT doc_id, "
    + CU.url_normalize_sql(_URL_RAW.format(stype="VARCHAR"))
    + " AS canon_url FROM documents) "
    "SELECT canon_url, CAST(count(*) AS BIGINT) AS n_docs, "
    "min(doc_id) AS keep_id FROM d GROUP BY canon_url "
    "HAVING count(*) >= 2",
)
def url_dedup(spark, sf_dir):
    """URL-level dedup — the crawl-curation FIRST stage (CC-Net /
    RefinedWeb run it before any content op because it needs no
    document bytes): canonicalize (case, www, default port, fragment,
    trailing slash, tracking params stripped, params sorted) then
    group on the canonical key, keeping the minimum doc id. The
    canonicalizer is pure Catalyst array/string expressions — no UDF
    — and the oracle replays every step."""
    d = _docs(spark, sf_dir).withColumn(
        "url", F.expr(_URL_RAW.format(stype="STRING"))
    )
    return CU.url_dedup(d)


@_q(
    "quality_classifier",
    CU.quality_classifier_sql("documents"),
)
def quality_classifier(spark, sf_dir):
    """Model-based quality filter (fasttext/hash-kernel shape): score
    each doc with a pretrained hashed-bag-of-words linear head —
    token -> md5 bucket -> weight, left-fold mean — keep score >= 0.
    The third quality leg next to heuristic rules (quality_gopher)
    and per-source calibration (quality_quantile_gate). Pure
    projection: no shuffle, no UDF, whole-stage codegen."""
    return CU.quality_classifier(_docs(spark, sf_dir))


@_q(
    "token_budget_mix",
    CU.token_budget_sample_sql("documents", budget_tokens=400),
)
def token_budget_mix(spark, sf_dir):
    """Domain-mixing materialization: each source's mixture weight as
    a 400-token budget, spent over docs in deterministic hash order —
    one window per source partition, no global sort."""
    return CU.token_budget_sample(_docs(spark, sf_dir), budget_tokens=400)


@_q(
    "doc_chunking",
    "SELECT doc_id, chunk_idx, n_tokens, chunk_hash FROM ("
    + CU.chunk_documents_sql("documents", chunk_tokens=64)
    + ") c WHERE doc_id < 300",
)
def doc_chunking(spark, sf_dir):
    """Fixed-size (64-token) chunk shard map for pretokenization —
    stateless explode, content carried as md5 to keep the relation
    narrow."""
    return CU.chunk_documents(
        _docs(spark, sf_dir).filter(F.col("doc_id") < 300), chunk_tokens=64
    )


_AX_SEQLEN = BinAxis("n_tokens", nbins=24, lo=0.0, hi=120.0)


@_q(
    "seqlen_hist",
    bin_sparse_sql(
        f"(SELECT CAST({TX.token_count_sql('text')} AS DOUBLE) AS n_tokens "
        "FROM documents)",
        [_AX_SEQLEN],
    ),
)
def seqlen_hist(spark, sf_dir):
    """Sequence-length distribution of the corpus through the SAME
    binning engine that serves the event pipeline (`bin_sparse`) —
    the packing/padding-efficiency diagnostic every pretraining run
    needs. One pruned scan, one grid-bounded shuffle."""
    d = _docs(spark, sf_dir).select(
        TX.token_count_expr("text").cast("double").alias("n_tokens")
    )
    return bin_sparse(d, [_AX_SEQLEN])


@_q(
    "bpe_pair_counts",
    "SELECT pair, CAST(count(*) AS BIGINT) AS freq FROM ("
    f"SELECT unnest({TX.word_ngrams_sql(2, 'text')}) AS pair FROM documents) p "
    "GROUP BY pair ORDER BY freq DESC, pair LIMIT 50",
)
def bpe_pair_counts(spark, sf_dir):
    """Corpus-wide adjacent-pair frequencies, top-50 — the counting
    step of a BPE merge iteration (here at word granularity; byte
    granularity is the same plan over char 2-grams). Explode ->
    partial+final count agg -> TakeOrderedAndProject: shuffle bounded
    by distinct-pair cardinality, never a global sort."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(TX.word_ngrams_expr(2, "text")).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(50)
    )


@_q(
    "chunk_dedup",
    CU.chunk_dedup_stats_sql(f"({_RECRAWL_SQL}) u", chunk_tokens=16),
)
def chunk_dedup(spark, sf_dir):
    """CC-Net-style sub-document dedup on the re-crawl union: fixed
    16-token chunks stand in for paragraphs; a chunk duplicated across
    >= 2 docs is dropped from every holder, and the query reports
    per-doc survival (docs that lost content). Hash groupBy + equi-join
    back — AQE picks the join strategy (the dup relation is tiny on
    clean corpora, huge on template spam)."""
    return CU.chunk_dedup_stats(_recrawl(_docs(spark, sf_dir)), chunk_tokens=16)


@_q(
    "pack_sequences",
    CU.pack_sequences_sql("documents", seq_tokens=128),
)
def pack_sequences(spark, sf_dir):
    """Concat-then-chunk sample packing into 128-token training
    sequences — per-doc (start_tok, seq_first, seq_last) in the global
    token stream. Two-phase cumulative sum (bucketed window + driver
    prefix offsets, never a single-partition global window); the
    oracle's plain global window asserts the decomposition is exact."""
    return CU.pack_sequences(_docs(spark, sf_dir), seq_tokens=128, buckets=8)


@_q("bpe_tokenizer", None)  # iterative driver merge loop: rows-only
def bpe_tokenizer(spark, sf_dir):
    """Full BPE tokenizer lifecycle: train 60 merges from the corpus
    word-frequency table (one Spark groupBy; driver loop over the
    bounded vocab — the HF-trainer shape), then encode every doc with
    the broadcast merge ranks and report per-source token counts and
    compression. Merge determinism + subword generalization asserted
    in tests/test_extras.py."""
    d = _docs(spark, sf_dir)
    merges = TK.train_bpe(d, n_merges=60, max_words=50_000)
    st = TK.bpe_token_stats(d, merges)
    return (
        d.select("doc_id", "source")
        .join(st, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("chars_per_token"), 6).alias("avg_chars_per_token"),
        )
    )


@_q("bpe_tokenizer_oracle", TK.train_bpe_sql("documents", n_merges=12))
def bpe_tokenizer_oracle(spark, sf_dir):
    """The BPE TRAINING loop under the hash gate (VERDICT r6 #7 — the
    last plausibly-oracle-able rows-only query): 12 merges learned
    from the uncapped corpus word-frequency table, returned as the
    ordered merge table (merge_rank, left_sym, right_sym). The Spark
    side runs the production driver loop (:func:`train_bpe` — one
    corpus groupBy, then bounded-vocab iteration); the DuckDB twin
    independently unrolls the same 12 iterations as chained CTEs
    (:func:`train_bpe_sql`) with the pair-count argmax, exact
    tie-break, and leftmost-non-overlapping merge application all in
    SQL. Integers + ASCII symbols end-to-end: exact."""
    d = _docs(spark, sf_dir)
    merges = TK.train_bpe(d, n_merges=12, max_words=None)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, left_sym string, right_sym string",
    )


@_q("unigram_tokenizer", TK.train_unigram_sql("documents"))
def unigram_tokenizer(spark, sf_dir):
    """The UNIGRAM-LM tokenizer TRAINING loop under the hash gate (r9
    late, Kudo 2018 — the other standard subword trainer next to BPE,
    in its hard-EM Viterbi rendering): seed vocabulary from frequent
    substrings, then two iterations of {micro-int log-frequency
    scores -> best segmentation of every distinct word -> piece
    re-count}. Integer scores make the DP compare exact BIGINT sums
    (the lr_train_quality lesson applied to a dynamic program), and
    ties take the longest piece at every backtrack step, so the
    DuckDB twin — the full EM loop with the Viterbi DP AND backtrack
    unrolled over word positions — replays training bit-for-bit.
    Spark side is the production shape: one corpus word-frequency
    agg, then a driver loop over the vocab-bounded distinct-word
    table (SentencePiece's own architecture)."""
    vocab = TK.train_unigram(_docs(spark, sf_dir))
    return spark.createDataFrame(
        [(p, int(c)) for p, c in vocab], "piece string, cnt bigint"
    )


@_q("unigram_token_stats", TK.unigram_token_stats_sql("documents"))
def unigram_token_stats(spark, sf_dir):
    """The unigram ENCODE path under the hash gate (r10, VERDICT r9
    #5 — the inference half of unigram_tokenizer): train the vocab,
    then Viterbi-segment EVERY corpus word with it in an Arrow
    pandas_udf (broadcast scores, per-batch word memo — the
    bpe_encode_udf shape) and roll up per-doc (n_words, n_chars,
    n_tokens, n_unk). Integer piece scores make inference the exact
    DP training ran, so the DuckDB twin replays it: the trainer's CTE
    chain plus one more unrolled DP + longest-piece backtrack over
    all distinct words under the FINAL vocabulary. Overlong (>12
    chars) or pathless words count as one <unk> in both engines.
    All-integer output: exact gate."""
    return TK.unigram_token_stats(_docs(spark, sf_dir))


@_q(
    "vocab_topk",
    "SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM ("
    "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
    "GROUP BY tok ORDER BY freq DESC, tok LIMIT 100",
)
def vocab_topk(spark, sf_dir):
    """Corpus vocabulary head: top-100 tokens by frequency (the
    vocab-building / BPE-seed primitive). Explode -> partial+final
    count agg -> TakeOrderedAndProject (per-partition partial top-k,
    never a global sort); ties broken by token for determinism."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(100)
    )


# -- DSIR importance weights (extras/curation.py:dsir_weights):
#    target-vs-source hashed-token log-likelihood ratio per doc — the
#    data-SELECTION primitive next to the quality legs. ---------------------
@_q(
    "dsir_weights",
    CU.dsir_weights_sql("documents"),
)
def dsir_weights_q(spark, sf_dir):
    """DSIR importance-sampling weights: hashed-feature
    log-likelihood-ratio scores of documents toward a target distribution.
    """
    return CU.dsir_weights(_docs(spark, sf_dir))


# -- exact heavy hitters with a Misra-Gries candidate pass
#    (extras/frequent.py): same output as the naive GROUP BY ... HAVING
#    (hence the plain SQL oracle), but the shuffle carries only
#    candidate occurrences — the long-tail vocabulary never crosses an
#    exchange. Completeness guaranteed by 1/(k+1) < min_frac. ---------------
@_q(
    "heavy_hitters",
    "SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM "
    "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
    "GROUP BY tok HAVING count(*) >= 0.002 * ("
    "SELECT count(*) FROM (SELECT unnest(string_split(text, ' ')) AS x "
    "FROM documents))",
)
def heavy_hitters(spark, sf_dir):
    """Exact heavy hitters via a Misra-Gries candidate pass: only
    candidate occurrences cross the shuffle; completeness from 1/(k+1) <
    min_frac.
    """
    from mpes_spark.extras.frequent import frequent_items

    tokens = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    return frequent_items(tokens, "tok", min_frac=0.002, k=2000)


# ===========================================================================
# multimodal plumbing
# ===========================================================================

@_q(
    "multimodal_meta",
    "SELECT 'image' AS modality, CAST(count(*) AS BIGINT) AS n_assets, "
    "CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes, "
    "round(avg(length(text) % 640), 6) AS avg_width FROM documents",
)
def multimodal_meta(spark, sf_dir):
    """Metadata-only rollup of the multimodal asset table (payload
    column untouched — pruned from the scan)."""
    return MM.modality_stats(MM.assets_from_documents(_docs(spark, sf_dir)))


@_q(
    "multimodal_features",
    MM.byte_accumulators_sql("documents", dim=8),
)
def multimodal_features(spark, sf_dir):
    """The feature-extraction seam under the full hash gate: the
    mapInPandas Arrow-batch pipeline (documents -> binary assets ->
    per-asset byte statistics) emitting INTEGER positional byte-sum
    accumulators, n_bytes and checksum — the all-integer projection
    of extract_features, exact across engines with zero rounding
    (extract_features' floats are round(acc_j/n, 6); tie asserted in
    tests/test_extras.py). The DuckDB twin re-derives the bytes from
    the text chars (payloads are pure-ASCII utf-8 by construction)."""
    assets = MM.assets_from_documents(_docs(spark, sf_dir))
    return MM.byte_accumulators(assets, dim=8)


@_q(
    "image_decode_stats",
    MM.image_decode_stats_sql("documents", width=16, max_bytes=128),
)
def image_decode_stats(spark, sf_dir):
    """The REAL image codec under the driver's hash gate (r8): each
    doc's leading bytes become a grayscale image, encoded to binary
    PGM and decoded back via the numpy-only codecs inside one Arrow
    batch, then reduced to integer pixel stats. The oracle re-derives
    the same stats from the characters, so a hash match proves the
    encode -> decode round-trip is lossless — the codec is gated, not
    stubbed."""
    return MM.image_decode_stats(_docs(spark, sf_dir), width=16, max_bytes=128)


@_q(
    "png_decode_stats",
    MM.png_decode_stats_sql("documents", width=8, max_bytes=120),
)
def png_decode_stats(spark, sf_dir):
    """The REAL PNG codec under the driver's hash gate (r9, VERDICT
    #4): leading doc bytes -> RGB image -> zlib-compressed PNG encode
    -> stdlib-inflate + numpy-unfilter decode -> integer pixel stats +
    round-tripped row count, all inside one Arrow batch. The oracle
    re-derives the stats from the characters, so a hash match proves
    the full PNG round-trip lossless — closing the image env seam for
    the format users actually have (io/images.py:read_png)."""
    return MM.png_decode_stats(_docs(spark, sf_dir), width=8, max_bytes=120)


@_q(
    "tiff_decode_stats",
    MM.tiff_decode_stats_sql("documents", width=10, max_bytes=120),
)
def tiff_decode_stats(spark, sf_dir):
    """The REAL TIFF/LZW codec under the driver's hash gate (r9 late —
    closes the lossless half of the last image seam; only entropy-
    coded JPEG remains env-gated): leading doc bytes -> grayscale
    image -> LZW-compressed TIFF with horizontal predictor 2 -> IFD
    parse + strip reassembly + early-change LZW inflate + predictor
    undo -> integer pixel stats + round-tripped row count, all inside
    one Arrow batch. The oracle re-derives the stats from the
    characters, so a hash match proves the full compressed round-trip
    lossless (io/images.py:read_tiff, write_tiff, lzw_decode)."""
    return MM.tiff_decode_stats(_docs(spark, sf_dir), width=10, max_bytes=120)


@_q(
    "jpeg_decode_stats",
    MM.jpeg_decode_stats_sql("documents", width=6, max_bytes=48),
)
def jpeg_decode_stats(spark, sf_dir):
    """The REAL baseline-JPEG codec under the driver's hash gate (r9
    late — closes the LAST image env seam; io/jpeg.py is a full
    T.81 baseline decoder+encoder): leading doc bytes -> 8x8
    constant-tile image -> quality-100 JPEG encode (Huffman entropy
    coding, stuffing, DC prediction, zigzag, DCT) -> full decode ->
    integer pixel stats. Constant blocks are DC-only with exactly
    representable coefficients, so THIS content class round-trips
    pixel-exact through the lossy format and the character-derived
    oracle hash-gates the whole pipeline."""
    return MM.jpeg_decode_stats(_docs(spark, sf_dir), width=6, max_bytes=48)


@_q(
    "flac_decode_stats",
    MM.flac_decode_stats_sql("documents", rate=16_000, max_bytes=120),
)
def flac_decode_stats(spark, sf_dir):
    """The REAL FLAC codec under the driver's hash gate (r9 late —
    the lossless third of the audio seam; lossy MP3/OGG stay env-
    gated): leading doc bytes -> prefix-sum int16 signal (smooth, so
    the FIXED-predictor + Rice encoder path genuinely engages) ->
    multi-frame FLAC encode (blocksize 32: several frames, coded
    frame numbers, CRC-8/16) -> full decode -> integer stats. The
    position-weighted sum makes the gate ORDER-sensitive — a frame
    decoded out of sequence or a Rice off-by-one flips the hash
    (io/flac.py:read_flac, write_flac)."""
    return MM.flac_decode_stats(_docs(spark, sf_dir), rate=16_000, max_bytes=120)


@_q("pxp_ingest_oracle", MM.pxp_decode_stats_sql("documents", max_bytes=96))
def pxp_ingest_oracle(spark, sf_dir):
    """The Igor packed-experiment CONTAINER under the hash gate (r10,
    VERDICT r9 #6 follow-through — the .pxp sibling of
    hdf5_ingest_oracle): leading doc bytes -> int32 data split across
    two waves in nested folders -> in-memory .pxp (PTN003 records,
    folder bracketing, v5 IBW images with real 16-bit header
    checksums) -> full record-walk parse -> integer stats. pos_dot is
    position-weighted WITHIN each wave, so a wrong split boundary,
    reordered samples, or a bad checksum/record length flips the hash
    (io/igor.py:load_pxp, pxp_bytes)."""
    return MM.pxp_decode_stats(_docs(spark, sf_dir), max_bytes=96)


@_q("mat_ingest_oracle", MM.mat_decode_stats_sql("documents", max_bytes=96))
def mat_ingest_oracle(spark, sf_dir):
    """The Level-5 MAT-file container under the hash gate (r10 — the
    .mat sibling of hdf5_ingest_oracle/pxp_ingest_oracle, closing the
    scipy.io seam): leading doc bytes -> int32 variable + nested
    struct (char field + float64 field, the float half omitted when
    empty) -> in-memory zlib-COMPRESSED MAT-file (miCOMPRESSED
    elements, struct field tables, char/int32/float64 storage) ->
    full element-walk parse -> integer stats computed from the PARSED
    values. pos_dot is position-weighted WITHIN each variable and
    n_fields pins the struct's field census, so a wrong split
    boundary, reordered samples, a bad tag length, or a dropped
    struct field flips the hash (io/matlib.py:mat_bytes, loadmat)."""
    return MM.mat_decode_stats(_docs(spark, sf_dir), max_bytes=96)


from mpes_spark.extras import privacy as PV  # noqa: E402


@_q(
    "k_anonymity_report",
    PV.k_anonymity_report_sql("documents", ["lang", "source"], k=5),
)
def k_anonymity_report(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002) over the (lang, source)
    quasi-identifiers: equivalence-class-size histogram with a
    ``violates`` flag for classes under k=5 — the release gate a
    training-data distribution needs before publishing per-slice
    stats. Two map-side-combined aggs, all-integer exact gate."""
    return PV.k_anonymity_report(_docs(spark, sf_dir), ["lang", "source"], k=5)


@_q(
    "l_diversity_report",
    PV.l_diversity_report_sql("documents", ["lang"], "source", ell=2),
)
def l_diversity_report(spark, sf_dir):
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) over
    lang classes with source as the sensitive attribute: the
    (distinct-sensitive-count -> classes/rows) histogram with a
    violates flag — composing with k_anonymity_report into the full
    release checklist. Two-level exact distinct, all-integer gate."""
    return PV.l_diversity_report(_docs(spark, sf_dir), ["lang"], "source", ell=2)


@_q(
    "t_closeness_report",
    PV.t_closeness_report_sql("documents", ["lang"], "source", t=0.05),
)
def t_closeness_report(spark, sf_dir):
    """t-closeness audit (Li et al. 2007, total-variation rendering):
    per lang class, the TV distance between its source distribution
    and the corpus-global one, violates flag at t=0.05 — completing
    the k-anonymity / l-diversity / t-closeness release trio. One
    class x sensitive-value relation, global relation broadcast."""
    return PV.t_closeness_report(_docs(spark, sf_dir), ["lang"], "source", t=0.05)


@_q(
    "dp_noisy_counts",
    PV.dp_noisy_counts_sql("documents", ["lang", "source"], "duckdb", epsilon=1.0),
)
def dp_noisy_counts(spark, sf_dir):
    """Laplace-mechanism noisy per-slice counts (Dwork et al. 2006)
    with the noise drawn deterministically from the shared md5 hash of
    the group key — reproducible releases, hash-gateable mechanism
    (identical inverse-CDF expression tree on both engines); swapping
    in true randomness is the seed argument."""
    sql = PV.dp_noisy_counts_sql(
        _pq(sf_dir, "documents"), ["lang", "source"], "spark", epsilon=1.0
    )
    return spark.sql(sql)


@_q(
    "audio_decode_stats",
    MM.audio_decode_stats_sql("documents", rate=16_000, max_bytes=128),
)
def audio_decode_stats(spark, sf_dir):
    """The REAL audio codec under the hash gate (r8): leading doc
    bytes -> int16 PCM -> RIFF/WAVE encode -> numpy decode -> integer
    sample stats + round-tripped sample rate, all inside one Arrow
    batch; the oracle re-derives the stats from the characters, so a
    hash match proves the WAV encode -> decode round-trip lossless."""
    return MM.audio_decode_stats(_docs(spark, sf_dir), rate=16_000, max_bytes=128)


@_q(
    "video_decode_stats",
    MM.video_decode_stats_sql("documents", max_bytes=96),
)
def video_decode_stats(spark, sf_dir):
    """The REAL video container under the hash gate (r8, completing
    the codec trio): leading doc bytes -> two 4x4 RGB frames ->
    uncompressed-DIB AVI encode (header + movi + idx1 index) -> full
    round-trip through the numpy-only parser (header, frame index,
    DIB decode) -> integer pixel stats; oracle from the characters."""
    return MM.video_decode_stats(_docs(spark, sf_dir), max_bytes=96)


@_q(
    "frame_sample_manifest",
    MM.frame_manifest_sql("documents", every_n=10, frames_mod=90),
)
def frame_sample_manifest(spark, sf_dir):
    """Video frame-sampling manifest (every-10th-frame indices per
    asset) — the JVM-side explode that fans one asset row into its
    sampled frame rows without copying the payload per frame. Gated
    on the (asset_id, frame_idx) manifest; the payload decode itself
    is the documented env seam."""
    assets = MM.assets_from_documents(_docs(spark, sf_dir))
    return MM.sample_frames(assets, every_n=10).select(
        "asset_id", F.col("frame_idx").cast("bigint").alias("frame_idx")
    )


# ===========================================================================
# portable sketches (extras/sketches.py) — HLL + count-min with every
# stage (registers, integer-domain harmonic sum, cells, min-over-rows)
# under the hash-match gate, the minhash_lsh_oracle treatment
# ===========================================================================

@_q("hll_estimate_oracle", SK.hll_estimate_sql("events", "user_id", "duckdb"))
def hll_estimate_oracle(spark, sf_dir):
    """HyperLogLog distinct-user estimate with the registers, the
    EXACT integer harmonic sum (sum of 2^(53-rho) as BIGINT — order-
    independent, unlike a float sum), the bias constant, and the
    linear-counting branch all oracle-replayed. The production
    distinct-count path stays Spark's own HLL++
    (`hll_distinct_users`, rows-only by design)."""
    return spark.sql(
        SK.hll_estimate_sql(_pq(sf_dir, "events"), "user_id", "spark")
    )


def _recipe_e2e_sql() -> str:
    """Composed-oracle twin of the CorpusPipeline recipe gated by
    `corpus_recipe_e2e`: quality_filter -> dedup_exact ->
    sample_quota(20), each stage the SQL of its standalone builder,
    chained as CTEs."""
    metrics = ", ".join(
        f"{fn('text')} AS {name}" for name, fn in TX.GOPHER_METRICS_SQL.items()
    )
    pass_all = " AND ".join(TX.gopher_flags_sql().values())
    fp = TX.fingerprint_sql("text")
    return f"""
WITH m AS (SELECT doc_id, source, text, {metrics} FROM documents),
q AS (SELECT doc_id, source, text FROM m WHERE {pass_all}),
d AS (SELECT doc_id, source, text,
             min(doc_id) OVER (PARTITION BY {fp}) AS keep_id
      FROM q),
kept AS (SELECT doc_id, source, text FROM d WHERE doc_id = keep_id),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rk
      FROM kept)
SELECT doc_id, source FROM r WHERE rk <= 20
""".strip()


@_q("corpus_recipe_e2e", _recipe_e2e_sql())
def corpus_recipe_e2e(spark, sf_dir):
    """The CorpusPipeline FACADE itself under the hash gate, not just
    its stages: quality_filter -> dedup_exact -> sample_quota(20)
    composed fluently on the engine side, against an oracle that
    chains each stage's standalone SQL as CTEs. Gates that stage
    COMPOSITION preserves semantics — the dedup window runs on
    quality survivors only, the sample ranks among dedup survivors
    only — i.e. the facade's immutable-chain plumbing, end to end."""
    from mpes_spark.extras.pipeline import CorpusPipeline

    return (
        CorpusPipeline(_docs(spark, sf_dir))
        .quality_filter()
        # pin the two multiply-consumed stage boundaries (r11): the
        # dedup and sample stages each reference their input on both
        # sides of an ids-semi-join, so the unpinned chain re-ran the
        # quality scan 4x (8 parquet-scan nodes in the before plan;
        # pinned, each boundary computes once and later references
        # read the cache — measured 2.29 -> 1.51 s, CorpusPipeline.pin)
        .pin()
        .dedup_exact()
        .pin()
        .sample_quota(20, "source")
        .df.select("doc_id", "source")
    )


_HLL_PRED_A = "event_type = 'purchase' AND value > 100"
_HLL_PRED_B = "event_type = 'click' AND value > 100"


@_q(
    "hll_set_ops_oracle",
    SK.hll_set_ops_sql("events", "user_id", _HLL_PRED_A, _HLL_PRED_B, "duckdb"),
)
def hll_set_ops_oracle(spark, sf_dir):
    """HLL set algebra: distinct-user estimates for two
    predicate-defined populations (big purchasers / big clickers),
    their union, and the inclusion-exclusion INTERSECTION estimate —
    'how many users did both' without materializing either id set.
    The union estimate from unioned rows IS the register-max sketch
    merge (HLL merge lemma), so the gated row replays distributed
    merge semantics; exact counterparts ride along for the
    error-vs-truth read."""
    return spark.sql(
        SK.hll_set_ops_sql(
            _pq(sf_dir, "events"), "user_id", _HLL_PRED_A, _HLL_PRED_B,
            "spark",
        )
    )


@_q(
    "cms_topk_estimate",
    SK.cms_topk_estimate_sql("documents", "duckdb", width=32),
)
def cms_topk_estimate(spark, sf_dir):
    """Count-min sketch (4 x 32 cells — width chosen so the synthetic
    vocab actually collides and the one-sided error is visible) over
    the token stream, read back for the top-50 tokens next to exact
    counts: cms_est >= exact_cnt always, equality when no collision.
    Build is one scan combined map-side into bounded cells; the probe
    side is topk*depth rows."""
    return spark.sql(
        SK.cms_topk_estimate_sql(_pq(sf_dir, "documents"), "spark", width=32)
    )


@_q(
    "bloom_semijoin_prune",
    SK.bloom_semijoin_sql(
        "customer",
        "c_custkey",
        "orders",
        "o_custkey",
        "duckdb",
        m_bits=32768,
        k=3,
        build_pred="c_mktsegment = 'BUILDING'",
    ),
)
def bloom_semijoin_prune(spark, sf_dir):
    """Bloom-filter runtime-prune audit: an m=32k/k=3 filter over
    BUILDING-segment customers (m sized ~10 bits/key at bench scale
    so the filter actually discriminates — an undersized filter
    saturates and passes everything) probed by every distinct orders
    custkey — pass/true/false-positive counts all hash-matched. The
    production mechanism is Spark's own runtime bloom pruning
    (engine-private bit layout); this portable rendering proves the
    semantics: zero false negatives, measured fp rate."""
    return spark.sql(
        SK.bloom_semijoin_sql(
            _pq(sf_dir, "customer"),
            "c_custkey",
            _pq(sf_dir, "orders"),
            "o_custkey",
            "spark",
            m_bits=32768,
            k=3,
            build_pred="c_mktsegment = 'BUILDING'",
        )
    )


@_q(
    "cms_join_size",
    SK.cms_join_size_sql(
        "events",
        "user_id",
        "events",
        "user_id",
        "duckdb",
        width=4096,
        pred_a="event_type = 'purchase'",
        pred_b="event_type = 'click'",
    ),
)
def cms_join_size(spark, sf_dir):
    """Join-cardinality estimation WITHOUT the join (CMS inner
    product, min over rows of sum cntA*cntB): how many
    purchase-x-click pairs the user_id join would produce — the
    planner question at 100 TB answered by two bounded sketches and
    a depth*width-row join. One-sided; exact size alongside."""
    return spark.sql(
        SK.cms_join_size_sql(
            _pq(sf_dir, "events"),
            "user_id",
            _pq(sf_dir, "events"),
            "user_id",
            "spark",
            width=4096,
            pred_a="event_type = 'purchase'",
            pred_b="event_type = 'click'",
        )
    )


_LANGS = ["de", "en", "es", "fr", "zh"]


@_q(
    "pivot_counts",
    "SELECT source, "
    + ", ".join(
        f"CAST(sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {lg}"
        for lg in _LANGS
    )
    + " FROM documents GROUP BY source",
)
def pivot_counts(spark, sf_dir):
    """Cross-tabulation via `groupBy().pivot()` with an EXPLICIT value
    list — the form that stays one aggregation pass; an unlisted
    pivot first runs a distinct scan to discover columns and caps at
    `spark.sql.pivotMaxValues`. Output bounded by |source| x |lang|."""
    d = _docs(spark, sf_dir)
    out = d.groupBy("source").pivot("lang", _LANGS).count()
    return out.na.fill(0).select(
        "source", *[F.col(lg).cast("bigint").alias(lg) for lg in _LANGS]
    )


_COV_DIMS = 8


def _cov_sql(table: str, dialect: str, dims: int = _COV_DIMS) -> str:
    """Covariance of the first ``dims`` embedding components as tidy
    (i, j, cov) rows, i <= j — the Gram-matrix aggregation PCA/whitening
    starts from. Raw moments (sum x_i*x_j, sum x_i) reduce in ONE pass
    over the exploded (row, dim) relation; cov = s_ij/n - mu_i*mu_j.
    Values cast FLOAT->DOUBLE before any product so both engines
    multiply identical doubles; the only drift is summation order,
    absorbed by round 6."""
    if dialect == "spark":
        dimrel = f"(SELECT id AS i FROM range({dims}))"
        elem = "CAST(e.embedding[CAST(d.i AS INT)] AS DOUBLE)"  # 0-indexed
    else:
        dimrel = f"(SELECT range AS i FROM range({dims}))"
        elem = "CAST(e.embedding[CAST(d.i + 1 AS INT)] AS DOUBLE)"  # 1-indexed
    return f"""
WITH x AS (SELECT e.vec_id, d.i, {elem} AS v
           FROM {table} e CROSS JOIN {dimrel} d),
n AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS n FROM x),
mu AS (SELECT i, sum(v) AS s FROM x GROUP BY i),
s2 AS (SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS s
       FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
       GROUP BY a.i, b.i)
SELECT s2.i, s2.j,
       round(s2.s / n.n - (ma.s / n.n) * (mb.s / n.n), 6) AS cov
FROM s2 CROSS JOIN n
JOIN mu ma ON ma.i = s2.i
JOIN mu mb ON mb.i = s2.j
""".strip()


@_q("embedding_covariance", _cov_sql("embeddings", "duckdb"))
def embedding_covariance(spark, sf_dir):
    """Embedding covariance block (first 8 dims, upper triangle) —
    the one-pass moment aggregation feeding PCA/whitening/drift
    monitoring. The exploded relation is rows x dims (bounded
    explode), moments collapse map-side to dims + dims^2/2 cells,
    and the final arithmetic runs over that cell relation only. The
    driver-side eigendecomposition of an 8x8 (or 256x256) matrix is
    numpy territory by design."""
    return spark.sql(_cov_sql(_pq(sf_dir, "embeddings"), "spark"))


from mpes_spark.extras import cluster as CL


@_q("kmeans_embeddings", CL.kmeans_fixed_sql("embeddings", k=4, iters=2))
def kmeans_embeddings(spark, sf_dir):
    """Fixed-iteration k-means (k=4, 2 Lloyd steps) over the
    embeddings relation — the clustering primitive under semantic
    dedup / domain discovery / IVF coarse quantization, rendered
    deterministic (k-smallest-id init, rounded-distance argmin,
    engine-rounded centroids) so the DuckDB twin replays the SAME
    unrolled iterations. Per iteration: one narrow projection
    (centroid literals, no join) + one (cid, pos) aggregation; the
    only driver traffic is k x dim doubles."""
    return CL.kmeans_fixed(_embs(spark, sf_dir), k=4, iters=2)


@_q(
    "cross_source_duplication",
    DD.cross_source_dup_matrix_sql(
        DD.blocked_jaccard_sql(
            "documents", "duckdb", n=3, block_tokens=2, threshold=0.2
        ),
        "documents",
    ),
)
def cross_source_duplication(spark, sf_dir):
    """Crawl-overlap diagnostic: verified near-dup pairs rolled up by
    the (source, source) of their endpoints — which dumps duplicate
    into which, the signal that orders dedup passes and provenance-
    aware retention. Two id->source lookups on the pair relation and
    one |sources|^2-bounded groupBy on top of the oracled blocked-
    Jaccard pair generator."""
    d = _docs(spark, sf_dir)
    pairs = DD.blocked_jaccard_pairs(
        d, n=3, block_tokens=2, threshold=0.2
    ).select("id_a", "id_b")
    return DD.cross_source_dup_matrix(d, pairs)


@_q(
    "vocab_coverage_by_source",
    TK.vocab_coverage_sql("documents", vocab_size=20),
)
def vocab_coverage_by_source(spark, sf_dir):
    """Per-source vocabulary coverage against the corpus's top-20
    token vocab (vocab_size chosen to exercise the OOV path on the
    31-type synthetic corpus): OOV token/type rates — the tokenizer
    and vocab-design feedback signal. One token explode feeds both
    the TakeOrdered vocab construction and the per-source agg;
    membership is a broadcast V-row left join."""
    return TK.vocab_coverage(_docs(spark, sf_dir), vocab_size=20)


from mpes_spark.diagnostics import psi_drift as _psi_drift
from mpes_spark.diagnostics import psi_drift_sql as _psi_drift_sql


@_q(
    "psi_value_drift",
    _psi_drift_sql(
        "SELECT value FROM events WHERE event_id % 2 = 0",
        "SELECT value FROM events WHERE event_id % 2 = 1",
        "value",
        0.0,
        500.0,
        nbins=20,
    ),
)
def psi_value_drift(spark, sf_dir):
    """Population Stability Index between two event snapshots (the
    data-drift monitor between a training corpus and incoming data):
    per-bin base/current shares with Laplace smoothing and the PSI
    contribution of each bin. Two bounded aggregations + a
    broadcast-sized bin join — drift-checking 100 TB costs two column
    scans. Split here is deterministic (event_id parity) so the twin
    replays it."""
    from mpes_spark.registry import t as _t

    ev = _t(spark, sf_dir, "events")
    return _psi_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
        0.0,
        500.0,
        nbins=20,
    )


@_q(
    "contrastive_mining",
    SIM.contrastive_pairs_sql("embeddings", "vec_id < 8"),
)
def contrastive_mining(spark, sf_dir):
    """Contrastive training-pair mining: per anchor the top-3
    most-similar same-label positives and top-5 highest-cosine
    different-label HARD negatives — the pair-construction step of
    embedding-model training. One corpus scan against the broadcast
    anchor set; ranking windows partition per (anchor, polarity);
    output bounded by anchors x (pos + neg)."""
    e = _embs(spark, sf_dir)
    return SIM.contrastive_pairs(e, e.filter(F.col("vec_id") < 8))


@_q(
    "contrastive_mining_ann",
    SIM.contrastive_pairs_ann_sql(
        "embeddings", "vec_id < 8", _BANDED_PLANES, bands=8
    ),
)
def contrastive_mining_ann(spark, sf_dir):
    """ANN-backed contrastive mining (8-band x 3-plane hyperplane LSH
    candidates, exact-cosine verify, same (anchor, polarity) ranking)
    — the variant whose anchor set SHUFFLES on (band, bucket) instead
    of broadcasting, so billions of anchors work. Full oracle twin:
    bucket ids are integer sign-bit words, so both engines form the
    identical candidate set; recall vs the exact miner asserted in
    tests/test_extras.py."""
    e = _embs(spark, sf_dir)
    return SIM.contrastive_pairs_ann(
        e, e.filter(F.col("vec_id") < 8), _BANDED_PLANES, bands=8
    )


@_q("mmr_rerank_cosine", None)  # iterative greedy: rows-only by design
def mmr_rerank_cosine(spark, sf_dir):
    """MMR-diversified top-10 from exact cosine top-20 candidates
    (lambda=0.7): the diversity pass between retrieval and
    consumption. Greedy is sequential within a query but queries are
    independent -> one applyInPandas group per query, numpy inside,
    candidate lists retrieval-depth-bounded. No SQL twin (iterative
    argmax isn't relational); numerics pinned by the numpy-replay
    test in tests/test_extras.py."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 8)
    cand = SIM.topk_cosine(e, q, k=20).join(
        e.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
        ),
        "neighbor_id",
    )
    return SIM.mmr_rerank(cand, k=10, lam=0.7)


@_q(
    "mmr_rerank_oracle",
    SIM.mmr_rerank_unrolled_sql("embeddings", "vec_id < 8", depth=10, k=5, lam=0.7),
)
def mmr_rerank_oracle(spark, sf_dir):
    """Oracle-replayable MMR re-rank: top-5 MMR selection from exact
    cosine top-10 candidates (lambda=0.7) with every decision quantity
    rounded to 6 before the argmax and the 5 greedy steps executed as
    relational argmax rounds (kmeans float-sync playbook) — the
    hash-gated twin of `mmr_rerank_cosine`'s applyInPandas greedy.
    The DuckDB twin textually unrolls the same 5 steps as chained
    CTEs."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 8)
    cand = SIM.topk_cosine(e, q, k=10).join(
        e.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
        ),
        "neighbor_id",
    )
    return SIM.mmr_rerank_unrolled(cand, k=5, lam=0.7)


_EVAL_RELEVANCE_SQL = (
    "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
    "CAST(1.0 AS DOUBLE) AS rel "
    "FROM embeddings q JOIN embeddings c "
    "ON c.label = q.label AND c.vec_id <> q.vec_id "
    "WHERE q.vec_id < 8"
)


@_q(
    "retrieval_eval",
    SR.retrieval_metrics_sql(
        SIM.topk_cosine_sql("embeddings", "vec_id < 8", k=10),
        _EVAL_RELEVANCE_SQL,
        k=10,
    ),
)
def retrieval_eval(spark, sf_dir):
    """Offline retrieval evaluation: per-query recall@10 / RR@10 /
    nDCG@10 of exact cosine top-10 against label-match ground truth
    (same label = relevant). The eval relations are k-bounded
    (ranking) and judgment-sized (relevance); two qid-keyed aggs and
    one equi-join — the corpus is touched only by the ranker under
    evaluation. The missing loop-closer of the retrieval pillar:
    BM25/ANN/hybrid variants all score through this same harness."""
    e = _embs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 8)
    ranking = SIM.topk_cosine(e, q, k=10)
    rel = (
        q.select(F.col("vec_id").alias("query_id"), "label")
        .join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label"), "label"
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.lit(1.0).alias("rel"))
    )
    return SR.retrieval_metrics(ranking, rel, k=10)


@_q(
    "embedding_pool",
    SIM.pool_embeddings_sql("embeddings", group="label"),
)
def embedding_pool(spark, sf_dir):
    """Mean-pool chunk embeddings per group (the chunk->document
    re-assembly after long-doc embedding; sentence-transformers mean
    pooling). Long-form output bounded by |groups| x dim; one bounded
    posexplode + one map-side-combined groupBy, no UDF."""
    return SIM.pool_embeddings(_embs(spark, sf_dir), group="label")


_PROFILE_COLS = [
    ("doc_id", True),
    ("lang", False),
    ("source", False),
    ("n_chars", True),
]


@_q("table_profile", _profile_sql("documents", _PROFILE_COLS))
def table_profile(spark, sf_dir):
    """One-pass column profiler (the Deequ profiler / df.describe
    shape): counts/nulls/distinct for every column plus min/max/mean
    for numerics, ALL metrics riding ONE aggregation over one scan —
    k columns cost O(k) agg expressions, not k jobs. The discovery
    half of the DQ surface (dq_report enforces, this describes)."""
    from mpes_spark.dq import profile_columns

    return profile_columns(
        _docs(spark, sf_dir), [c for c, _ in _PROFILE_COLS]
    )




@_q("boilerplate_flags", CU.boilerplate_stats_sql("documents"))
def boilerplate_flags(spark, sf_dir):
    """CCNet-style cross-doc segment dedup (Wenzek et al. 2020 §4.1):
    per-document boilerplate fraction, where a segment is boilerplate
    when >= 3 distinct docs of the same source contain it. Segments
    are fixed 8-token windows built in pure Catalyst (the corpus has
    no newlines; web corpora pass split(text, '\\n')); the cross-doc
    count shuffles 8-byte md5-family keys only and the flag join
    reuses that exchange. The column a curation pipeline strips or
    filters on before LM scoring."""
    from mpes_spark.extras.curation import boilerplate_stats

    return boilerplate_stats(_docs(spark, sf_dir))


@_q("shuffle_shard_manifest", CU.shuffle_shard_sql("documents"))
def shuffle_shard_manifest(spark, sf_dir):
    """Deterministic global shuffle + shard export map: every doc gets
    a (shard, pos) address that is a pure function of (seed, doc_id)
    — re-running the export bit-reproduces the epoch order, and
    in-shard order is a second independent hash draw, so crawl
    locality never survives into training batches. One projection +
    one per-shard window sort; the shard partitioning is exactly what
    the partitioned write uses."""
    from mpes_spark.extras.curation import shuffle_shard

    return shuffle_shard(_docs(spark, sf_dir))


@_q("length_bucket_packing", CU.length_bucket_batches_sql("documents"))
def length_bucket_packing(spark, sf_dir):
    """Length-bucketed batch packing: docs bucketed by token-length
    boundary, hash-ordered within bucket, cut into 16-doc batches;
    output is per-batch padding-waste — the metric that justifies
    bucketed batching over random batching. Shuffle keys on the
    |bounds|-ary bucket; hot short-text buckets are the documented
    salting point at scale."""
    from mpes_spark.extras.curation import length_bucket_batches

    return length_bucket_batches(_docs(spark, sf_dir))




@_q("lr_train_quality", CU.lr_train_quality_sql("documents"))
def lr_train_quality(spark, sf_dir):
    """TRAINED quality classifier under the hash gate (r9 late): 12
    full-batch logistic-regression GD steps over hashed presence
    features with a planted linearly-realizable label, fitted — and
    provably LEARNING: the gated n_correct row beats the majority
    baseline — ENTIRELY in the
    engine; the training loop the pretrained `quality_classifier`
    head assumes exists offline. Every recurrence stage (margin join-
    sum, sigmoid, gradient sum, weight update) is quantized to the
    1e-6 grid, so the unrolled-CTE oracle replays the whole fit
    bit-for-bit; driver traffic is 33 doubles per iteration (the
    k-means pattern), never data-sized."""
    return CU.lr_train_quality(_docs(spark, sf_dir))


@_q("kneser_ney_lm", SR.kneser_ney_scores_sql("documents"))
def kneser_ney_lm(spark, sf_dir):
    """Held-out interpolated Kneser-Ney bigram scoring (Kneser & Ney
    1995, Chen & Goodman 1999 — r9 late, completing the LM family
    next to add-alpha and Stupid Backoff): absolute discount D=0.75
    with the discount mass redistributed over the CONTINUATION
    distribution (distinct-left-context types, not raw frequency),
    add-alpha'd with one extra unk type so held-out OOV stays finite.
    Same scale shape as stupid_backoff_lm: vocab-bounded count/type
    aggs, three LEFT equi-joins on the held-out bigram stream, two
    1-row broadcasts, no UDFs."""
    from mpes_spark.extras.search import kneser_ney_scores

    return kneser_ney_scores(_docs(spark, sf_dir))


@_q("stupid_backoff_lm", SR.stupid_backoff_scores_sql("documents"))
def stupid_backoff_lm(spark, sf_dir):
    """Held-out Stupid Backoff trigram scoring (Brants et al. 2007
    §4 — the distributed-LM design: unnormalized count-ratio backoff
    c123/c12 -> 0.4·c23/c2 -> 0.16·c3/N -> OOV floor). Docs split
    90/10 by seeded hash; count tables train on the 90, the 10 are
    scored, so every backoff tier fires. Vocab-bounded count aggs +
    three LEFT equi-joins on the held-out trigram stream, no UDFs."""
    from mpes_spark.extras.search import stupid_backoff_scores

    return stupid_backoff_scores(_docs(spark, sf_dir))




@_q("jl_projection", SIM.jl_project_sql("embeddings"))
def jl_projection(spark, sf_dir):
    """Johnson-Lindenstrauss Rademacher projection (Achlioptas 2003):
    64 -> 8 dims via seeded +-1 sign literals inlined into both
    dialects — a stateless, shuffle-free, UDF-free projection pass
    that cuts downstream clustering/LSH shuffle bytes 8x within the
    JL distance bound. Each dim is the same left-to-right fold DuckDB
    runs, so the gate hash-matches bit-for-bit."""
    return SIM.jl_project(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    )



_DIVERSITY_SQL = (
    "WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n "
    "  FROM documents GROUP BY lang, source), "
    "tot AS (SELECT lang, sum(n) AS tn, "
    "  CAST(count(*) AS BIGINT) AS n_sources FROM c GROUP BY lang), "
    "sh AS (SELECT c.lang, c.n / tot.tn AS p, tot.n_sources, "
    "  row_number() OVER (PARTITION BY c.lang ORDER BY c.n, c.source) "
    "    AS rk, tot.tn "
    "  FROM c JOIN tot ON tot.lang = c.lang) "
    "SELECT lang, CAST(max(n_sources) AS BIGINT) AS n_sources, "
    "round(-sum(p * ln(p)), 6) AS shannon_entropy, "
    "round((2.0 * sum(rk * p) - (max(n_sources) + 1)) "
    "  / max(n_sources), 6) AS gini "
    "FROM sh GROUP BY lang"
)


@_q("source_diversity", _DIVERSITY_SQL)
def source_diversity(spark, sf_dir):
    """Corpus-balance diagnostics: per-language Shannon entropy and
    Gini coefficient of the source-share distribution — the numbers a
    mixing policy (temperature_mix, token_budget_mix) is judged by.
    Two bounded aggregations (|lang x source| then |lang|) plus a
    per-lang rank window over the tiny grid; the fact table is
    scanned once. Shares divide exact integer counts, so both
    engines rank and sum identical doubles (rounded at the edge)."""
    from pyspark.sql.window import Window as W

    c = (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = c.groupBy("lang").agg(
        F.sum("n").alias("tn"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    w = W.partitionBy("lang").orderBy("n", "source")
    sh = (
        c.join(tot, "lang")
        .withColumn("p", F.col("n") / F.col("tn"))
        .withColumn("rk", F.row_number().over(w))
    )
    return sh.groupBy("lang").agg(
        F.max("n_sources").cast("bigint").alias("n_sources"),
        F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias(
            "shannon_entropy"
        ),
        F.round(
            (2.0 * F.sum(F.col("rk") * F.col("p")) - (F.max("n_sources") + 1))
            / F.max("n_sources"),
            6,
        ).alias("gini"),
    )


# -- HTML -> text extraction (r9 late: the crawl pipeline's stage 0) -------

from mpes_spark.extras import html as HT  # noqa: E402


@_q(
    "html_extract_text",
    "SELECT doc_id, "
    f"{HT.html_to_text_sql(HT.wrap_as_html_sql('text'))} AS clean_text, "
    f"CAST(length({HT.html_to_text_sql(HT.wrap_as_html_sql('text'))}) "
    "AS BIGINT) AS n_chars FROM documents",
)
def html_extract_text(spark, sf_dir):
    """HTML -> text extraction under a STRING-EXACT hash gate (r9
    late): each document is wrapped into a deterministic synthetic
    page containing the hazards a rule extractor must survive —
    comments, a <script> holding fake tags inside string literals,
    <style> rules, nested inline tags, block structure, double-encoded
    entities — then extracted back by the shared transform chain
    (extras/html.py:_STEPS, rendered from ONE table into both the
    Catalyst expression and the DuckDB twin). The gate hashes the
    extracted STRING itself, so any dialect divergence in any of the
    14 steps flips the hash. Stateless JVM-side projection: no UDF,
    no shuffle, scan-pruning transparent — the 100 TB crawl-ingest
    stage 0."""
    docs = _docs(spark, sf_dir)
    clean = HT.html_to_text_expr(HT.wrap_as_html_expr(F.col("text")))
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("bigint").alias("n_chars"),
    )


def extras_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in _REGISTRY}


def extras_oracles() -> dict[str, str]:
    return {q.name: q.sql for q in _REGISTRY if q.sql is not None}
