"""Relevance ranking and statistical-LM quality scoring over the
documents table: BM25 keyword search and bigram-LM perplexity — the
retrieval / CC-Net-style-filtering half of the text-analysis pillar.

Scale shapes:
- BM25 for a fixed query (a handful of terms) is ONE corpus scan: the
  per-term tfs pivot into columns of a single groupBy(doc) aggregate,
  corpus statistics (N, avgdl, per-term df) reduce to one broadcast
  row, and the ranked top-k is a TakeOrderedAndProject — no global
  sort, no inverted-index materialization. (For ad-hoc many-term
  workloads you would materialize the (term, doc, tf) relation once,
  bucketed by term — same math, relational shape.)
- Perplexity scoring joins each doc's bigrams against corpus-wide
  count tables. Here the LM is trained and applied in one job
  (self-scoring, the oracle-checkable rendering); at 100 TB you train
  the counts on a sample once, prune to the top-V vocabulary, and
  broadcast the count tables — the scoring side is unchanged.

Both operators are pure DataFrame/SQL column math (no UDFs) with
DuckDB oracle twins.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QUERY: tuple[str, ...] = ("scan", "window", "join", "merge")

# ---------------------------------------------------------------------------
# BM25 (Robertson/Sparck Jones; idf per the Lucene rendering
# ln(1 + (N - df + 0.5)/(df + 0.5)), k1/b defaults 1.2/0.75)
# ---------------------------------------------------------------------------


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str] = DEFAULT_QUERY,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` docs by BM25 score for a bag of query ``terms``.

    Plan: explode tokens -> one groupBy(doc) computing doc length and
    a pivoted tf column per query term (map-side combined, one
    shuffle) -> one 1-row corpus-stats aggregate (N, avgdl, per-term
    df) collected and inlined as literals -> score arithmetic over
    the cached per-doc relation -> ordered limit
    (TakeOrderedAndProject). Ties broken by (rounded score desc, id)
    for cross-engine determinism.
    """
    toks = docs.select(F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("t"))
    # per_doc feeds BOTH the 1-row stats aggregate and the scoring
    # join; persist the doc-sized relation so the token-stream explode
    # + groupBy runs once, not once per consumer (per_doc is one row
    # per doc — corpus-row-sized, far smaller than the token stream)
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("t") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    ).persist()
    # the corpus statistics reduce to ONE row — collect it and inline
    # the values as literals (bounded driver collect, like the config
    # lookups elsewhere): halves the job count vs a broadcast
    # crossJoin, and the scoring pass reads only the cached per_doc
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        n_docs, dfi = float(stats["n_docs"]), float(stats[f"df_{i}"])
        idf = F.lit(math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5)))
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(stats["avgdl"]))
        score = score + idf * tf * (k1 + 1.0) / denom
    return (
        per_doc.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), id_col)
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    terms: Sequence[str] = DEFAULT_QUERY,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical pivoted shape."""
    tfs = ", ".join(
        f"sum(CASE WHEN t = '{t}' THEN 1 ELSE 0 END) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5)) "
        f"* CAST(tf_{i} AS DOUBLE) * ({k1!r} + 1.0) "
        f"/ (CAST(tf_{i} AS DOUBLE) + {k1!r} * (1.0 - {b!r} + {b!r} * dl / avgdl))"
        for i in range(len(terms))
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split(text, ' ')) AS t FROM {table}
),
per_doc AS (
  SELECT {id_col}, count(*) AS dl, {tfs} FROM toks GROUP BY {id_col}
),
stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl, {dfs} FROM per_doc
)
SELECT {id_col}, round({contribs}, 6) AS bm25
FROM per_doc, stats
WHERE round({contribs}, 6) > 0
ORDER BY bm25 DESC, {id_col} LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# bigram LM perplexity (add-alpha smoothing) — the CC-Net-shape
# quality signal: low perplexity under a corpus LM ~ fluent text
# ---------------------------------------------------------------------------


def lm_perplexity_per_doc(
    docs: DataFrame,
    alpha: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
    keep: Sequence[str] = ("source",),
) -> DataFrame:
    """Per-document bigram-LM perplexity ``exp(-avg ln P(w2|w1))``
    with add-``alpha`` smoothed ``P(w2|w1) = (c(w1 w2) + alpha) /
    (c(w1) + alpha * V)``. Returns (id, *keep, ppl) — the shared core
    of the per-source profile and the CC-Net bucket split.

    The count tables are corpus-wide groupBys (train step); scoring
    joins each doc bigram to its counts — both joins equi-keyed on
    the n-gram, the count side orders of magnitude smaller than the
    event side so AQE broadcasts it. Docs with < 2 tokens have no
    bigrams and are excluded (matching the SQL twins' inner joins).
    """
    toks = docs.select(F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.countDistinct("w").alias("V"))
    # project the token array ONCE — referencing split() inside the
    # transform lambda re-evaluates it per element (no CSE across a
    # lambda boundary). Guard size >= 2: Spark's sequence(0, -1)
    # counts DOWN, so a 1-token doc would fabricate bigrams.
    keep = list(keep)
    two = (
        docs.select(
            F.col(id_col), *[F.col(c) for c in keep], F.split(F.col(text), " ").alias("ws")
        )
        .filter(F.size("ws") >= 2)
        .select(
            id_col,
            *keep,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2), "
                    "i -> struct(element_at(ws, i + 1) AS w1, "
                    "concat_ws(' ', slice(ws, i + 1, 2)) AS pair))"
                )
            ).alias("bg"),
        )
        .select(id_col, *keep, F.col("bg.w1").alias("w1"), F.col("bg.pair").alias("pair"))
    )
    bi = two.groupBy("pair").agg(F.count(F.lit(1)).alias("c2"))
    # fold both count tables into one pair-keyed stats relation, so
    # the event-scale bigram stream pays ONE equi-join, not two
    stats = bi.withColumn("w1", F.split(F.col("pair"), " ")[0]).join(uni, uni.w == F.col("w1")).select(
        "pair", "c2", "c1"
    )
    ll = F.log(
        (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("V"))
    )
    return (
        two.drop("w1")
        .join(stats, "pair")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col, *keep)
        .agg(F.exp(-F.avg(ll)).alias("ppl"))
    )


def lm_perplexity_by_source(
    docs: DataFrame,
    alpha: float = 0.5,
    ppl_threshold: float = 100.0,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source bigram-LM perplexity profile (see
    :func:`lm_perplexity_per_doc` for the LM itself): (source,
    n_docs, avg/min/max ppl, n_above threshold)."""
    per_doc = lm_perplexity_per_doc(docs, alpha, text, id_col, keep=("source",))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("ppl"), 6).alias("avg_ppl"),
        F.round(F.min("ppl"), 6).alias("min_ppl"),
        F.round(F.max("ppl"), 6).alias("max_ppl"),
        F.sum(F.when(F.round(F.col("ppl"), 6) > ppl_threshold, 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
    )


def lm_perplexity_by_source_sql(
    table: str,
    alpha: float = 0.5,
    ppl_threshold: float = 100.0,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`lm_perplexity_by_source`."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split(text, ' ')) AS w FROM {table}
),
uni AS (SELECT w, count(*) AS c1 FROM toks GROUP BY w),
vocab AS (SELECT count(DISTINCT w) AS V FROM toks),
two AS (
  SELECT {id_col}, source, ws[i + 1] AS w1,
         array_to_string(ws[i + 1: i + 2], ' ') AS pair
  FROM (SELECT {id_col}, source, string_split(text, ' ') AS ws FROM {table}) s,
       unnest(range(len(ws) - 1)) AS r(i)
),
bi AS (SELECT pair, count(*) AS c2 FROM two GROUP BY pair),
per_doc AS (
  SELECT t.{id_col}, t.source,
         exp(-avg(ln((bi.c2 + {alpha!r}) / (uni.c1 + {alpha!r} * vocab.V)))) AS ppl
  FROM two t
  JOIN bi ON bi.pair = t.pair
  JOIN uni ON uni.w = t.w1
  CROSS JOIN vocab
  GROUP BY t.{id_col}, t.source
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 6) AS avg_ppl,
       round(min(ppl), 6) AS min_ppl,
       round(max(ppl), 6) AS max_ppl,
       CAST(sum(CASE WHEN round(ppl, 6) > {ppl_threshold!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above
FROM per_doc GROUP BY source
""".strip()


# ---------------------------------------------------------------------------
# CC-Net perplexity buckets (Wenzek et al. 2020: per-language
# head/middle/tail split by LM perplexity)
# ---------------------------------------------------------------------------


def _lm_per_doc_cte(
    table: str, alpha: float, by: str, id_col: str = "doc_id"
) -> str:
    """DuckDB CTE chain producing per_doc(id, {by}, ppl) — the oracle
    twin of :func:`lm_perplexity_per_doc`."""
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split(text, ' ')) AS w FROM {table}
),
uni AS (SELECT w, count(*) AS c1 FROM toks GROUP BY w),
vocab AS (SELECT count(DISTINCT w) AS V FROM toks),
two AS (
  SELECT {id_col}, {by}, ws[i + 1] AS w1,
         array_to_string(ws[i + 1: i + 2], ' ') AS pair
  FROM (SELECT {id_col}, {by}, string_split(text, ' ') AS ws FROM {table}) s,
       unnest(range(len(ws) - 1)) AS r(i)
),
bi AS (SELECT pair, count(*) AS c2 FROM two GROUP BY pair),
per_doc AS (
  SELECT t.{id_col}, t.{by},
         exp(-avg(ln((bi.c2 + {alpha!r}) / (uni.c1 + {alpha!r} * vocab.V)))) AS ppl
  FROM two t
  JOIN bi ON bi.pair = t.pair
  JOIN uni ON uni.w = t.w1
  CROSS JOIN vocab
  GROUP BY t.{id_col}, t.{by}
)""".strip()


def perplexity_buckets(
    docs: DataFrame,
    nbuckets: int = 3,
    alpha: float = 0.5,
    by: str = "lang",
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CC-Net-style perplexity bucketing (Wenzek et al. 2020 §4.3):
    within each language, rank documents by LM perplexity and cut
    into ``nbuckets`` equal-frequency buckets — bucket 1 is the
    "head" (most fluent), bucket ``nbuckets`` the "tail". CC-Net
    keeps head+middle for LM pretraining; the bucket id is the
    curation signal. Output: ({by}, bucket, n_docs, avg/min/max ppl).

    The rank is ``ntile`` over (round(ppl, 6), id) inside each
    language partition — parallel across languages, deterministic
    ties, identically expressible in the oracle dialect. At 100 TB
    an exact per-language sort of all docs is the textbook quantile
    problem; the production path is
    :func:`perplexity_buckets_sampled` (approx_percentile thresholds,
    no sort — same downstream semantics) and this exact split is its
    oracle-checkable twin."""
    from pyspark.sql import Window

    per = lm_perplexity_per_doc(docs, alpha, text, id_col, keep=(by,))
    w = Window.partitionBy(by).orderBy(F.round(F.col("ppl"), 6), F.col(id_col))
    return (
        per.withColumn("bucket", F.ntile(nbuckets).over(w).cast("int"))
        .groupBy(by, "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
            F.round(F.min("ppl"), 6).alias("min_ppl"),
            F.round(F.max("ppl"), 6).alias("max_ppl"),
        )
    )


def perplexity_bucket_assignments(
    docs: DataFrame,
    nbuckets: int = 3,
    alpha: float = 0.5,
    by: str = "lang",
    text: str = "text",
    id_col: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """Production CC-Net bucketing: per-``by`` bucket THRESHOLDS from
    one ``approx_percentile`` sketch aggregation (Greenwald-Khanna;
    map-side combined, error <= 1/accuracy of rank), broadcast back,
    bucket = 1 + #thresholds below ppl. No per-language sort anywhere
    — the exact-ntile rendering (:func:`perplexity_buckets`) is the
    oracle twin; this is the shape that survives 100 TB, where an
    exact per-language ntile means totally sorting every language
    partition. Documents tied exactly at a threshold all land in the
    lower bucket (ntile splits such ties arbitrarily by id), so the
    two renderings disagree only within sketch error of the cut
    points — bounded by the disagreement-rate test.

    Returns per-document ``({by}, {id_col}, ppl, bucket)``."""
    fracs = [i / nbuckets for i in range(1, nbuckets)]
    per = lm_perplexity_per_doc(docs, alpha, text, id_col, keep=(by,))
    thr = per.groupBy(by).agg(
        F.percentile_approx(
            "ppl", F.array(*[F.lit(f) for f in fracs]), F.lit(accuracy)
        ).alias("thr")
    )
    bucket = F.lit(1) + F.aggregate(
        F.col("thr"),
        F.lit(0),
        lambda acc, t: acc + F.when(F.col("ppl") > t, 1).otherwise(0),
    )
    return (
        per.join(F.broadcast(thr), by)
        .select(by, id_col, "ppl", bucket.cast("int").alias("bucket"))
    )


def perplexity_buckets_sampled(
    docs: DataFrame,
    nbuckets: int = 3,
    alpha: float = 0.5,
    by: str = "lang",
    text: str = "text",
    id_col: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """Aggregate rendering of :func:`perplexity_bucket_assignments` —
    same output schema as :func:`perplexity_buckets` (({by}, bucket,
    n_docs, avg/min/max ppl)) with sampled thresholds instead of an
    exact per-language ntile sort."""
    return (
        perplexity_bucket_assignments(
            docs, nbuckets, alpha, by, text, id_col, accuracy
        )
        .groupBy(by, "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ppl"), 6).alias("avg_ppl"),
            F.round(F.min("ppl"), 6).alias("min_ppl"),
            F.round(F.max("ppl"), 6).alias("max_ppl"),
        )
    )


def perplexity_buckets_sql(
    table: str,
    nbuckets: int = 3,
    alpha: float = 0.5,
    by: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`perplexity_buckets`."""
    return f"""
{_lm_per_doc_cte(table, alpha, by, id_col)}
SELECT {by}, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 6) AS avg_ppl,
       round(min(ppl), 6) AS min_ppl,
       round(max(ppl), 6) AS max_ppl
FROM (
  SELECT {by}, ppl,
         ntile({nbuckets}) OVER (PARTITION BY {by}
                                 ORDER BY round(ppl, 6), {id_col}) AS bucket
  FROM per_doc
) b GROUP BY {by}, bucket
""".strip()


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (Sparck Jones 1972; sklearn-style smooth
# idf = ln((1 + N) / (1 + df)) + 1)
# ---------------------------------------------------------------------------


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF — the corpus-analysis /
    keyword-extraction staple. tf is the in-doc term count, idf the
    smoothed ``ln((1 + N) / (1 + df)) + 1``; ties rank by term text.

    Scale shape: one explode -> (doc, term) count agg; df falls out
    of the SAME relation (every (doc, term) row is distinct by
    construction) as a second small agg; N reduces to one broadcast
    row. The per-doc top-k is a row_number window partitioned by doc
    — millions of independent partitions, no global sort. The only
    full-corpus shuffles are the two term aggs."""
    from pyspark.sql import Window

    tf = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("N"))
    score = F.col("tf") * (
        F.log((F.lit(1.0) + F.col("N")) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round(score, 6).desc(), F.col("term")
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("tf").cast("bigint").alias("tf"), "score", "rank")
    )


def tfidf_topk_sql(table: str, k: int = 3, id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`tfidf_topk`."""
    return f"""
WITH tf AS (
  SELECT {id_col}, unnest(string_split(text, ' ')) AS term FROM {table}
),
tfc AS (SELECT {id_col}, term, count(*) AS tf FROM tf GROUP BY {id_col}, term),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
n AS (SELECT count(*) AS N FROM {table}),
scored AS (
  SELECT t.{id_col}, t.term, t.tf,
         round(t.tf * (ln((1.0 + n.N) / (1.0 + d.df)) + 1.0), 6) AS score
  FROM tfc t JOIN dfc d ON d.term = t.term CROSS JOIN n
)
SELECT {id_col}, term, CAST(tf AS BIGINT) AS tf, score,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY {id_col}
                               ORDER BY score DESC, term) AS rank
  FROM scored
) r WHERE rank <= {k}
""".strip()


# ---------------------------------------------------------------------------
# PMI collocation mining (Church & Hanks 1990)
# ---------------------------------------------------------------------------


def pmi_topk(
    docs: DataFrame,
    k: int = 30,
    min_count: int = 5,
    text: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent word pairs by pointwise mutual information —
    the collocation / phrase-mining staple (Church & Hanks 1990):
    ``pmi(x, y) = ln( p(x, y) / (p(x) p(y)) )`` with ``p(x, y)`` over
    the corpus bigram stream and ``p(x)`` over the token stream.
    Pairs below ``min_count`` are dropped (PMI's low-frequency bias).

    Scale shape: bigrams are built ROW-LOCAL as an array column
    (:func:`~mpes_spark.extras.text.word_ngrams_expr` — no
    per-position shuffle, no self-join on token offsets), then one
    explode -> groupBy(bigram) count and one explode -> groupBy(word)
    count, each a single map-side-combined shuffle bounded by vocab
    size, not corpus size. The unigram relation joins back twice and
    is vocab-bounded -> broadcast; the two grand totals reduce to
    one-row broadcasts RIDING the count relations' exchanges — the
    executed plan carries 2 AQE ReusedExchange nodes, so the totals
    cost no extra corpus work at runtime (r11: rewriting them as
    scan-only sum(size(grams)) folds was tried and REVERTED — it
    replaced two reused-exchange reads with two REAL extra corpus
    scans). The final top-k is an ordered limit
    (TakeOrderedAndProject), never a global sort. Ties rank by
    (pmi desc, w1, w2) for cross-engine determinism.
    """
    from mpes_spark.extras.text import word_ngrams_expr

    bic = (
        docs.select(F.explode(word_ngrams_expr(2, text)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    unic = (
        docs.select(F.explode(F.split(F.col(text), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t_bi = bic.agg(F.sum("c_xy").alias("t_bi"))
    t_uni = unic.agg(F.sum("c").alias("t_uni"))
    parts = F.split(F.col("bigram"), " ")
    pmi = F.log(
        (F.col("c_xy") / F.col("t_bi"))
        / ((F.col("c1") / F.col("t_uni")) * (F.col("c2") / F.col("t_uni")))
    )
    return (
        bic.filter(F.col("c_xy") >= min_count)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(F.broadcast(unic.select(F.col("w").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(unic.select(F.col("w").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(t_bi))
        .crossJoin(F.broadcast(t_uni))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def pmi_topk_sql(
    table: str,
    k: int = 30,
    min_count: int = 5,
    text: str = "text",
) -> str:
    """DuckDB twin of :func:`pmi_topk` (row-local bigram list via
    the same :func:`~mpes_spark.extras.text.word_ngrams_sql` shape)."""
    from mpes_spark.extras.text import word_ngrams_sql

    grams = word_ngrams_sql(2, text)
    return f"""
WITH bic AS (
  SELECT bigram, count(*) AS c_xy
  FROM (SELECT unnest({grams}) AS bigram FROM {table})
  GROUP BY bigram
),
unic AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split({text}, ' ')) AS w FROM {table})
  GROUP BY w
),
tb AS (SELECT sum(c_xy) AS t_bi FROM bic),
tu AS (SELECT sum(c) AS t_uni FROM unic)
SELECT string_split(b.bigram, ' ')[1] AS w1,
       string_split(b.bigram, ' ')[2] AS w2,
       CAST(b.c_xy AS BIGINT) AS c_xy,
       round(ln((b.c_xy / tb.t_bi)
                / ((u1.c / tu.t_uni) * (u2.c / tu.t_uni))), 6) AS pmi
FROM bic b
JOIN unic u1 ON u1.w = string_split(b.bigram, ' ')[1]
JOIN unic u2 ON u2.w = string_split(b.bigram, ' ')[2]
CROSS JOIN tb CROSS JOIN tu
WHERE b.c_xy >= {min_count}
ORDER BY pmi DESC, w1, w2
LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal rank fusion (Cormack et al. 2009)
# ---------------------------------------------------------------------------


def hybrid_rrf(
    docs: DataFrame,
    embs: DataFrame,
    terms: Sequence[str] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    k: int = 10,
    depth: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+dense retrieval: fuse the BM25 top-``depth``
    list and the embedding-cosine top-``depth`` list with reciprocal
    rank fusion, ``rrf = sum over lists of 1 / (rrf_k + rank)``
    (Cormack et al. 2009; ``rrf_k = 60`` per the paper). A doc absent
    from one list contributes 0 from it — the standard outer-union
    semantics.

    Scale shape: each arm is its own already-scaled plan (pivoted
    single-scan BM25; broadcast-query brute cosine — swap in the
    IVF/PQ path for billion-vector corpora). The fusion then operates
    on two DEPTH-bounded relations (depth ~ 10^2), so the rank
    windows and the full-outer join are constant-size tails — the
    single-partition window here is bounded by ``depth``, never by
    the corpus."""
    from pyspark.sql import Window

    from mpes_spark.extras.similarity import topk_cosine

    b = bm25_topk(docs, terms, k=depth, id_col=id_col)
    wb = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    b = b.select(
        F.col(id_col), F.row_number().over(wb).cast("bigint").alias("rank_b")
    )
    c = topk_cosine(
        embs, embs.filter(F.col(vec_id_col) == query_vec_id), k=depth,
        id_col=vec_id_col,
    ).select(F.col("neighbor_id").alias(id_col), F.col("rank").alias("rank_c"))
    fused = (
        b.join(c, id_col, "full_outer")
        .select(
            id_col,
            "rank_b",
            "rank_c",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_b")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_c")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )
    return fused


def hybrid_rrf_sql(
    doc_table: str,
    emb_table: str,
    terms: Sequence[str] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    k: int = 10,
    depth: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`hybrid_rrf` — composes the two arm
    oracles (:func:`bm25_topk_sql`,
    :func:`~mpes_spark.extras.similarity.topk_cosine_sql`) and fuses
    identically."""
    from mpes_spark.extras.similarity import topk_cosine_sql

    bm = bm25_topk_sql(doc_table, terms, k=depth, id_col=id_col)
    cos = topk_cosine_sql(
        emb_table, f"{vec_id_col} = {query_vec_id}", k=depth, id_col=vec_id_col
    )
    return f"""
WITH b AS (
  SELECT {id_col},
         CAST(row_number() OVER (ORDER BY bm25 DESC, {id_col}) AS BIGINT) AS rank_b
  FROM ({bm})
),
c AS (
  SELECT neighbor_id AS {id_col}, rank AS rank_c FROM ({cos})
)
SELECT COALESCE(b.{id_col}, c.{id_col}) AS {id_col}, b.rank_b, c.rank_c,
       round(COALESCE(1.0 / ({rrf_k} + b.rank_b), 0.0)
             + COALESCE(1.0 / ({rrf_k} + c.rank_c), 0.0), 6) AS rrf
FROM b FULL OUTER JOIN c ON c.{id_col} = b.{id_col}
ORDER BY rrf DESC, COALESCE(b.{id_col}, c.{id_col})
LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# retrieval evaluation (recall@k / MRR@k / nDCG@k — Järvelin &
# Kekäläinen 2002 for DCG; the offline eval loop of every retrieval
# pipeline)
# ---------------------------------------------------------------------------


def retrieval_metrics(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    qid: str = "query_id",
    doc: str = "neighbor_id",
    rel: str = "rel",
    rank: str = "rank",
) -> DataFrame:
    """Per-query retrieval quality: ``(qid, n_rel, recall_k, rr_k,
    ndcg_k)`` from a ranking relation (qid, doc, rank 1-based) and a
    graded relevance relation (qid, doc, rel > 0 for relevant).

    - recall@k = |relevant ∩ top-k| / |relevant| (standard: the full
      relevant count in the denominator);
    - RR@k = 1/rank of the first relevant hit in the top-k, 0 if none
      (macro-average over queries = MRR);
    - nDCG@k with linear gains: DCG = sum rel/log2(rank+1) over top-k
      hits, IDCG over the ideal (rel-descending) ordering truncated at
      k. Tie order among equal rels can't change IDCG.

    Queries with no relevant docs are excluded (their metrics are
    undefined — 0/0). Scale shape: two qid-keyed aggregations plus one
    (qid, doc) equi-join; the ranking relation is already k-bounded
    per query, the relevance relation is judgment-sized — nothing here
    ever touches the corpus. Macro averages are one further
    1-row agg over the per-query output.

    Fusing n_rel + ideal-DCG into one windowed pass was tried and
    REVERTED in r11: the n_rel and ideal consumers take the relevance
    subtree UNMODIFIED, so AQE reuses the exchange at runtime
    (2 ReusedExchange in the executed plan) — the fusion replaced a
    map-side-combined count with full-row window traffic and the
    driver bench measured it at +32%."""
    from pyspark.sql import Window

    rk = ranking.filter(F.col(rank) <= k).select(
        F.col(qid), F.col(doc), F.col(rank)
    )
    rl = relevance.filter(F.col(rel) > 0).select(
        F.col(qid), F.col(doc), F.col(rel).cast("double").alias("_rel")
    )
    n_rel = rl.groupBy(qid).agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    hits = rk.join(rl, [qid, doc])
    per_q = hits.groupBy(qid).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min(rank).alias("first_rank"),
        F.sum(F.col("_rel") / F.log2(F.col(rank) + 1)).alias("dcg"),
    )
    wi = Window.partitionBy(qid).orderBy(F.col("_rel").desc(), F.col(doc))
    ideal = (
        rl.withColumn("irk", F.row_number().over(wi))
        .filter(F.col("irk") <= k)
        .groupBy(qid)
        .agg(F.sum(F.col("_rel") / F.log2(F.col("irk") + 1)).alias("idcg"))
    )
    return (
        n_rel.join(per_q, qid, "left")
        .join(ideal, qid)
        .select(
            qid,
            "n_rel",
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)), 6
            ).alias("rr_k"),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6
            ).alias("ndcg_k"),
        )
    )


def retrieval_metrics_sql(
    ranking_sql: str,
    relevance_sql: str,
    k: int = 10,
    qid: str = "query_id",
    doc: str = "neighbor_id",
) -> str:
    """DuckDB twin of :func:`retrieval_metrics` — ``ranking_sql``
    yields (qid, doc, rank), ``relevance_sql`` yields (qid, doc, rel)."""
    return f"""
WITH rk AS (SELECT {qid}, {doc}, rank FROM ({ranking_sql}) r WHERE rank <= {k}),
rl AS (SELECT {qid}, {doc}, CAST(rel AS DOUBLE) AS _rel
       FROM ({relevance_sql}) x WHERE rel > 0),
nr AS (SELECT {qid}, CAST(count(*) AS BIGINT) AS n_rel FROM rl GROUP BY {qid}),
hits AS (SELECT rk.{qid}, rk.rank, rl._rel
         FROM rk JOIN rl ON rl.{qid} = rk.{qid} AND rl.{doc} = rk.{doc}),
pq AS (SELECT {qid}, count(*) AS n_hits, min(rank) AS first_rank,
              sum(_rel / log2(rank + 1)) AS dcg
       FROM hits GROUP BY {qid}),
ideal AS (SELECT {qid}, sum(_rel / log2(irk + 1)) AS idcg FROM (
    SELECT {qid}, _rel, row_number() OVER (
      PARTITION BY {qid} ORDER BY _rel DESC, {doc}) AS irk FROM rl) i
  WHERE irk <= {k} GROUP BY {qid})
SELECT nr.{qid}, nr.n_rel,
  round(coalesce(pq.n_hits, 0) / nr.n_rel, 6) AS recall_k,
  round(coalesce(1.0 / pq.first_rank, 0.0), 6) AS rr_k,
  round(coalesce(pq.dcg, 0.0) / ideal.idcg, 6) AS ndcg_k
FROM nr LEFT JOIN pq ON pq.{qid} = nr.{qid}
JOIN ideal ON ideal.{qid} = nr.{qid}
""".strip()


# ---------------------------------------------------------------------------
# Stupid Backoff trigram LM (Brants et al. 2007, "Large Language
# Models in Machine Translation" §4) — the distributed-LM scoring
# shape: count tables from a train split, held-out docs scored with
# backoff chains c3/c12 -> 0.4*c23/c2 -> 0.4^2*c3u/N -> 0.4^3/N.
# ---------------------------------------------------------------------------

_SB_SEED = 9173
_SB_LAMBDA = 0.4


def _sb_split_test_expr(seed: int, id_col: str) -> Column:
    from mpes_spark.extras.dedup import _md5_hash_sql

    h = F.expr(_md5_hash_sql(seed, f"CAST({id_col} AS STRING)", "spark"))
    return F.pmod(h, F.lit(10)) == 0


def stupid_backoff_scores(
    docs: DataFrame,
    lam: float = _SB_LAMBDA,
    seed: int = _SB_SEED,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out Stupid Backoff scoring (Brants et al. 2007 §4: the
    score S(w3|w1 w2) = c123/c12 when the trigram was seen, else
    lam * c23/c2, else lam^2 * c3/N, else lam^3/N for OOV — no
    normalization, which is exactly what makes the model trainable
    as plain count tables at web scale). Docs are split 90/10 by a
    seeded hash draw; counts come from the train split only, so the
    held-out docs genuinely exercise every backoff tier. Returns one
    row per test doc (>= 3 tokens): (doc_id, n_trigrams,
    avg_logscore) — the held-out fluency signal a curation pipeline
    thresholds on.

    Scale shape: the three count tables are vocab-bounded groupBys
    with map-side combine; scoring joins the held-out trigram stream
    to them with three LEFT equi-joins (count side far smaller ->
    AQE broadcasts); N is a 1-row broadcast. Everything stays in
    whole-stage codegen — no UDFs. At 100 TB the n-gram join keys
    would be xxhash64-compressed to 8 bytes; the oracle keeps the
    raw strings so DuckDB replays bit-for-bit."""
    is_test = _sb_split_test_expr(seed, id_col)
    base = docs.select(
        F.col(id_col), F.split(F.col(text), " ").alias("ws"), is_test.alias("is_test")
    )
    train = base.filter(~F.col("is_test"))
    toks = train.select(F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("N"))
    two = train.filter(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> concat_ws(' ', slice(ws, i + 1, 2)))"
            )
        ).alias("pair")
    )
    bi = two.groupBy("pair").agg(F.count(F.lit(1)).alias("c2"))
    three = train.filter(F.size("ws") >= 3).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> concat_ws(' ', slice(ws, i + 1, 3)))"
            )
        ).alias("tri")
    )
    tri = three.groupBy("tri").agg(F.count(F.lit(1)).alias("c3"))

    pos = base.filter(F.col("is_test") & (F.size("ws") >= 3)).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 3), "
                "i -> struct("
                "concat_ws(' ', slice(ws, i + 1, 3)) AS tri, "
                "concat_ws(' ', slice(ws, i + 1, 2)) AS b12, "
                "concat_ws(' ', slice(ws, i + 2, 2)) AS b23, "
                "element_at(ws, i + 2) AS w2, "
                "element_at(ws, i + 3) AS w3))"
            )
        ).alias("g"),
    ).select(id_col, "g.tri", "g.b12", "g.b23", "g.w2", "g.w3")

    b12 = bi.select(F.col("pair").alias("b12"), F.col("c2").alias("c12"))
    b23 = bi.select(F.col("pair").alias("b23"), F.col("c2").alias("c23"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c1").alias("c2u"))
    u3 = uni.select(F.col("w").alias("w3"), F.col("c1").alias("c3u"))
    j = (
        pos.join(tri, "tri", "left")
        .join(b12, "b12", "left")
        .join(b23, "b23", "left")
        .join(u2, "w2", "left")
        .join(u3, "w3", "left")
        .crossJoin(F.broadcast(total))
    )
    score = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c12"))
        .when(F.col("c23").isNotNull(), lam * F.col("c23") / F.col("c2u"))
        .when(F.col("c3u").isNotNull(), lam * lam * F.col("c3u") / F.col("N"))
        .otherwise(F.lit(lam**3) / F.col("N"))
    )
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        F.round(F.avg(F.log(score)), 6).alias("avg_logscore"),
    )


def stupid_backoff_scores_sql(
    table: str = "documents",
    lam: float = _SB_LAMBDA,
    seed: int = _SB_SEED,
    id_col: str = "doc_id",
) -> str:
    from mpes_spark.extras.dedup import _md5_hash_sql

    h = _md5_hash_sql(seed, f"CAST({id_col} AS VARCHAR)", "duckdb")
    return f"""
WITH base AS (
  SELECT {id_col}, string_split(text, ' ') AS ws,
         ({h}) % 10 = 0 AS is_test
  FROM {table}
),
toks AS (SELECT unnest(ws) AS w FROM base WHERE NOT is_test),
uni AS (SELECT w, count(*) AS c1 FROM toks GROUP BY w),
total AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM toks),
two AS (
  SELECT array_to_string(ws[i + 1: i + 2], ' ') AS pair
  FROM (SELECT ws FROM base WHERE NOT is_test AND len(ws) >= 2) s,
       unnest(range(len(ws) - 1)) AS r(i)
),
bi AS (SELECT pair, count(*) AS c2 FROM two GROUP BY pair),
three AS (
  SELECT array_to_string(ws[i + 1: i + 3], ' ') AS tri
  FROM (SELECT ws FROM base WHERE NOT is_test AND len(ws) >= 3) s,
       unnest(range(len(ws) - 2)) AS r(i)
),
tric AS (SELECT tri, count(*) AS c3 FROM three GROUP BY tri),
pos AS (
  SELECT {id_col},
         array_to_string(ws[i + 1: i + 3], ' ') AS tri,
         array_to_string(ws[i + 1: i + 2], ' ') AS b12,
         array_to_string(ws[i + 2: i + 3], ' ') AS b23,
         ws[i + 2] AS w2, ws[i + 3] AS w3
  FROM (SELECT {id_col}, ws FROM base WHERE is_test AND len(ws) >= 3) s,
       unnest(range(len(ws) - 2)) AS r(i)
),
j AS (
  SELECT p.{id_col},
         CASE WHEN t.c3 IS NOT NULL THEN t.c3 / b1.c2
              WHEN b2.c2 IS NOT NULL THEN CAST('{lam!r}' AS DOUBLE) * b2.c2 / u2.c1
              WHEN u3.c1 IS NOT NULL THEN CAST('{lam * lam!r}' AS DOUBLE) * u3.c1 / total.N
              ELSE CAST('{lam**3!r}' AS DOUBLE) / total.N END AS s
  FROM pos p
  LEFT JOIN tric t ON t.tri = p.tri
  LEFT JOIN bi b1 ON b1.pair = p.b12
  LEFT JOIN bi b2 ON b2.pair = p.b23
  LEFT JOIN uni u2 ON u2.w = p.w2
  LEFT JOIN uni u3 ON u3.w = p.w3
  CROSS JOIN total
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(ln(s)), 6) AS avg_logscore
FROM j GROUP BY {id_col}
""".strip()


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; the Chen &
# Goodman 1999 interpolated formulation) — the standard n-gram
# smoother, completing the LM family next to add-alpha and Stupid
# Backoff: the lower-order distribution is the CONTINUATION
# distribution (how many distinct contexts a word follows), not raw
# frequency, which is what makes "San Francisco"-style words stop
# leaking probability mass to "Francisco" after unseen contexts.
# ---------------------------------------------------------------------------

_KN_SEED = 5741
_KN_DISCOUNT = 0.75
_KN_ALPHA = 0.5


def kneser_ney_scores(
    docs: DataFrame,
    discount: float = _KN_DISCOUNT,
    alpha: float = _KN_ALPHA,
    seed: int = _KN_SEED,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Held-out interpolated-KN bigram scoring. With c12 = train count
    of (w1 w2), c1 = total bigram count of context w1, R(w1) = distinct
    right types after w1, L(w2) = distinct left types before w2, B =
    total distinct bigram types, V = train vocab size:

        P_cont(w2)  = (L(w2) + alpha) / (B + alpha * (V + 1))
        P(w2 | w1)  = max(c12 - D, 0)/c1 + (D * R(w1)/c1) * P_cont(w2)
                      (unseen context w1 -> P_cont(w2) alone)

    The continuation distribution carries add-``alpha`` mass with
    V + 1 types so held-out OOV words score finite — the one extra
    type IS the unk bucket; inside the seen region this is exact
    interpolated KN with absolute discount ``D``. Docs split 90/10 by
    the same seeded md5 draw as Stupid Backoff (different seed), so
    every tier — seen bigram, unseen bigram in seen context, unseen
    context, OOV word — genuinely fires on the held-out side.

    Scale shape: identical to :func:`stupid_backoff_scores` — count
    and type tables are vocab-bounded groupBys with map-side combine
    (R and L are per-key COUNTS of the bigram relation, never
    collected lists); scoring is three LEFT equi-joins against the
    held-out bigram stream (count side far smaller -> AQE broadcasts)
    plus two 1-row broadcasts. No UDFs, whole-stage codegen."""
    is_test = _sb_split_test_expr(seed, id_col)
    base = docs.select(
        F.col(id_col), F.split(F.col(text), " ").alias("ws"), is_test.alias("is_test")
    )
    pairs = F.explode(
        F.expr(
            "transform(sequence(0, size(ws) - 2), "
            "i -> struct(element_at(ws, i + 1) AS w1, "
            "element_at(ws, i + 2) AS w2))"
        )
    )
    train2 = (
        base.filter(~F.col("is_test"))
        .filter(F.size("ws") >= 2)
        .select(pairs.alias("g"))
        .select("g.w1", "g.w2")
    )
    bi = train2.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("rtypes")
    )
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("ltypes"))
    btot = bi.agg(F.count(F.lit(1)).cast("double").alias("B"))
    vocab = (
        base.filter(~F.col("is_test"))
        .select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("V"))
    )
    pos = (
        base.filter(F.col("is_test") & (F.size("ws") >= 2))
        .select(F.col(id_col), pairs.alias("g"))
        .select(id_col, "g.w1", "g.w2")
    )
    j = (
        pos.join(bi, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(vocab))
    )
    pcont = (F.coalesce(F.col("ltypes"), F.lit(0)) + F.lit(alpha)) / (
        F.col("B") + F.lit(alpha) * (F.col("V") + F.lit(1.0))
    )
    seen = (
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - F.lit(discount), F.lit(0.0))
        / F.col("c1")
        + (F.lit(discount) * F.col("rtypes") / F.col("c1")) * pcont
    )
    score = F.when(F.col("c1").isNotNull(), seen).otherwise(pcont)
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg(F.log(score)), 6).alias("avg_logprob"),
    )


def kneser_ney_scores_sql(
    table: str = "documents",
    discount: float = _KN_DISCOUNT,
    alpha: float = _KN_ALPHA,
    seed: int = _KN_SEED,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`kneser_ney_scores` — per-row score
    expressions written with the identical association order, so the
    only cross-engine float residue is the per-doc avg (rounded 6dp,
    the convention the green Stupid Backoff gate already carries)."""
    from mpes_spark.extras.dedup import _md5_hash_sql

    h = _md5_hash_sql(seed, f"CAST({id_col} AS VARCHAR)", "duckdb")
    d, a = repr(discount), repr(alpha)
    return f"""
WITH base AS (
  SELECT {id_col}, string_split(text, ' ') AS ws,
         ({h}) % 10 = 0 AS is_test
  FROM {table}
),
train2 AS (
  SELECT ws[i + 1] AS w1, ws[i + 2] AS w2
  FROM (SELECT ws FROM base WHERE NOT is_test AND len(ws) >= 2) s,
       unnest(range(len(ws) - 1)) AS r(i)
),
bi AS (SELECT w1, w2, count(*) AS c12 FROM train2 GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS rtypes FROM bi GROUP BY w1),
cont AS (SELECT w2, count(*) AS ltypes FROM bi GROUP BY w2),
btot AS (SELECT CAST(count(*) AS DOUBLE) AS B FROM bi),
vocab AS (
  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS V
  FROM (SELECT unnest(ws) AS w FROM base WHERE NOT is_test) t
),
pos AS (
  SELECT {id_col}, ws[i + 1] AS w1, ws[i + 2] AS w2
  FROM (SELECT {id_col}, ws FROM base WHERE is_test AND len(ws) >= 2) s,
       unnest(range(len(ws) - 1)) AS r(i)
),
j AS (
  SELECT p.{id_col},
         CASE WHEN ctx.c1 IS NOT NULL THEN
           greatest(coalesce(bi.c12, 0) - {d}, 0.0) / ctx.c1
           + (({d} * ctx.rtypes / ctx.c1)
              * ((coalesce(cont.ltypes, 0) + {a}) / (btot.B + {a} * (vocab.V + 1.0))))
         ELSE (coalesce(cont.ltypes, 0) + {a}) / (btot.B + {a} * (vocab.V + 1.0))
         END AS s
  FROM pos p
  LEFT JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
  LEFT JOIN ctx ON ctx.w1 = p.w1
  LEFT JOIN cont ON cont.w2 = p.w2
  CROSS JOIN btot CROSS JOIN vocab
)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln(s)), 6) AS avg_logprob
FROM j GROUP BY {id_col}
""".strip()


# ---------------------------------------------------------------------------
# generation eval: n-gram overlap (ROUGE-N family)
# ---------------------------------------------------------------------------

def rouge_n(
    pairs: DataFrame,
    n: int = 2,
    ref: str = "ref_text",
    cand: str = "cand_text",
    pair_id: str = "pair_id",
) -> DataFrame:
    """ROUGE-N (Lin 2004) per (reference, candidate) pair: clipped
    n-gram overlap ``sum_g min(cnt_ref(g), cnt_cand(g))`` with recall
    (/ ref total), precision (/ cand total) and F1 — the multiset
    semantics, not set Jaccard (a candidate repeating one good gram
    scores its clip, not its count). The generated-data eval loop:
    distillation filtering, paraphrase QA, summary grading.

    Plan (r11, guide §2.4 — one tagged pass instead of four): both
    sides' grams explode ONCE (ref grams tagged (1,0), cand grams
    (0,1)); one (pair, gram) aggregation yields both per-gram counts,
    and one pair-keyed aggregation yields the clipped overlap AND
    both totals (sum of grouped counts == side total). Identical
    integers: one-sided grams contribute least(c, 0) = 0 exactly as
    the old inner join excluded them, and the total >= 1 filters
    reproduce the old row set (the tot_r ⋈ tot_c inner join kept a
    pair iff BOTH sides produced >= 1 gram) — pairs where either
    side has < n tokens vanish, identically in both engines."""
    from mpes_spark.extras.text import word_ngrams_expr

    tag = lambda col, r, c: F.transform(  # noqa: E731
        F.coalesce(word_ngrams_expr(n, col), F.array()),
        lambda g: F.struct(
            g.alias("g"), F.lit(r).alias("r"), F.lit(c).alias("c")
        ),
    )
    both = pairs.select(
        F.col(pair_id),
        F.explode(F.concat(tag(ref, 1, 0), tag(cand, 0, 1))).alias("t"),
    )
    cnt = both.groupBy(pair_id, "t.g").agg(
        F.sum("t.r").alias("c_ref"), F.sum("t.c").alias("c_cand")
    )
    scored = (
        cnt.groupBy(pair_id)
        .agg(
            F.sum(F.least("c_ref", "c_cand")).alias("overlap"),
            F.sum("c_ref").alias("total_ref"),
            F.sum("c_cand").alias("total_cand"),
        )
        .filter((F.col("total_ref") >= 1) & (F.col("total_cand") >= 1))
        .select(
            pair_id,
            F.col("overlap").cast("bigint").alias("overlap"),
            F.col("total_ref").cast("bigint").alias("total_ref"),
            F.col("total_cand").cast("bigint").alias("total_cand"),
        )
        .withColumn("r", F.round(F.col("overlap") / F.col("total_ref"), 6))
        .withColumn("p", F.round(F.col("overlap") / F.col("total_cand"), 6))
    )
    f1 = F.when(F.col("overlap") == 0, F.lit(0.0)).otherwise(
        F.round(2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")), 6)
    )
    return scored.select(
        pair_id,
        "overlap",
        "total_ref",
        "total_cand",
        F.col("r").alias("rouge_recall"),
        F.col("p").alias("rouge_precision"),
        f1.alias("rouge_f1"),
    )


def rouge_n_sql(
    pairs_sql: str,
    n: int = 2,
    ref: str = "ref_text",
    cand: str = "cand_text",
    pair_id: str = "pair_id",
) -> str:
    """DuckDB twin of :func:`rouge_n`. ``pairs_sql`` must yield
    (pair_id, ref_text, cand_text). F1 is computed FROM the rounded
    precision/recall (identical doubles cross-engine), zero when the
    overlap is zero."""
    from mpes_spark.extras.text import word_ngrams_sql

    g_ref = f"SELECT {pair_id}, unnest({word_ngrams_sql(n, ref)}) AS g FROM p"
    g_cand = f"SELECT {pair_id}, unnest({word_ngrams_sql(n, cand)}) AS g FROM p"
    return f"""
WITH p AS ({pairs_sql}),
rc AS (SELECT {pair_id}, g, count(*) AS c_ref FROM ({g_ref}) t GROUP BY 1, 2),
cc AS (SELECT {pair_id}, g, count(*) AS c_cand FROM ({g_cand}) t GROUP BY 1, 2),
ov AS (
  SELECT rc.{pair_id}, sum(least(rc.c_ref, cc.c_cand)) AS overlap
  FROM rc JOIN cc ON cc.{pair_id} = rc.{pair_id} AND cc.g = rc.g
  GROUP BY rc.{pair_id}
),
tr AS (SELECT {pair_id}, sum(c_ref) AS total_ref FROM rc GROUP BY 1),
tc AS (SELECT {pair_id}, sum(c_cand) AS total_cand FROM cc GROUP BY 1),
s AS (
  SELECT tr.{pair_id},
         CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
         CAST(tr.total_ref AS BIGINT) AS total_ref,
         CAST(tc.total_cand AS BIGINT) AS total_cand,
         round(CAST(coalesce(ov.overlap, 0) AS DOUBLE) / tr.total_ref, 6) AS r,
         round(CAST(coalesce(ov.overlap, 0) AS DOUBLE) / tc.total_cand, 6) AS p
  FROM tr JOIN tc ON tc.{pair_id} = tr.{pair_id}
  LEFT JOIN ov ON ov.{pair_id} = tr.{pair_id}
)
SELECT {pair_id}, overlap, total_ref, total_cand,
       r AS rouge_recall, p AS rouge_precision,
       CASE WHEN overlap = 0 THEN 0.0
            ELSE round(2 * p * r / (p + r), 6) END AS rouge_f1
FROM s
""".strip()


# ---------------------------------------------------------------------------
# generation eval: BLEU-2 (clipped n-gram precision + brevity penalty)
# ---------------------------------------------------------------------------

def bleu2(
    pairs: DataFrame,
    ref: str = "ref_text",
    cand: str = "cand_text",
    pair_id: str = "pair_id",
) -> DataFrame:
    """Sentence-level BLEU-2 (Papineni et al. 2002) per (reference,
    candidate) pair: clipped unigram and bigram precisions p1, p2
    (multiset ``min(cnt_cand, cnt_ref)`` overlap over the CANDIDATE
    totals — BLEU is precision-family where ROUGE is recall-family),
    geometric mean ``sqrt(p1 * p2)``, and the brevity penalty
    ``min(1, exp(1 - ref_len/cand_len))`` that punishes short
    candidates precision can't. The generated-data grading loop's
    second standard metric next to :func:`rouge_n`.

    Cross-engine exactness: every count is integer; p1/p2 are IEEE
    divisions of identical integers, the geometric mean is one
    multiply + one sqrt (both correctly rounded, so bit-identical);
    only the brevity penalty's exp() can differ by an ulp between
    libms, confined by the floor-based half-up 6 dp round (same
    residual class as the lm_perplexity ln()). Zero bigram overlap
    (or a candidate shorter than 2 tokens) scores bleu2 = 0 — the
    standard unsmoothed convention, identical in both engines.

    Plan (r11, guide §2.4 — one pass per n instead of three): both
    sides' grams explode in a SINGLE tagged pass (ref grams carry
    (1,0), cand grams (0,1)), so per-gram counts for both sides come
    out of ONE (pair_id, gram) aggregation, and the clipped overlap
    AND the candidate total come out of ONE pair-keyed aggregation —
    no rc⋈cc join, no separate tot pass (sum of grouped counts ==
    total grams). Identical integers: ref-only grams contribute
    least(c_ref, 0) = 0 exactly as the old inner join excluded them,
    and the tot >= 1 filter reproduces the old row set (a pair row
    existed iff the candidate produced >= 1 gram).
    """
    from mpes_spark.extras.similarity import _pround6
    from mpes_spark.extras.text import word_ngrams_expr

    def clipped(n: int) -> DataFrame:
        tag = lambda col, r, c: F.transform(  # noqa: E731
            F.coalesce(word_ngrams_expr(n, col), F.array()),
            lambda g: F.struct(
                g.alias("g"), F.lit(r).alias("r"), F.lit(c).alias("c")
            ),
        )
        both = pairs.select(
            F.col(pair_id),
            F.explode(F.concat(tag(ref, 1, 0), tag(cand, 0, 1))).alias("t"),
        )
        cnt = both.groupBy(pair_id, "t.g").agg(
            F.sum("t.r").alias("c_ref"), F.sum("t.c").alias("c_cand")
        )
        return (
            cnt.groupBy(pair_id)
            .agg(
                F.sum(F.least("c_ref", "c_cand")).alias(f"ov{n}"),
                F.sum("c_cand").alias(f"tot{n}"),
            )
            .filter(F.col(f"tot{n}") >= 1)
            .select(
                pair_id,
                F.col(f"ov{n}").cast("bigint").alias(f"ov{n}"),
                F.col(f"tot{n}").cast("bigint").alias(f"tot{n}"),
            )
        )

    lens = pairs.select(
        F.col(pair_id),
        F.size(F.split(F.col(ref), " ")).cast("bigint").alias("ref_len"),
        F.size(F.split(F.col(cand), " ")).cast("bigint").alias("cand_len"),
    )
    j = lens.join(clipped(1), pair_id).join(clipped(2), pair_id, "left")
    j = j.select(
        pair_id,
        "ref_len",
        "cand_len",
        "ov1",
        "tot1",
        F.coalesce("ov2", F.lit(0)).cast("bigint").alias("ov2"),
        F.coalesce("tot2", F.lit(0)).cast("bigint").alias("tot2"),
    )
    p1 = F.col("ov1") / F.col("tot1")
    p2 = F.col("ov2") / F.col("tot2")
    bp = F.when(F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - F.col("ref_len") / F.col("cand_len"))
    )
    zero = (F.col("ov1") == 0) | (F.col("ov2") == 0) | (F.col("tot2") == 0)
    return j.select(
        pair_id,
        "ref_len",
        "cand_len",
        "ov1",
        "tot1",
        "ov2",
        "tot2",
        _pround6(bp).alias("brevity_penalty"),
        F.when(zero, F.lit(0.0))
        .otherwise(_pround6(bp * F.sqrt(p1 * p2)))
        .alias("bleu2"),
    )


def bleu2_sql(
    pairs_sql: str,
    ref: str = "ref_text",
    cand: str = "cand_text",
    pair_id: str = "pair_id",
) -> str:
    """DuckDB twin of :func:`bleu2`; same integer pipeline, same
    floor-based half-up 6 dp round (``floor(x*1e6+0.5)/1e6``)."""
    from mpes_spark.extras.text import word_ngrams_sql

    def grams(col: str, n: int) -> str:
        return (
            f"SELECT {pair_id}, unnest({word_ngrams_sql(n, col)}) AS g "
            "FROM p"
        )

    ctes = []
    for n in (1, 2):
        ctes.append(
            f"rc{n} AS (SELECT {pair_id}, g, count(*) AS c_ref "
            f"FROM ({grams(ref, n)}) t GROUP BY 1, 2)"
        )
        ctes.append(
            f"cc{n} AS (SELECT {pair_id}, g, count(*) AS c_cand "
            f"FROM ({grams(cand, n)}) t GROUP BY 1, 2)"
        )
        ctes.append(
            f"ov{n} AS (SELECT rc{n}.{pair_id}, "
            f"sum(least(rc{n}.c_ref, cc{n}.c_cand)) AS ov "
            f"FROM rc{n} JOIN cc{n} ON cc{n}.{pair_id} = rc{n}.{pair_id} "
            f"AND cc{n}.g = rc{n}.g GROUP BY 1)"
        )
        ctes.append(
            f"tc{n} AS (SELECT {pair_id}, sum(c_cand) AS tot "
            f"FROM cc{n} GROUP BY 1)"
        )
    cte_sql = ",\n".join(ctes)
    return f"""
WITH p AS ({pairs_sql}),
{cte_sql},
lens AS (
  SELECT {pair_id},
         CAST(len(string_split({ref}, ' ')) AS BIGINT) AS ref_len,
         CAST(len(string_split({cand}, ' ')) AS BIGINT) AS cand_len
  FROM p
),
s AS (
  SELECT lens.{pair_id}, ref_len, cand_len,
         CAST(coalesce(ov1.ov, 0) AS BIGINT) AS ov1,
         CAST(tc1.tot AS BIGINT) AS tot1,
         CAST(coalesce(ov2.ov, 0) AS BIGINT) AS ov2,
         CAST(coalesce(tc2.tot, 0) AS BIGINT) AS tot2
  FROM lens
  JOIN tc1 ON tc1.{pair_id} = lens.{pair_id}
  LEFT JOIN ov1 ON ov1.{pair_id} = lens.{pair_id}
  LEFT JOIN tc2 ON tc2.{pair_id} = lens.{pair_id}
  LEFT JOIN ov2 ON ov2.{pair_id} = lens.{pair_id}
),
f AS (
  SELECT *,
         CASE WHEN cand_len >= ref_len THEN 1.0
              ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / cand_len) END AS bp,
         CAST(ov1 AS DOUBLE) / tot1 AS p1,
         CAST(ov2 AS DOUBLE) / nullif(tot2, 0) AS p2
  FROM s
)
SELECT {pair_id}, ref_len, cand_len, ov1, tot1, ov2, tot2,
       floor(bp * 1e6 + 0.5) / 1e6 AS brevity_penalty,
       CASE WHEN ov1 = 0 OR ov2 = 0 OR tot2 = 0 THEN 0.0
            ELSE floor(bp * sqrt(p1 * p2) * 1e6 + 0.5) / 1e6
       END AS bleu2
FROM f
""".strip()
