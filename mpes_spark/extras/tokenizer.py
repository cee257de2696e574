"""Distributed BPE tokenizer training and application (Sennrich et
al. 2016, the GPT-2/HF training recipe re-shaped for Spark).

The scale insight every production BPE trainer uses: merges are a
function of the WORD-FREQUENCY table, not the corpus. So the only
corpus-scale step is one groupBy(word) count — everything after
operates on the bounded vocabulary:

1. ``word_freqs``     corpus -> (word, freq)           [Spark, 1 shuffle]
2. ``train_bpe``      freq table -> ordered merge list  [driver, bounded]
3. ``bpe_encode_udf`` docs -> token arrays              [broadcast merges,
                                                         Arrow batches]

At 100 TB step 1 shuffles one row per distinct word (map-side
combined); the driver sees only the top-``max_words`` rows (~10^5-10^6
— the same bound HF tokenizers train on), and application is an
embarrassingly parallel scan with the merge ranks riding a broadcast.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freqs(
    docs: DataFrame, text: str = "text", max_words: int | None = None
) -> DataFrame:
    """Corpus word-frequency table — the one corpus-scale step of BPE
    training. Optional ``max_words`` keeps the driver collect bounded
    (TakeOrderedAndProject, no global sort)."""
    wf = (
        docs.select(F.explode(F.split(F.col(text), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), "word").limit(max_words)
    return wf


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    text: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Classic frequency-table BPE: each word is a symbol sequence
    (chars + ``</w>``); repeatedly count adjacent symbol pairs
    weighted by word frequency, merge the most frequent pair
    (ties broken lexicographically for determinism), stop after
    ``n_merges`` or when no pair repeats. The loop runs on the
    driver over the bounded freq table — the distributed work is the
    single :func:`word_freqs` aggregation."""
    rows = word_freqs(docs, text, max_words).collect()
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END_OF_WORD,): r["freq"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
        merges.append((a, b))
    return merges


def train_bpe_sql(
    table: str = "documents", n_merges: int = 12, text: str = "text"
) -> str:
    """DuckDB oracle twin of :func:`train_bpe` (uncapped vocab): the
    fixed-merge-count training loop unrolled as ``n_merges`` chained
    CTE blocks — the kmeans/MMR unrolled-oracle playbook applied to
    the last iterative-by-design query. Each block recomputes the
    frequency-weighted adjacent-pair counts over the symbol table,
    picks the argmax with the driver loop's exact tie-break (count
    desc, then lexicographically LARGEST pair — Python ``max`` over
    ``(count, pair)`` tuples), and applies the merge with the greedy
    leftmost-non-overlapping rule: a match at position p survives iff
    its offset within a run of CONSECUTIVE match-start positions is
    even (overlap is only possible when left == right symbol; for
    distinct symbols every run has length 1 and the parity keeps
    all). A block whose best pair count is < 2 yields an empty
    ``best`` row and every later block no-ops — matching the driver
    loop's break. Symbol tables are MATERIALIZED: each is referenced
    three times by the next block. Returns (merge_rank, left_sym,
    right_sym)."""
    parts = [
        f"""wf AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(string_split({text}, ' ')) AS word FROM {table}) w
  WHERE word <> '' GROUP BY word),
s0 AS MATERIALIZED (
  SELECT word, freq,
         generate_subscripts(syms, 1) AS pos, unnest(syms) AS sym
  FROM (SELECT word, freq,
               list_append(string_split(word, ''), '{END_OF_WORD}') AS syms
        FROM wf) q)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(
            f"""p{i} AS (
  SELECT a.sym AS la, b.sym AS lb, sum(a.freq) AS cnt
  FROM s{p} a JOIN s{p} b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY 1, 2),
best{i} AS MATERIALIZED (
  SELECT la, lb FROM p{i} WHERE cnt >= 2
  ORDER BY cnt DESC, la DESC, lb DESC LIMIT 1),
m{i} AS (
  SELECT a.word, a.pos
  FROM s{p} a
  JOIN s{p} b ON b.word = a.word AND b.pos = a.pos + 1
  JOIN best{i} t ON a.sym = t.la AND b.sym = t.lb),
keep{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos, rn, min(rn) OVER (PARTITION BY word, grp) AS rn0
    FROM (SELECT word, pos,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS rn,
                 pos - row_number() OVER (PARTITION BY word ORDER BY pos)
                   AS grp
          FROM m{i}) q1) q2
  WHERE (rn - rn0) % 2 = 0),
s{i} AS MATERIALIZED (
  SELECT word, freq,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM (
    SELECT k.word, s1.freq, k.pos, s1.sym || s2.sym AS sym
    FROM keep{i} k
    JOIN s{p} s1 ON s1.word = k.word AND s1.pos = k.pos
    JOIN s{p} s2 ON s2.word = k.word AND s2.pos = k.pos + 1
    UNION ALL
    SELECT s.word, s.freq, s.pos, s.sym
    FROM s{p} s
    LEFT JOIN keep{i} k1 ON k1.word = s.word AND k1.pos = s.pos
    LEFT JOIN keep{i} k2 ON k2.word = s.word AND k2.pos = s.pos - 1
    WHERE k1.pos IS NULL AND k2.pos IS NULL) q)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT {i} AS merge_rank, la AS left_sym, lb AS right_sym "
        f"FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT CAST(merge_rank AS INT) AS merge_rank, left_sym, "
        f"right_sym FROM (\n  {union}) allm"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in learned-rank order (the standard
    lowest-rank-first greedy loop)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_encode_udf(spark_context, merges: list[tuple[str, str]]):
    """Arrow-batched encoder: text -> array<string> of BPE tokens.
    The merge ranks ride a broadcast (vocab-sized, a few MB at
    production merge counts); per-batch encoding memoizes by word, so
    each distinct word in a batch is segmented once."""

    bc = spark_context.broadcast({tuple(m): i for i, m in enumerate(merges)})

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                if w not in memo:
                    memo[w] = _encode_word(w, ranks)
                toks.extend(memo[w])
            out.append(toks)
        return pd.Series(out)

    return enc


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE tokenization stats: (id, n_tokens, n_chars,
    compression) — the fertility/compression diagnostic a tokenizer
    change needs over the whole corpus."""
    enc = bpe_encode_udf(docs.sparkSession.sparkContext, merges)
    toks = docs.select(
        F.col(id_col),
        F.length(F.col(text)).alias("n_chars"),
        F.size(enc(F.col(text))).alias("n_tokens"),
    )
    return toks.withColumn(
        "chars_per_token",
        F.round(F.col("n_chars") / F.greatest(F.col("n_tokens"), F.lit(1)), 6),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 500,
    by: str = "source",
    text: str = "text",
) -> DataFrame:
    """Per-``by`` vocabulary coverage against the corpus's own top-V
    token vocabulary — the tokenizer/vocab evaluation staple: the OOV
    token rate is what a fixed vocab costs each domain (an <unk>-heavy
    domain trains badly; the CC-Net/tokenizer-design feedback loop).

    Returns ``({by}, n_tokens, n_oov_tokens, oov_token_rate, n_types,
    n_oov_types, oov_type_rate)``.

    Scale shape: ONE token explode feeds both the global vocab
    construction (groupBy token -> TakeOrdered top-V, never a global
    sort) and the per-domain aggregation; membership is a broadcast
    left join against the V-row vocab (runtime-filter shape). At a
    real 100-TB corpus the vocab side is trained once on a sample and
    broadcast — the scoring pass is unchanged."""
    toks = docs.select(
        F.col(by), F.explode(F.split(F.col(text), " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    flagged = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.col("in_vocab").isNull().cast("int")
    return flagged.groupBy(by).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov_tokens"),
        F.round(
            F.sum(oov).cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_token_rate"),
        F.countDistinct("tok").cast("bigint").alias("n_types"),
        F.countDistinct(F.when(oov == 1, F.col("tok"))).cast("bigint").alias(
            "n_oov_types"
        ),
        F.round(
            F.countDistinct(F.when(oov == 1, F.col("tok"))).cast("double")
            / F.countDistinct("tok"),
            6,
        ).alias("oov_type_rate"),
    )


def vocab_coverage_sql(
    table: str,
    vocab_size: int = 500,
    by: str = "source",
    text: str = "text",
) -> str:
    """DuckDB twin of :func:`vocab_coverage`."""
    return f"""
WITH toks AS (
  SELECT {by}, unnest(string_split({text}, ' ')) AS tok FROM {table}
),
vocab AS (
  SELECT tok, 1 AS in_vocab FROM (
    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ORDER BY cnt DESC, tok LIMIT {vocab_size}) v
),
flagged AS (
  SELECT t.{by}, t.tok,
         CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
)
SELECT {by},
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(oov) AS BIGINT) AS n_oov_tokens,
  round(CAST(sum(oov) AS DOUBLE) / count(*), 6) AS oov_token_rate,
  CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
  CAST(count(DISTINCT CASE WHEN oov = 1 THEN tok END) AS BIGINT) AS n_oov_types,
  round(CAST(count(DISTINCT CASE WHEN oov = 1 THEN tok END) AS DOUBLE)
        / count(DISTINCT tok), 6) AS oov_type_rate
FROM flagged GROUP BY {by}
""".strip()
