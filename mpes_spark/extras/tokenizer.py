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


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
# model) — the OTHER standard subword trainer next to BPE, in its
# hard-EM (Viterbi) rendering: seed vocabulary = frequent substrings,
# then iterate {score pieces by log-frequency -> best-segmentation of
# every word -> re-count pieces from the segmentations}. Integer
# micro-unit scores make the DP exact and engine-replayable (the
# lr_train_quality lesson applied to a dynamic program).
# ---------------------------------------------------------------------------

_UNI_ITERS = 2
_UNI_MAX_PIECE = 4
_UNI_MIN_COUNT = 2
_UNI_MAX_WORD = 12


def _ilog_score(cnt: int, total: int) -> int:
    """floor(ln(cnt/total) * 1e6) — the micro-int log-probability.
    A single libm ln on identical integers; the floor boundary is
    ~1e9 ulps away for these magnitudes."""
    import math

    return math.floor(math.log(cnt / total) * 1e6)


def _viterbi_unigram(
    word: str, score: dict[str, int], max_piece: int
) -> list[str]:
    """Best segmentation under additive integer piece scores; ties
    broken by the LONGEST last piece at every backtrack step (a total
    deterministic rule both engines implement identically)."""
    n = len(word)
    dp: list[int | None] = [None] * (n + 1)
    dp[0] = 0
    for j in range(1, n + 1):
        best = None
        for length in range(1, min(max_piece, j) + 1):
            s = score.get(word[j - length : j])
            if s is None or dp[j - length] is None:
                continue
            cand = dp[j - length] + s
            if best is None or cand > best:
                best = cand
        dp[j] = best
    out: list[str] = []
    j = n
    while j > 0:
        for length in range(min(max_piece, j), 0, -1):
            piece = word[j - length : j]
            s = score.get(piece)
            if (
                s is not None
                and dp[j - length] is not None
                and dp[j] is not None
                and dp[j - length] + s == dp[j]
            ):
                out.append(piece)
                j -= length
                break
        else:  # pragma: no cover - unreachable: singletons persist
            raise RuntimeError(f"unsegmentable word {word!r}")
    return out[::-1]


def train_unigram(
    docs: DataFrame,
    iters: int = _UNI_ITERS,
    max_piece: int = _UNI_MAX_PIECE,
    min_count: int = _UNI_MIN_COUNT,
    max_word_len: int = _UNI_MAX_WORD,
    text: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """Train a unigram-LM subword vocabulary; returns the final
    (piece, weighted_count) table, sorted.

    The distributed step is the corpus word-frequency aggregation
    (:func:`word_freqs`, same as BPE); the EM loop runs on the driver
    over the BOUNDED distinct-word table — the SentencePiece shape
    (model state is vocab-sized, never corpus-sized; at 100 TB the
    same ``max_words`` cap bounds the collect). Words longer than
    ``max_word_len`` are excluded up front in BOTH engines — the
    documented bound that keeps the oracle's unrolled DP finite.

    Hard-EM, not forward-backward: each iteration re-scores pieces by
    floor(1e6 * ln(freq share)) (integer micro-units -> the Viterbi
    DP compares exact BIGINT sums, no float order anywhere), segments
    every distinct word, and re-counts pieces from the chosen
    segmentations; pieces that go unused drop out. Every piece of a
    previous best segmentation survives, so words stay segmentable.
    Ties take the longest piece at each backtrack step."""
    rows = word_freqs(docs, text, max_words).collect()
    wf = {r["word"]: r["freq"] for r in rows if len(r["word"]) <= max_word_len}
    cnt: dict[str, int] = {}
    for w, f in wf.items():
        n = len(w)
        for i in range(n):
            for length in range(1, min(max_piece, n - i) + 1):
                p = w[i : i + length]
                cnt[p] = cnt.get(p, 0) + f
    vocab = {
        p: c for p, c in cnt.items() if c >= min_count or len(p) == 1
    }
    for _ in range(iters):
        total = sum(vocab.values())
        score = {p: _ilog_score(c, total) for p, c in vocab.items()}
        new: dict[str, int] = {}
        for w, f in wf.items():
            for p in _viterbi_unigram(w, score, max_piece):
                new[p] = new.get(p, 0) + f
        vocab = new
    return sorted(vocab.items())


def train_unigram_sql(
    table: str = "documents",
    iters: int = _UNI_ITERS,
    max_piece: int = _UNI_MAX_PIECE,
    min_count: int = _UNI_MIN_COUNT,
    max_word_len: int = _UNI_MAX_WORD,
    text: str = "text",
    max_words: int = 100_000,
) -> str:
    """DuckDB oracle twin of :func:`train_unigram`: the full hard-EM
    loop as generated SQL — seed substring counts, per-iteration
    micro-int scores, the Viterbi DP UNROLLED over word positions
    (``max_word_len`` CTEs of 4-way max per step), and the backtrack
    unrolled the same way with the longest-piece tie rule as a CASE
    ladder over correlated dp/score lookups. Word relations are the
    DISTINCT words (vocab-bounded), so the unrolled chain is cheap at
    any SF. The kmeans/BPE unrolled-oracle playbook applied to a
    dynamic program."""
    parts = _train_unigram_parts(
        table, iters, max_piece, min_count, max_word_len, text, max_words
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT piece, CAST(cnt AS BIGINT) AS cnt FROM v{iters}"
    )


def _train_unigram_parts(
    table: str,
    iters: int,
    max_piece: int,
    min_count: int,
    max_word_len: int,
    text: str,
    max_words: int,
) -> list[str]:
    """The WITH-clause parts of :func:`train_unigram_sql`, reusable by
    the encode-path twin (:func:`unigram_token_stats_sql`) which
    appends its own DP over the final vocabulary ``v{iters}``."""
    mp = max_piece
    parts = [
        # Cap mirrors train_unigram exactly: the rank-based top-max_words
        # cut (freq DESC, word — word_freqs' TakeOrderedAndProject) is
        # applied BEFORE the max_word_len filter, so both engines train
        # on the same word set even past the cap (ADVICE r9).
        f"""wfl AS MATERIALIZED (
  SELECT word, freq FROM (
    SELECT word, count(*) AS freq FROM (
      SELECT unnest(string_split({text}, ' ')) AS word FROM {table}) w
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT {max_words})
  WHERE length(word) <= {max_word_len})""",
        f"""seed AS MATERIALIZED (
  SELECT piece, sum(freq) AS cnt FROM (
    SELECT substr(word, i + 1, l) AS piece, freq
    FROM wfl,
         unnest(range(length(word))) r(i),
         unnest(range(1, {mp} + 1)) q(l)
    WHERE i + l <= length(word)) s
  GROUP BY piece)""",
        f"""v0 AS MATERIALIZED (
  SELECT piece, cnt FROM seed
  WHERE cnt >= {min_count} OR length(piece) = 1)""",
    ]
    for t in range(iters):
        parts.append(
            f"tot{t} AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v{t})"
        )
        parts.append(
            f"sc{t} AS MATERIALIZED (SELECT piece, CAST(floor(ln(cnt / "
            f"(SELECT total FROM tot{t})) * 1e6) AS BIGINT) AS s FROM v{t})"
        )
        parts.append(
            f"d{t}_0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS best "
            "FROM wfl)"
        )
        for j in range(1, max_word_len + 1):
            branches = []
            for l in range(1, min(mp, j) + 1):
                branches.append(
                    f"SELECT d.word, d.freq, d.best + v.s AS cand "
                    f"FROM d{t}_{j - l} d "
                    f"JOIN sc{t} v ON v.piece = substr(d.word, {j - l + 1}, {l}) "
                    f"WHERE length(d.word) >= {j}"
                )
            u = "\n    UNION ALL ".join(branches)
            parts.append(
                f"d{t}_{j} AS MATERIALIZED (\n"
                f"  SELECT word, freq, max(cand) AS best FROM (\n    {u}) u\n"
                f"  GROUP BY word, freq)"
            )
        dp_union = "\n  UNION ALL ".join(
            f"SELECT word, {j} AS pos, best FROM d{t}_{j}"
            for j in range(0, max_word_len + 1)
        )
        parts.append(f"dpall{t} AS MATERIALIZED (\n  {dp_union})")

        def _valid(l: int) -> str:
            return (
                f"q.pos >= {l} AND "
                f"(SELECT d.best FROM dpall{t} d WHERE d.word = q.word "
                f"AND d.pos = q.pos - {l}) + "
                f"(SELECT v.s FROM sc{t} v WHERE v.piece = "
                f"substr(q.word, q.pos - {l} + 1, {l})) = "
                f"(SELECT d2.best FROM dpall{t} d2 WHERE d2.word = q.word "
                "AND d2.pos = q.pos)"
            )

        l_case = " ".join(
            f"WHEN {_valid(l)} THEN {l}" for l in range(mp, 0, -1)
        )
        parts.append(
            f"bt{t}_0 AS (SELECT word, freq, length(word) AS pos, "
            "CAST(NULL AS VARCHAR) AS piece FROM wfl)"
        )
        for st in range(1, max_word_len + 1):
            parts.append(
                f"bt{t}_{st} AS MATERIALIZED (\n"
                f"  SELECT word, freq, pos - l AS pos, "
                "substr(word, pos - l + 1, l) AS piece FROM (\n"
                f"    SELECT q.word, q.freq, q.pos, CASE {l_case} END AS l\n"
                f"    FROM bt{t}_{st - 1} q WHERE q.pos > 0) z)"
            )
        piece_union = "\n  UNION ALL ".join(
            f"SELECT piece, freq FROM bt{t}_{st}"
            for st in range(1, max_word_len + 1)
        )
        parts.append(
            f"v{t + 1} AS MATERIALIZED (\n"
            f"  SELECT piece, sum(freq) AS cnt FROM (\n  {piece_union}) p\n"
            "  WHERE piece IS NOT NULL GROUP BY piece)"
        )
    return parts


# ---------------------------------------------------------------------------
# unigram ENCODE path (r10, VERDICT r9 #5): distributed Viterbi
# segmentation with the learned vocabulary — the production inference
# half of the trainer above, mirroring bpe_encode_udf's shape.
# ---------------------------------------------------------------------------

UNK_PIECE = "<unk>"  # >max_piece chars and non-word glyphs: collision-free


def unigram_encode_udf(
    spark_context,
    vocab: list[tuple[str, int]],
    max_piece: int = _UNI_MAX_PIECE,
    max_word_len: int = _UNI_MAX_WORD,
):
    """Arrow-batched Viterbi encoder: text -> array<string> of unigram
    pieces under the trained (piece, count) table. Piece scores are
    the SAME integer micro-log-frequencies training used
    (:func:`_ilog_score`), so inference runs the exact DP the trainer
    ran — which is what makes the segmentation oracle-expressible.
    The vocab rides a broadcast (vocab-sized); per-batch encoding
    memoizes by word. Words longer than ``max_word_len`` (never
    trained) or with no path under the vocab become one
    :data:`UNK_PIECE`."""
    total = sum(c for _, c in vocab)
    score = {p: _ilog_score(c, total) for p, c in vocab}
    bc = spark_context.broadcast(score)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        sc = bc.value
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    if len(w) > max_word_len:
                        got = [UNK_PIECE]
                    else:
                        try:
                            got = _viterbi_unigram(w, sc, max_piece)
                        except RuntimeError:  # no path under this vocab
                            got = [UNK_PIECE]
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return enc


def unigram_token_stats(
    docs: DataFrame,
    iters: int = _UNI_ITERS,
    max_piece: int = _UNI_MAX_PIECE,
    min_count: int = _UNI_MIN_COUNT,
    max_word_len: int = _UNI_MAX_WORD,
    text: str = "text",
    id_col: str = "doc_id",
    max_words: int = 100_000,
) -> DataFrame:
    """Train the unigram vocab, then ENCODE the whole corpus with it:
    per doc (n_words, n_chars, n_tokens, n_unk) — the fertility
    diagnostic, all-integer so the hash gate is exact. The encode pass
    covers EVERY distinct word (including words the trainer's
    ``max_words`` cap or ``max_word_len`` bound excluded — the latter
    count as UNK), which is exactly what production inference does."""
    vocab = train_unigram(
        docs, iters, max_piece, min_count, max_word_len, text, max_words
    )
    enc = unigram_encode_udf(
        docs.sparkSession.sparkContext, vocab, max_piece, max_word_len
    )
    words = f"filter(split({text}, ' '), w -> w <> '')"
    return (
        docs.select(
            F.col(id_col),
            F.expr(f"size({words})").cast("bigint").alias("n_words"),
            F.expr(f"aggregate({words}, 0L, (a, w) -> a + length(w))")
            .cast("bigint")
            .alias("n_chars"),
            enc(F.col(text)).alias("_toks"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            F.size("_toks").cast("bigint").alias("n_tokens"),
            F.size(
                F.filter("_toks", lambda tk: tk == F.lit(UNK_PIECE))
            )
            .cast("bigint")
            .alias("n_unk"),
        )
    )


def unigram_token_stats_sql(
    table: str = "documents",
    iters: int = _UNI_ITERS,
    max_piece: int = _UNI_MAX_PIECE,
    min_count: int = _UNI_MIN_COUNT,
    max_word_len: int = _UNI_MAX_WORD,
    text: str = "text",
    id_col: str = "doc_id",
    max_words: int = 100_000,
) -> str:
    """DuckDB twin of :func:`unigram_token_stats`: the trainer's full
    CTE chain (:func:`_train_unigram_parts`), then ONE more unrolled
    Viterbi DP + longest-piece backtrack over ALL distinct corpus
    words scored by the FINAL vocabulary ``v{iters}``, a per-word
    piece count, and the per-doc rollup. Unsegmentable or overlong
    words fall out of the DP relations and count as one UNK via the
    LEFT JOIN's COALESCE."""
    mp = max_piece
    L = max_word_len
    T = iters
    parts = _train_unigram_parts(
        table, iters, max_piece, min_count, max_word_len, text, max_words
    )
    parts.append(
        f"totF AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v{T})"
    )
    parts.append(
        f"scF AS MATERIALIZED (SELECT piece, CAST(floor(ln(cnt / "
        f"(SELECT total FROM totF)) * 1e6) AS BIGINT) AS s FROM v{T})"
    )
    parts.append(
        f"""allw AS MATERIALIZED (
  SELECT DISTINCT word FROM (
    SELECT unnest(string_split({text}, ' ')) AS word FROM {table}) w
  WHERE word <> '')"""
    )
    parts.append(f"ew AS (SELECT word FROM allw WHERE length(word) <= {L})")
    parts.append("e_0 AS (SELECT word, CAST(0 AS BIGINT) AS best FROM ew)")
    for j in range(1, L + 1):
        branches = [
            f"SELECT d.word, d.best + v.s AS cand "
            f"FROM e_{j - l} d "
            f"JOIN scF v ON v.piece = substr(d.word, {j - l + 1}, {l}) "
            f"WHERE length(d.word) >= {j}"
            for l in range(1, min(mp, j) + 1)
        ]
        u = "\n    UNION ALL ".join(branches)
        parts.append(
            f"e_{j} AS MATERIALIZED (\n"
            f"  SELECT word, max(cand) AS best FROM (\n    {u}) u\n"
            "  GROUP BY word)"
        )
    dp_union = "\n  UNION ALL ".join(
        f"SELECT word, {j} AS pos, best FROM e_{j}" for j in range(0, L + 1)
    )
    parts.append(f"edpall AS MATERIALIZED (\n  {dp_union})")

    def _valid(l: int) -> str:
        return (
            f"q.pos >= {l} AND "
            f"(SELECT d.best FROM edpall d WHERE d.word = q.word "
            f"AND d.pos = q.pos - {l}) + "
            f"(SELECT v.s FROM scF v WHERE v.piece = "
            f"substr(q.word, q.pos - {l} + 1, {l})) = "
            f"(SELECT d2.best FROM edpall d2 WHERE d2.word = q.word "
            "AND d2.pos = q.pos)"
        )

    l_case = " ".join(f"WHEN {_valid(l)} THEN {l}" for l in range(mp, 0, -1))
    parts.append(
        "ebt_0 AS (SELECT e.word, length(e.word) AS pos, "
        "CAST(NULL AS VARCHAR) AS piece FROM ew e "
        "JOIN edpall d ON d.word = e.word AND d.pos = length(e.word))"
    )
    for st in range(1, L + 1):
        parts.append(
            f"ebt_{st} AS MATERIALIZED (\n"
            "  SELECT word, pos - l AS pos, "
            "substr(word, pos - l + 1, l) AS piece FROM (\n"
            f"    SELECT q.word, q.pos, CASE {l_case} END AS l\n"
            f"    FROM ebt_{st - 1} q WHERE q.pos > 0) z)"
        )
    piece_union = "\n  UNION ALL ".join(
        f"SELECT word, piece FROM ebt_{st}" for st in range(1, L + 1)
    )
    parts.append(
        f"ntok AS MATERIALIZED (\n"
        f"  SELECT word, count(*) AS n_pieces FROM (\n  {piece_union}) p\n"
        "  WHERE piece IS NOT NULL GROUP BY word)"
    )
    parts.append(
        "wstats AS (SELECT a.word, COALESCE(n.n_pieces, 1) AS n_pieces, "
        "CASE WHEN n.word IS NULL THEN 1 ELSE 0 END AS unk "
        "FROM allw a LEFT JOIN ntok n USING (word))"
    )
    final = f"""
SELECT d.{id_col},
       CAST(COALESCE(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_unk, 0) AS BIGINT) AS n_unk
FROM {table} d LEFT JOIN (
  SELECT {id_col}, count(*) AS n_words, sum(length(word)) AS n_chars,
         sum(n_pieces) AS n_tokens, sum(unk) AS n_unk
  FROM (SELECT {id_col}, unnest(string_split({text}, ' ')) AS word
        FROM {table}) dw
  JOIN wstats USING (word)
  WHERE word <> ''
  GROUP BY {id_col}) a USING ({id_col})"""
    return "WITH " + ",\n".join(parts) + final
