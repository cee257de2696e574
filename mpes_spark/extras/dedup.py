"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The scale-critical design rule (the difference between "works on 500
docs" and "works on 100 TB"): **candidate pairs are only ever formed
inside hash buckets** — an LSH band bucket, a SimHash band bucket, or
a deterministic blocking key — never via an all-pairs cross join. Every
join here is equi-keyed on a bucket/block id, so Spark shuffles each
side once on that key and AQE handles bucket skew; candidate volume is
O(sum of bucket^2) with small buckets, not O(n^2).

Operators:
- exact dedup: md5 fingerprint groupBy (``fingerprint_expr``) — one
  shuffle on the 16-byte digest; keep-first via min(doc_id).
- word-shingle exact Jaccard with prefix blocking — oracle-expressible
  (same SQL shape runs on DuckDB).
- MinHash signatures (k seeded xxhash64 mins) + banded LSH bucket join
  -> candidate pairs -> exact-Jaccard verification. xxhash64 is
  Spark-native (no DuckDB twin) -> rows-only check on the production
  query, but :func:`minhash_lsh_sql` renders the SAME four-stage
  pipeline on the engine-portable md5 hash family, so the full
  sketch -> band -> verify flow is also hash-matched by the oracle.
- SimHash (sign-aggregated token hashes) + band bucketing + hamming
  distance (bit_count(xor)); :func:`simhash_lsh_sql` is its
  oracle-replayable md5 twin.
- duplicate-cluster resolution: connected components over any pair
  relation (min-label propagation + pointer jumping; recursive-CTE
  oracle).

All stages are DataFrame ops / Spark SQL — no Python UDFs anywhere.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mpes_spark.extras.text import fingerprint_expr

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per normalized-content
    fingerprint. One hash-shuffle on the digest; at 100 TB this is the
    cheapest possible dedup — the shuffle key is 16 bytes/row and
    map-side partial aggregation collapses within-partition copies
    before the exchange."""
    fp = df.withColumn("_fp", fingerprint_expr(text))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return (
        fp.join(keep, ["_fp", id_col], "left_semi").drop("_fp")
    )


def duplicate_groups(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fingerprint groups with more than one member:
    (fingerprint, n_copies, keep_id)."""
    return (
        df.groupBy(fingerprint_expr(text).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# word shingles (dual-dialect SQL builders)
#
# The set-similarity queries are written once as a SQL template and
# rendered for both engines (Spark SQL / DuckDB) so the oracle runs the
# semantically identical plan. Dialect differences are isolated here.
# ---------------------------------------------------------------------------

def _shingle_cte(table: str, n: int, dialect: str, id_col: str = "doc_id") -> str:
    """CTE body producing the DISTINCT word ``n``-gram set per doc:
    (doc_id, sh). ``table`` is a table expression (view name or
    ``parquet.`path```)."""
    if dialect == "spark":
        gen = (
            f"explode(transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {n}))))"
        )
        split = "split(text, ' ')"
        guard = f"size(toks) >= {n}"
    elif dialect == "duckdb":
        gen = (
            f"unnest(list_transform(range(len(toks) - {n} + 1), "
            f"i -> array_to_string(toks[i + 1: i + {n}], ' ')))"
        )
        split = "string_split(text, ' ')"
        guard = f"len(toks) >= {n}"
    else:
        raise ValueError(dialect)
    return (
        f"SELECT DISTINCT {id_col}, sh FROM ("
        f"SELECT {id_col}, {gen} AS sh FROM "
        f"(SELECT {id_col}, {split} AS toks FROM {table}) tok_t "
        f"WHERE {guard}) sh_t"
    )


def blocked_jaccard_sql(
    table: str,
    dialect: str,
    n: int = 3,
    block_tokens: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> str:
    """Exact word-``n``-gram Jaccard over candidate pairs blocked on
    the first ``block_tokens`` tokens (prefix blocking — the classic
    entity-resolution blocking key). Output:
    (id_a, id_b, jaccard) for pairs with jaccard >= threshold.

    Scale: the pair join is equi-keyed on the block key; the shingle
    intersection join is equi-keyed on (pair, shingle). No cross
    joins. At 100 TB the block key would be an LSH band instead (see
    :func:`minhash_lsh_pairs`) — this query exists because it is
    exactly oracle-expressible."""
    if dialect == "spark":
        block = f"concat_ws(' ', slice(split(text, ' '), 1, {block_tokens}))"
    else:
        block = f"array_to_string(string_split(text, ' ')[1:{block_tokens}], ' ')"
    sh = _shingle_cte(table, n, dialect, id_col)
    return f"""
WITH shingles AS ({sh}),
sizes AS (SELECT {id_col}, count(*) AS nsh FROM shingles GROUP BY {id_col}),
blocks AS (SELECT {id_col}, {block} AS bk FROM {table}),
cand AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM blocks a JOIN blocks b ON a.bk = b.bk AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN shingles sa ON sa.{id_col} = c.id_a
  JOIN shingles sb ON sb.{id_col} = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt) >= {threshold!r}
""".strip()


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------

def shingle_table(
    df: DataFrame, text: str = "text", n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram set per document: (id, sh). Pure array
    ops, no UDF. Input contract: one row per document (unique
    ``id_col``) — the per-document set semantics that every caller
    (and the SQL twin's SELECT DISTINCT) assumes.

    The dedup is IN-ROW (``array_distinct`` before the explode, r12):
    shingle-set dedup is per-document, so a corpus-scale
    ``.distinct()`` exchange of the exploded ~40x element relation —
    previously paid by EVERY consumer of this table, usually twice
    (candidate generation + verify recompute) — does the same work a
    row at a time with zero shuffle. Same idiom as
    :func:`token_sets`."""
    toks = df.select(F.col(id_col), F.split(F.col(text), " ").alias("toks")).filter(
        F.size("toks") >= n
    )
    gen = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
    )
    return toks.select(
        F.col(id_col), F.explode(F.array_distinct(gen)).alias("sh")
    )


def minhash_signatures(
    shingles: DataFrame, k: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash signature per doc via seeded xxhash64:
    ``sig_i = min over shingles of xxhash64(i, sh)``. One groupBy with
    k min-aggregates — map-side partial aggregation means the shuffle
    carries one k-long row per doc per partition, not per shingle
    (MinHash per Broder 1997; xxhash64 as the family of hash fns)."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}") for i in range(k)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_buckets(
    sigs: DataFrame, k: int = 32, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Banded-LSH bucket emission: hash each band of r = k/bands
    signature slots to a bucket id -> (id, band, bucket), ``bands``
    rows per doc. The shared first stage of self-join dedup
    (:func:`lsh_candidate_pairs`) and stream-vs-corpus ingest dedup
    (:func:`mpes_spark.streaming.live.neardup_ingest_sink`), where the
    corpus side is computed ONCE and persisted as the join target."""
    if k % bands:
        raise ValueError(f"bands={bands} must divide k={k}")
    r = k // bands
    band_rows = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * r + j}") for j in range(r)]
        band_rows.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_rows)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    sigs: DataFrame, k: int = 32, bands: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Banded-LSH candidate pairs: hash each band of r = k/bands
    signature slots to a bucket id, self-join per (band, bucket).
    Candidates are DISTINCT (id_a < id_b) pairs sharing >= 1 bucket.

    Scale: the join key is (band_idx, bucket_hash) — uniform by
    construction; bucket sizes follow the duplicate-cluster sizes, and
    AQE's skew-join handles a pathological mega-cluster. Never
    all-pairs."""
    buckets = lsh_buckets(sigs, k, bands, id_col)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame,
    shingles: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    broadcast_pairs: bool | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs: two equi-joins
    against the shingle table + one groupBy — only candidate pairs pay
    this cost.

    ``broadcast_pairs=None`` (default) leaves the join strategy to the
    optimizer: AQE measures the *actual* candidate-pair size at the
    shuffle boundary and converts to a broadcast join iff it fits under
    ``spark.sql.autoBroadcastJoinThreshold`` — the common LSH case,
    where candidates are orders of magnitude smaller than the shingle
    table. On a pathological corpus (template spam / boilerplate: every
    doc near-identical, so the candidate relation grows ~quadratically
    in the duplicate-cluster size) AQE instead keeps a shuffled join —
    a forced ``F.broadcast`` there would OOM the executors. Pass
    ``True``/``False`` only to pin the strategy for a known corpus."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "sh")
    sb = shingles.select(F.col(id_col).alias("id_b"), "sh")
    pairs_side = F.broadcast(pairs) if broadcast_pairs else pairs
    inter = (
        sa.join(pairs_side, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("icnt"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("nsh_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nsh_b"))
    jac = F.col("icnt") / (F.col("nsh_a") + F.col("nsh_b") - F.col("icnt"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def verify_jaccard_cross(
    pairs: DataFrame,
    sh_left: DataFrame,
    sh_right: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-Jaccard verification for candidate pairs whose two sides
    come from DIFFERENT shingle tables (``id_a`` from ``sh_left``,
    ``id_b`` from ``sh_right``) — the cross-relation form of
    :func:`verify_jaccard`, used when a micro-batch is checked against
    a static corpus and the two id spaces must not be conflated. Same
    plan shape: two equi-joins + one groupBy, paid only by candidate
    pairs; join strategy left to AQE (see :func:`verify_jaccard` on
    why a forced broadcast is wrong under template spam)."""
    sa = sh_left.select(F.col(id_col).alias("id_a"), "sh")
    sb = sh_right.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        sa.join(pairs, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("icnt"))
    )
    za = sh_left.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh_a")).select(
        F.col(id_col).alias("id_a"), "nsh_a"
    )
    zb = sh_right.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh_b")).select(
        F.col(id_col).alias("id_b"), "nsh_b"
    )
    jac = F.col("icnt") / (F.col("nsh_a") + F.col("nsh_b") - F.col("icnt"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_neardup_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    persist_shingles: bool = True,
) -> DataFrame:
    """End-to-end MinHash near-dup: shingle -> signature -> banded LSH
    buckets -> candidate pairs -> exact-Jaccard verify.

    The shingle relation feeds three consumers (signatures + both
    sides of the verification join); without persistence Spark
    re-derives it — re-scanning and re-exploding the corpus — once per
    consumer (audited: 14 exchanges -> fewer, 3 scans -> 1).
    ``persist_shingles`` caches it MEMORY_AND_DISK; the caller may
    ``unpersist()`` the returned plan's source after materializing."""
    sh = shingle_table(df, text, n, id_col)
    if persist_shingles:
        sh = sh.persist()
    sigs = minhash_signatures(sh, k, id_col)
    cand = lsh_candidate_pairs(sigs, k, bands, id_col)
    return verify_jaccard(cand, sh, threshold, id_col)


def _md5_hash_sql(i: int, arg: str, dialect: str) -> str:
    """Seeded 60-bit integer hash both engines compute identically:
    the first 15 hex chars of md5(seed || '|' || s) as a BIGINT. md5
    is the one hash function the two engines share bit-for-bit."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    inner = f"md5(concat(CAST({i} AS {s}), '|', {arg}))"
    if dialect == "spark":
        return f"CAST(conv(substring({inner}, 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr({inner}, 1, 15)) AS BIGINT)"


def minhash_lsh_sql(
    table: str,
    dialect: str,
    n: int = 3,
    k: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> str:
    """Fully oracle-expressible MinHash + banded LSH + exact-Jaccard
    verification — the SAME four-stage structure as the production
    xxhash64 path (:func:`minhash_neardup_pairs`), rendered with the
    engine-portable md5 hash family so DuckDB can replay every stage
    bit-for-bit (xxhash64 has no DuckDB twin, which is why the
    production query carries only a rows-only check; this variant
    puts the full sketch->band->verify pipeline under the hash-match
    gate). Band buckets join on the exact signature-slice tuple
    (string key) — no second-level hash to diverge on. k stays small
    (md5 costs ~4x xxhash64); at production scale you run the
    xxhash64 rendering."""
    if k % bands:
        raise ValueError(f"bands={bands} must divide k={k}")
    r = k // bands
    sh = _shingle_cte(table, n, dialect, id_col)
    s = "STRING" if dialect == "spark" else "VARCHAR"
    mins = ", ".join(
        f"min({_md5_hash_sql(i, 'sh', dialect)}) AS mh_{i}" for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        "SELECT {id}, {b} AS band, concat_ws('|', {cols}) AS bk FROM sigs".format(
            id=id_col,
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * r + j} AS {s})" for j in range(r)
            ),
        )
        for b in range(bands)
    )
    return f"""
WITH shingles AS ({sh}),
sizes AS (SELECT {id_col}, count(*) AS nsh FROM shingles GROUP BY {id_col}),
sigs AS (SELECT {id_col}, {mins} FROM shingles GROUP BY {id_col}),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bk = b.bk AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN shingles sa ON sa.{id_col} = c.id_a
  JOIN shingles sb ON sb.{id_col} = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt) >= {threshold!r}
""".strip()


def blocked_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    block_tokens: int = 2,
    threshold: float = 0.5,
    waves: int = 1,
) -> DataFrame:
    """DataFrame rendering of :func:`blocked_jaccard_sql` (same
    semantics, value-identical output). The shingle relation is
    RECOMPUTED by its consumers, not persisted (r9, measured cold
    under the order-independent bench protocol): its lineage is one
    pruned scan + a stateless explode, so paying it per consumer
    beats materializing a corpus-scale relation into storage — and at
    100 TB a persisted shingle table would be a memory hazard while
    recompute stays embarrassingly parallel. Use this form when the
    pair list feeds further computation (e.g. cluster resolution);
    the SQL twin stays the oracle.

    ``waves`` > 1 runs candidate+verify per hash band of the block
    key (r11 scratch bound, see :func:`prefix_filtered_pairs`). Each
    doc has exactly ONE block key, so the bands partition the docs
    and every pair surfaces in exactly one wave — the union needs no
    cross-wave distinct."""
    sh = shingle_table(df, text, n, id_col)
    blocks = df.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.slice(F.split(F.col(text), " "), 1, block_tokens)
        ).alias("bk"),
    )

    def _cand(blk: DataFrame) -> DataFrame:
        a, b = blk.alias("a"), blk.alias("b")
        return a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )

    if waves <= 1:
        # persist: verify consumes the shingle relation three times
        # (sizes + both join sides). Until r12 the in-plan `.distinct()`
        # exchange doubled as a shared materialization point
        # (ReusedExchange); with the distinct now in-row (see
        # :func:`shingle_table`) an unpersisted lineage would re-run
        # the scan+explode once per consumer. MEMORY_AND_DISK, the
        # minhash_neardup_pairs precedent.
        return verify_jaccard(_cand(blocks), sh.persist(), threshold, id_col)
    shh = sh.select(F.col(id_col), F.xxhash64("sh").alias("sh"))
    parts: list[DataFrame] = []
    for i in range(waves):
        cand = _cand(blocks.filter(_wave_band("bk", waves, i))).localCheckpoint(
            eager=True
        )
        # hashed-element verify in waves (see prefix_filtered_pairs)
        sh_w = _wave_doc_filter(shh, cand, id_col)
        parts.append(
            verify_jaccard(
                cand, sh_w, threshold, id_col, broadcast_pairs=True
            ).localCheckpoint(eager=True)
        )
        _wave_gc(cand)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def blocked_containment_sql(
    table: str,
    dialect: str,
    n: int = 3,
    block_tokens: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> str:
    """Asymmetric near-dup: word-``n``-gram CONTAINMENT
    ``|A ∩ B| / min(|A|, |B|)`` over prefix-blocked candidate pairs
    (Broder 1997's containment coefficient). This is the measure
    symmetric Jaccard structurally misses: a short document quoted
    verbatim inside a long one has Jaccard ~= |A|/|B| -> 0 but
    containment = 1 — exactly the embedded-duplication case
    training-data dedup must catch (boilerplate-wrapped articles,
    quoted posts, README prefixes). Output: (id_a, id_b,
    containment) for pairs at or above ``threshold``.

    Same scale shape as :func:`blocked_jaccard_sql`: candidate join
    equi-keyed on the block key, intersection join equi-keyed on
    (pair, shingle), never all-pairs; at 100 TB the block key becomes
    an LSH band."""
    if dialect == "spark":
        block = f"concat_ws(' ', slice(split(text, ' '), 1, {block_tokens}))"
    else:
        block = f"array_to_string(string_split(text, ' ')[1:{block_tokens}], ' ')"
    sh = _shingle_cte(table, n, dialect, id_col)
    return f"""
WITH shingles AS ({sh}),
sizes AS (SELECT {id_col}, count(*) AS nsh FROM shingles GROUP BY {id_col}),
blocks AS (SELECT {id_col}, {block} AS bk FROM {table}),
cand AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM blocks a JOIN blocks b ON a.bk = b.bk AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN shingles sa ON sa.{id_col} = c.id_a
  JOIN shingles sb ON sb.{id_col} = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / least(za.nsh, zb.nsh), 6) AS containment
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / least(za.nsh, zb.nsh) >= {threshold!r}
""".strip()


def _shingle_cte_multiset(
    table: str, n: int, dialect: str, id_col: str = "doc_id"
) -> str:
    """CTE body producing the MULTISET word ``n``-gram bag per doc:
    (doc_id, sh, cnt) — the occurrence-counted sibling of
    :func:`_shingle_cte` (which dedups)."""
    if dialect == "spark":
        gen = (
            f"explode(transform(sequence(0, size(toks) - {n}), "
            f"i -> concat_ws(' ', slice(toks, i + 1, {n}))))"
        )
        split = "split(text, ' ')"
        guard = f"size(toks) >= {n}"
    elif dialect == "duckdb":
        gen = (
            f"unnest(list_transform(range(len(toks) - {n} + 1), "
            f"i -> array_to_string(toks[i + 1: i + {n}], ' ')))"
        )
        split = "string_split(text, ' ')"
        guard = f"len(toks) >= {n}"
    else:
        raise ValueError(dialect)
    return (
        f"SELECT {id_col}, sh, count(*) AS cnt FROM ("
        f"SELECT {id_col}, {gen} AS sh FROM "
        f"(SELECT {id_col}, {split} AS toks FROM {table}) tok_t "
        f"WHERE {guard}) sh_t GROUP BY {id_col}, sh"
    )


def weighted_shingle_table(
    df: DataFrame, text: str = "text", n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Multiset word n-gram bag per document: (id, sh, cnt)."""
    toks = df.select(
        F.col(id_col), F.split(F.col(text), " ").alias("toks")
    ).filter(F.size("toks") >= n)
    gen = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
    )
    return (
        toks.select(F.col(id_col), F.explode(gen).alias("sh"))
        .groupBy(id_col, "sh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def blocked_weighted_jaccard(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    block_tokens: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """WEIGHTED (multiset) Jaccard over blocked candidate pairs:
    sum(min(cnt_a, cnt_b)) / sum(max(cnt_a, cnt_b)) over the shingle
    BAGS — the repetition-aware measure set Jaccard structurally
    misses: a doc that repeats one template paragraph 50 times has
    the same shingle SET as a doc containing it once (set J = 1.0
    against it), while its multiset similarity correctly drops.
    Spam/boilerplate dedup wants the bag verdict.

    Identity that keeps the plan one aggregation: sum(max) =
    size_a + size_b - sum(min), so only the intersection join
    (equi-keyed on (pair, shingle), paid by candidates only) and two
    doc-total sizes are needed — the exact shape of the set-Jaccard
    verify with icnt -> sum(min). All-integer numerator/denominator:
    the ratio is one IEEE divide, rounded for output only."""
    sh = weighted_shingle_table(df, text, n, id_col)
    sizes = sh.groupBy(id_col).agg(F.sum("cnt").alias("nsh"))
    blocks = df.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.slice(F.split(F.col(text), " "), 1, block_tokens)
        ).alias("bk"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = a.join(
        b,
        (F.col("a.bk") == F.col("b.bk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    sa = sh.select(F.col(id_col).alias("id_a"), "sh", F.col("cnt").alias("ca"))
    sb = sh.select(F.col(id_col).alias("id_b"), "sh", F.col("cnt").alias("cb"))
    inter = (
        sa.join(cand, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ca", "cb")).alias("imin"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("na"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nb"))
    wj = F.col("imin") / (F.col("na") + F.col("nb") - F.col("imin"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .filter(wj >= threshold)
        .select("id_a", "id_b", F.round(wj, 6).alias("weighted_jaccard"))
    )


def blocked_weighted_jaccard_sql(
    table: str,
    dialect: str,
    n: int = 3,
    block_tokens: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> str:
    """Dual-dialect twin of :func:`blocked_weighted_jaccard`."""
    if dialect == "spark":
        block = f"concat_ws(' ', slice(split(text, ' '), 1, {block_tokens}))"
    else:
        block = f"array_to_string(string_split(text, ' ')[1:{block_tokens}], ' ')"
    sh = _shingle_cte_multiset(table, n, dialect, id_col)
    return f"""
WITH bags AS ({sh}),
sizes AS (SELECT {id_col}, sum(cnt) AS nsh FROM bags GROUP BY {id_col}),
blocks AS (SELECT {id_col}, {block} AS bk FROM {table}),
cand AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM blocks a JOIN blocks b ON a.bk = b.bk AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, sum(least(sa.cnt, sb.cnt)) AS imin
  FROM cand c
  JOIN bags sa ON sa.{id_col} = c.id_a
  JOIN bags sb ON sb.{id_col} = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.imin AS DOUBLE) / (za.nsh + zb.nsh - i.imin), 6)
         AS weighted_jaccard
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.imin AS DOUBLE) / (za.nsh + zb.nsh - i.imin) >= {threshold!r}
""".strip()


def token_sets(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word (unigram) set per document: (id, sh) — the
    token-set analog of :func:`shingle_table`, shared by the
    prefix-filtered similarity join."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text), " "))).alias("sh"),
    )


def _wave_band(col: str, waves: int, i: int):
    """Deterministic hash band predicate for waved execution."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(waves)) == i


def _wave_slice(col: str, s: int, j: int):
    """Sub-slice predicate inside one wave: deterministic hash of the
    candidate's LEFT doc id (seeded so it decorrelates from
    :func:`_wave_band`'s unseeded hash)."""
    return F.pmod(F.xxhash64(F.lit(7), F.col(col)), F.lit(s)) == j


def _wave_subslices(mass_rows, waves: int) -> dict[int, int]:
    """Per-band sub-slice counts from measured candidate mass (r12,
    the waved-dedup "fifth onion layer" bound): a clique-heavy corpus
    concentrates candidate pairs on few prefix elements, so ONE band's
    candidate materialization can exceed the scratch envelope that
    waving exists to protect. Each band whose estimated candidate
    mass exceeds ``MPES_WAVE_CAND_CAP`` (default 2e8 pairs ≈ low-GB
    of pre-distinct join scratch; <= 0 disables) is split into
    ceil(mass / cap) slices by hash of the candidate's left doc id —
    every pair lands in exactly one slice of its band, so the union
    over slices is row-identical to the unsplit band while peak
    scratch is bounded by one slice's candidates. The mass estimate
    is one small aggregation over the (pinned, prefix-sized) element
    relation collected as ``waves`` numbers — a deliberate eager step
    in an already-eager (per-wave localCheckpoint) execution mode."""
    cap = float(os.environ.get("MPES_WAVE_CAND_CAP", "2e8"))
    out = {i: 1 for i in range(waves)}
    if cap <= 0 or not math.isfinite(cap):
        return out
    for r in mass_rows:
        if r["band"] is not None and r["m"] is not None:
            out[int(r["band"])] = max(1, math.ceil(float(r["m"]) / cap))
    return out


def _wave_gc(df: DataFrame) -> None:
    """Nudge the JVM between waves so the previous wave's shuffle
    files are actually reclaimed before the next wave writes its own.
    ContextCleaner releases a shuffle only after the JVM garbage-
    collects its unreferenced RDDs — under a busy driver that lags by
    several waves, and the waves' whole point is that at most ONE
    wave's scratch is live at a time (measured: waves accumulated to
    ENOSPC without this, while per-wave volume alone fit).

    Fires only under actual scratch PRESSURE (r11 re-measure): a
    forced full GC is pure pause time when the scratch volume has
    headroom — at gate scale (sf0.1, megabytes of wave scratch) the
    6 per-execution nudges cost 2.4 s of neardup_prefix_waved's
    14.5 s median while reclaiming nothing that matters. Pressure
    test, both terms workload-scaled and env-tunable: free scratch
    below an absolute floor (``MPES_WAVE_GC_FREE_GB``, default 32 —
    below this, the next wave can plausibly ENOSPC regardless of
    workload), or below ``MPES_WAVE_GC_HEADROOM`` (default 4) times
    the LIVE pinned-block bytes, the direct measure of this
    workload's per-wave scratch magnitude (the sf10 campaign's
    67 GB-free box with tens-of-GB waves fires immediately under
    either term; a TB-scratch cluster with the same waves skips
    until headroom genuinely thins)."""
    try:
        sc = df.sparkSession.sparkContext
        import shutil

        local = (
            sc._conf.get("spark.local.dir", None)
            or os.environ.get("SPARK_LOCAL_DIRS")
            or "/tmp"
        )
        free = shutil.disk_usage(local.split(",")[0]).free
        floor = float(os.environ.get("MPES_WAVE_GC_FREE_GB", "32")) * 1e9
        headroom = float(os.environ.get("MPES_WAVE_GC_HEADROOM", "4"))
        live = sum(
            r.diskSize() + r.memSize()
            for r in sc._jsc.sc().getRDDStorageInfo()
        )
        if free > max(floor, headroom * live):
            return
        sc._jvm.System.gc()
    except Exception:  # noqa: BLE001 - Connect mode has no _jvm; best-effort
        pass


def _wave_doc_filter(toks: DataFrame, cand: DataFrame, id_col: str) -> DataFrame:
    """Restrict an element relation to the docs a candidate wave
    touches — broadcast semi-join on the (candidate-bounded, small)
    wave doc-id set, so per-wave verify shuffles only the shingles of
    participating docs instead of the full ~40x relation."""
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    return toks.join(F.broadcast(ids), id_col, "left_semi")


def prefix_filtered_pairs(
    df: DataFrame,
    text: str = "text",
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    checkpoint: bool = True,
    waves: int = 1,
) -> DataFrame:
    """All-pairs set-similarity join via RARE-TOKEN prefix filtering
    (PPJoin-family, Bayardo et al. WWW'07 / Xiao et al. 2008): order
    each doc's token set by ascending global document frequency, keep
    only the first ``p = n - ceil(t*n) + 1`` tokens as the PREFIX,
    generate candidates only from prefix-token collisions, then
    verify exact Jaccard. COMPLETE for Jaccard >= t: two sets with
    J >= t must overlap in at least ``ceil(t/(1+t)*(na+nb))``
    elements, so under any consistent global token order each must
    keep at least one shared token inside its prefix — the
    completeness property test in tests/test_extras.py checks the
    output equals brute-force all-pairs exactly.

    Why this is a different scale tool than LSH or first-tokens
    blocking: candidate volume concentrates on RARE tokens — a token
    with document frequency d contributes at most d^2/2 candidate
    pairs, and prefixes preferentially hold the rarest tokens — so
    ubiquitous tokens (stopwords, boilerplate markers) never generate
    candidates at all, with zero recall loss (LSH trades recall;
    first-token blocking misses reordered text). Shuffles: one df
    agg, one doc-keyed window for prefixes, one equi-join on prefix
    token, then :func:`verify_jaccard` on the candidate set.

    ``n`` picks the set element: word ``n``-grams (default 3) or
    unigram tokens (n=1). The element space matters as much as the
    algorithm: prefix filtering needs a LONG RARE TAIL in the df
    distribution to prune (real text has hapax legomena). Under a
    small fixed vocabulary every unigram's df scales linearly with
    the corpus and no token is ever rare — measured 142 s at sf0.1
    (50k docs) for unigrams vs seconds for 3-gram shingles, whose
    combinatorial space keeps most elements rare at any corpus
    size (SCALING.md). Same completeness theorem either way.

    ``waves`` > 1 enables WAVED execution (r11, the sf10 disk-wall
    fix — SCALING.md "the scratch ceiling"): the candidate+verify
    stage runs in ``waves`` hash bands of the prefix element key, each
    wave materialized eagerly before the next starts, so peak shuffle
    scratch is bounded by one band's candidates plus the shingles of
    that wave's participating docs (broadcast-semi-filtered) instead
    of the full ~40x-corpus relation; clique-heavy bands are further
    sub-split under ``MPES_WAVE_CAND_CAP`` (r12 — see
    :func:`_wave_subslices`) so even one hot band's candidate
    materialization stays bounded. RESULT-IDENTICAL to waves=1: a
    qualifying pair shares >= 1 prefix element, that element hashes
    into exactly one band, so every pair is found (possibly in
    several bands — deduped by the final distinct), and each wave
    verifies against the docs' FULL shingle sets. Trade: the pruned
    scan + explode lineage re-executes per wave — recompute is the
    currency that buys bounded scratch."""
    toks = (
        token_sets(df, text, id_col)
        if n == 1
        else shingle_table(df, text, n, id_col)
    )
    if waves <= 1:
        # persist: the element relation feeds the hashed ranking
        # lineage AND the string-keyed verify three times (sizes +
        # both join sides). Until r12 shingle_table's in-plan
        # `.distinct()` exchange doubled as a shared materialization
        # point (ReusedExchange); with the distinct now in-row an
        # unpersisted lineage re-runs scan+explode per consumer
        # (isolated floor 4.9 -> 6.0 s at sf0.1 without this).
        # Waved mode deliberately recomputes instead — bounded
        # scratch outranks cache at sf10+.
        toks = toks.persist()
    # Prefix construction ranks on xxhash64(sh), not the string (r11,
    # second half of the sf10 scratch fix): the ranking stage is the
    # ONE remaining global sort of the ~40x element relation, and its
    # spill is dominated by the shingle STRINGS (~50 B each vs the
    # 8 B hash — measured: the string-keyed sort alone overflowed the
    # sf10 box that the waved candidate stage had just fit).
    # Output-IDENTICAL: prefix-filter completeness holds under ANY
    # consistent global element order — (tdf, hash) is one — and the
    # verify stage recomputes TRUE Jaccard from the string relation,
    # so extra candidates (tiebreak differences, hash-collision
    # collisions) cannot change the verified pairs. The one
    # theoretical gap: two DISTINCT shingles colliding on xxhash64
    # make the order a weak order at that key, and an inconsistent
    # tie-resolution at both docs' prefix boundaries could drop a
    # candidate — requires an exact 64-bit collision inside one
    # corpus (~n^2/2^65 odds; zero at any feasible n), and the
    # sf0.01 oracle gate verifies exactness empirically every round.
    toksh = toks.select(F.col(id_col), F.xxhash64("sh").alias("sh"))
    # element df via agg + equi-join, NOT a sh-keyed window: a window
    # would buffer each shingle's whole partition — a ubiquitous
    # element at 100 TB is one giant buffered partition, while the
    # agg is map-side combined and the join AQE-skew-splittable
    dfreq = toksh.groupBy("sh").agg(F.count(F.lit(1)).alias("tdf"))
    w = Window.partitionBy(id_col).orderBy(F.col("tdf").asc(), F.col("sh"))
    wn = Window.partitionBy(id_col)

    def _rank(el: DataFrame, df_rel: DataFrame) -> DataFrame:
        return (
            el.join(df_rel, "sh")
            # doc size rides the SAME doc-keyed exchange as the
            # ranking window (doc partitions are document-length-
            # bounded — safe to window, and it saves the separate
            # sizes agg + join)
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count(F.lit(1)).over(wn))
            .filter(
                F.col("rn")
                <= F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
            )
            # df=1 elements collide with nobody — dropping them from
            # the candidate join loses no pair (a match needs a SHARED
            # prefix element) and removes every singleton join key;
            # with a long rare tail that is most of the prefix relation
            .filter(F.col("tdf") >= 2)
            .select(F.col(id_col), "sh")
        )

    if waves > 1:
        # Doc-banded prefix CONSTRUCTION (r11, the final sf10 scratch
        # layer): the monolithic df-join + doc-keyed rank over the
        # full element relation was itself ~the box's scratch budget
        # (measured: runs died in these stages with every later stage
        # already waved). Ranking is per-doc independent, so it bands
        # by doc id with zero semantic effect; only the element-df
        # relation is global, and it is aggregated ONCE and pinned as
        # (small, distinct-element-bounded) checkpoint blocks that
        # each band re-shuffles instead of re-aggregating. Peak
        # scratch: max(one df aggregation, one band's join + sort).
        dfreq = dfreq.localCheckpoint(eager=True)
        pfx_parts = []
        for j in range(waves):
            pfx_parts.append(
                _rank(
                    toksh.filter(_wave_band(id_col, waves, j)), dfreq
                ).localCheckpoint(eager=True)
            )
            _wave_gc(toksh)
        prefix = pfx_parts[0]
        for p in pfx_parts[1:]:
            prefix = prefix.union(p)
    else:
        # consumed as BOTH sides of the candidate self-join — persist,
        # or the df-join + both windows execute twice (plan showed 4
        # Window ops before, 2 after)
        prefix = _rank(toksh, dfreq).persist()
    if waves <= 1:
        a = prefix.select(F.col(id_col).alias("id_a"), "sh")
        b = prefix.select(F.col(id_col).alias("id_b"), "sh")
        cand = (
            a.join(b, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # materialize the (small, true-pair-bounded) verified result so
        # the persisted relations can be released NOW — a long-lived
        # session (the ~200-query bench loop) would otherwise accumulate
        # their cached blocks across calls; checkpoint=False keeps the
        # live plan (and the caches) for plan inspection
        out = verify_jaccard(cand, toks, threshold, id_col)
        if not checkpoint:
            return out
        out = out.localCheckpoint(eager=True)
        prefix.unpersist()
        toks.unpersist()
        return out

    # Candidate-mass schedule (r12, VERDICT r11 #2): one small agg
    # over the pinned prefix relation estimates each band's candidate
    # pairs (sum over elements of c*(c-1)/2, c = prefix occurrences);
    # bands over MPES_WAVE_CAND_CAP are sub-split by hash of the
    # pair's LEFT id so one clique-heavy band can no longer
    # materialize an unbounded candidate set — see _wave_subslices.
    mass = (
        prefix.groupBy(
            F.pmod(F.xxhash64("sh"), F.lit(waves)).alias("band"), "sh"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("band")
        .agg(
            F.sum(F.col("c") * (F.col("c") - F.lit(1)) / F.lit(2)).alias("m")
        )
        .collect()
    )
    slices = _wave_subslices(mass, waves)
    parts: list[DataFrame] = []
    for i in range(waves):
        band = prefix.filter(_wave_band("sh", waves, i))
        for j in range(slices[i]):
            a = band.select(F.col(id_col).alias("id_a"), "sh")
            if slices[i] > 1:
                # every (id_a < id_b) pair is generated from its id_a
                # row, so slicing the a side by hash(id_a) partitions
                # the band's pairs exactly — complete and disjoint
                a = a.filter(_wave_slice("id_a", slices[i], j))
            b = band.select(F.col(id_col).alias("id_b"), "sh")
            cand = (
                a.join(b, "sh")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
                # pin the slice's candidates: consumed 3x below (doc
                # filter + verify), and the eager cut means this
                # slice's candidate shuffle is released before the
                # next plans
                .localCheckpoint(eager=True)
            )
            # Waved verify runs on the HASHED element relation with
            # the (slice-bounded, id-pair-only) candidates broadcast
            # (r11 fix ladder (a)+(c), SCALING.md): the sa side then
            # never shuffles, and the per-wave element shuffle
            # carries 16 B rows instead of ~60 B strings. icnt/nsh by
            # hash equal the string counts except under an exact
            # 64-bit collision (~1e-13/pair; the sf0.01 oracle gate
            # checks exactness empirically). The waves=1 gate path
            # stays string-keyed, exact by construction.
            toks_w = _wave_doc_filter(toksh, cand, id_col)
            parts.append(
                verify_jaccard(
                    cand, toks_w, threshold, id_col, broadcast_pairs=True
                ).localCheckpoint(eager=True)
            )
            _wave_gc(cand)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    # a pair can surface in several bands (one per shared prefix
    # element's band) with byte-identical verified rows
    out = out.distinct()
    out = out.localCheckpoint(eager=True) if checkpoint else out
    prefix.unpersist()
    return out


def prefix_filtered_pairs_sql(
    table: str,
    dialect: str,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
) -> str:
    """Dual-dialect SQL twin of :func:`prefix_filtered_pairs`. The
    threshold is inlined as ``CAST(repr AS DOUBLE)`` (the shared-SQL
    convention) and the prefix bound ``n - ceil(n*t) + 1`` evaluates
    identically in both engines on the same doubles."""
    t_lit = f"CAST('{threshold!r}' AS DOUBLE)"
    if n > 1:
        toks_cte = _shingle_cte(table, n, dialect, id_col)
    elif dialect == "spark":
        toks_cte = (
            f"SELECT {id_col}, explode(array_distinct(split(text, ' ')))"
            f" AS sh FROM {table}"
        )
    elif dialect == "duckdb":
        toks_cte = (
            f"SELECT {id_col}, unnest(list_distinct(string_split(text, ' ')))"
            f" AS sh FROM {table}"
        )
    else:
        raise ValueError(dialect)
    return f"""
WITH toks AS ({toks_cte}),
dfreq AS (SELECT sh, count(*) AS tdf FROM toks GROUP BY sh),
sizes AS (SELECT {id_col}, count(*) AS n FROM toks GROUP BY {id_col}),
prefix AS (
  SELECT {id_col}, sh FROM (
    SELECT t.{id_col}, t.sh, s.n,
           row_number() OVER (PARTITION BY t.{id_col}
                              ORDER BY d.tdf, t.sh) AS rn
    FROM toks t
    JOIN dfreq d ON d.sh = t.sh
    JOIN sizes s ON s.{id_col} = t.{id_col}
  ) r WHERE rn <= n - ceil(n * {t_lit}) + 1
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN toks ta ON ta.{id_col} = c.id_a
  JOIN toks tb ON tb.{id_col} = c.id_b AND tb.sh = ta.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / (za.n + zb.n - i.icnt), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / (za.n + zb.n - i.icnt) >= {t_lit}
""".strip()


def _dual_verify(
    cand: DataFrame,
    toks: DataFrame,
    jaccard_threshold: float,
    containment_threshold: float,
    id_col: str,
) -> DataFrame:
    """ONE intersection aggregation; Jaccard and containment are both
    ratios over (icnt, nsh_a, nsh_b) — shared work, single agg."""
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("nsh"))
    sa = toks.select(F.col(id_col).alias("id_a"), "sh")
    sb = toks.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        sa.join(cand, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("icnt"))
    )
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("nsh").alias("nsh_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("nsh").alias("nsh_b"))
    jac = F.col("icnt") / (F.col("nsh_a") + F.col("nsh_b") - F.col("icnt"))
    cont = F.col("icnt") / F.least("nsh_a", "nsh_b")
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .filter(
            (jac >= jaccard_threshold) | (cont >= containment_threshold)
        )
        .select(
            "id_a",
            "id_b",
            F.round(jac, 6).alias("jaccard"),
            F.round(cont, 6).alias("containment"),
            (jac >= jaccard_threshold).cast("int").alias("jaccard_dup"),
            (cont >= containment_threshold).cast("int").alias(
                "containment_dup"
            ),
        )
    )


def prefix_dual_pairs(
    df: DataFrame,
    text: str = "text",
    jaccard_threshold: float = 0.5,
    containment_threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    checkpoint: bool = True,
    waves: int = 1,
) -> DataFrame:
    """Dual-measure similarity self-join: Jaccard AND containment
    verdicts for every near-dup pair, computed off ONE shared
    candidate relation and ONE intersection aggregation (the
    SCALING.md "the intersection join is shared work" note, made
    real). Output: (id_a, id_b, jaccard, containment, jaccard_dup,
    containment_dup) for pairs passing EITHER threshold.

    Candidate generation is a ONE-SIDED prefix join — prefix(A)
    joined against the FULL element relation of B — which is complete
    for both measures at once:

    * Jaccard >= tj: the standard PPJoin pigeonhole gives a shared
      element inside BOTH p_j-prefixes; a fortiori one side's prefix
      hits the other side's full set.
    * containment >= tc: with na <= nb the overlap is at least
      ceil(tc * na), so the SMALLER doc must keep a shared element
      within its first na - ceil(tc * na) + 1 elements of any
      consistent global order — and the larger doc's full set
      trivially contains it. (A two-sided prefix join is NOT complete
      for containment: the larger doc's own-size prefix can miss
      every shared element when na << nb — the exact embedded-doc
      case containment exists to catch.)

    Each doc's prefix length uses t_eff = min(tj, tc), which
    dominates both requirements. Probe-side rows with global df = 1
    are dropped (a shared element appears in two docs, so its df is
    >= 2) — with a long rare tail that is most of the element
    relation. The verify stage then runs ONE (id_a, id_b)-keyed
    count aggregate; both ratios and both flags derive from that
    single intersection relation — no second candidate pass, no
    second intersection join, unlike running the Jaccard and
    containment operators separately (2 full pipelines).

    Scale: candidate volume is rare-token-bounded on the prefix side
    (an element with df = d contributes at most (prefix occurrences
    of it) * d candidates, and ubiquitous elements are in nobody's
    prefix); the one-sided join is the price of containment
    completeness and is the standard asymmetric-prefix scheme. All
    joins equi-keyed; the element relation is RECOMPUTED per consumer
    (cheap scan+explode lineage — persisting it was measurably slower
    cold and would be a memory hazard at scale, r9)."""
    t_eff = min(jaccard_threshold, containment_threshold)
    toks = (
        token_sets(df, text, id_col)
        if n == 1
        else shingle_table(df, text, n, id_col)
    )
    if waves <= 1:
        # persist: ranking lineage + three verify consumers — see
        # prefix_filtered_pairs (r12; waved mode recomputes by design)
        toks = toks.persist()
    # hash-keyed ranking/candidates, string-keyed verify — same
    # scratch rationale and output-identity argument as
    # prefix_filtered_pairs (r11)
    toksh = toks.select(F.col(id_col), F.xxhash64("sh").alias("sh"))
    dfreq = toksh.groupBy("sh").agg(F.count(F.lit(1)).alias("tdf"))
    w = Window.partitionBy(id_col).orderBy(F.col("tdf").asc(), F.col("sh"))
    wn = Window.partitionBy(id_col)
    # element df via agg + equi-join (NOT a sh-keyed window — see
    # prefix_filtered_pairs); doc size rides the doc-keyed exchange
    enriched = (
        toksh.join(dfreq, "sh")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("nsz", F.count(F.lit(1)).over(wn))
        .filter(F.col("tdf") >= 2)  # df=1 elements collide with nobody
        .persist()
    )
    prefix = enriched.filter(
        F.col("rn") <= F.col("nsz") - F.ceil(F.col("nsz") * F.lit(t_eff)) + 1
    ).select(F.col(id_col).alias("id_p"), "sh")
    probe = enriched.select(F.col(id_col).alias("id_q"), "sh")

    def _cand(pfx: DataFrame) -> DataFrame:
        return (
            pfx.join(probe, "sh")
            .filter(F.col("id_p") != F.col("id_q"))
            .select(
                F.least("id_p", "id_q").alias("id_a"),
                F.greatest("id_p", "id_q").alias("id_b"),
            )
            .distinct()
        )

    if waves <= 1:
        out = _dual_verify(
            _cand(prefix), toks, jaccard_threshold, containment_threshold,
            id_col,
        )
        if not checkpoint:
            return out
        out = out.localCheckpoint(eager=True)
        enriched.unpersist()
        toks.unpersist()
        return out

    # Waved execution (r11, sf10 scratch bound — see
    # prefix_filtered_pairs): bands over the PREFIX side's element key
    # only (the one-sided join stays complete — the shared prefix
    # element lands in exactly one band); per-wave verify against the
    # wave docs' FULL element sets; byte-identical rows across bands
    # collapse in the final distinct.
    # Candidate-mass schedule (r12, VERDICT r11 #2): the one-sided
    # join emits tdf probe rows per prefix row, so each band's
    # candidate mass is sum(tdf) over its prefix rows — one agg over
    # the persisted enriched relation. Hot bands sub-split by hash of
    # id_p; a pair can then surface in two slices (once per
    # direction), which the final cross-band distinct already
    # collapses — see _wave_subslices.
    mass = (
        enriched.filter(
            F.col("rn")
            <= F.col("nsz") - F.ceil(F.col("nsz") * F.lit(t_eff)) + 1
        )
        .groupBy(F.pmod(F.xxhash64("sh"), F.lit(waves)).alias("band"))
        .agg(F.sum("tdf").cast("double").alias("m"))
        .collect()
    )
    slices = _wave_subslices(mass, waves)
    parts: list[DataFrame] = []
    for i in range(waves):
        band_p = prefix.filter(_wave_band("sh", waves, i))
        for j in range(slices[i]):
            pfx = (
                band_p
                if slices[i] == 1
                else band_p.filter(_wave_slice("id_p", slices[i], j))
            )
            cand = _cand(pfx).localCheckpoint(eager=True)
            # hashed-element verify in waves (see prefix_filtered_pairs)
            toks_w = _wave_doc_filter(toksh, cand, id_col)
            parts.append(
                _dual_verify(
                    cand, toks_w, jaccard_threshold, containment_threshold,
                    id_col,
                ).localCheckpoint(eager=True)
            )
            _wave_gc(cand)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    out = out.distinct()
    out = out.localCheckpoint(eager=True) if checkpoint else out
    enriched.unpersist()
    return out


def prefix_filtered_join(
    left: DataFrame,
    right: DataFrame,
    text: str = "text",
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Cross-RELATION prefix-filtered similarity join (the R-S form
    of :func:`prefix_filtered_pairs`): every (left-doc, right-doc)
    pair with exact element-set Jaccard >= ``threshold``. This is
    the join a daily ingest actually runs at 100 TB — a new batch
    checked against the standing corpus with ZERO recall loss
    (LSH-based ingest dedup trades recall; this is complete).

    Completeness: element df is computed over the UNION of both
    relations, giving one consistent global order; each side keeps
    its own prefix of n_doc - ceil(t*n_doc) + 1 rarest elements. For
    J(A,B) >= t the overlap is >= ceil(t*max(na,nb)), and the
    prefix-filter principle (Chaudhuri et al. 2006) then guarantees
    the two prefixes intersect — both kept prefixes are at least as
    long as the joint theorem needs since ceil(t*n_side) <=
    ceil(t*max). The brute-force-equality property test exercises
    this cross-relation form directly.

    Scale: the batch side is typically orders of magnitude smaller —
    its prefix relation broadcasts (AQE decides); candidate volume
    still concentrates on rare elements, and union-df=1 elements
    (appearing once across BOTH relations) are pruned from both
    prefixes. Output: (id_a = left id, id_b = right id, jaccard) —
    ids may coincide across relations; they are namespaced by side,
    not compared."""
    def mk(d: DataFrame) -> DataFrame:
        return (
            token_sets(d, text, id_col)
            if n == 1
            else shingle_table(d, text, n, id_col)
        )

    tl = mk(left).persist()
    tr = mk(right).persist()
    dfreq = (
        tl.select("sh")
        .unionAll(tr.select("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("tdf"))
    )

    def _prefix(toks: DataFrame) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(F.col("tdf").asc(), F.col("sh"))
        wn = Window.partitionBy(id_col)
        return (
            toks.join(dfreq, "sh")
            .withColumn("rn", F.row_number().over(w))
            .withColumn("nsz", F.count(F.lit(1)).over(wn))
            .filter(
                F.col("rn")
                <= F.col("nsz") - F.ceil(F.col("nsz") * F.lit(threshold)) + 1
            )
            .filter(F.col("tdf") >= 2)
            .select(F.col(id_col), "sh")
        )

    cand = (
        _prefix(tl)
        .select(F.col(id_col).alias("id_a"), "sh")
        .join(_prefix(tr).select(F.col(id_col).alias("id_b"), "sh"), "sh")
        .select("id_a", "id_b")
        .distinct()
    )
    out = verify_jaccard_cross(cand, tl, tr, threshold, id_col)
    if not checkpoint:
        return out
    out = out.localCheckpoint(eager=True)
    tl.unpersist()
    tr.unpersist()
    return out


def prefix_filtered_join_sql(
    left_table: str,
    right_table: str,
    dialect: str,
    threshold: float = 0.9,
    n: int = 3,
    id_col: str = "doc_id",
) -> str:
    """Dual-dialect SQL twin of :func:`prefix_filtered_join`
    (union-df global order, per-side prefixes, cross-relation
    candidate join, exact-Jaccard verify)."""
    shl = _shingle_cte(left_table, n, dialect, id_col)
    shr = _shingle_cte(right_table, n, dialect, id_col)
    t_lit = repr(threshold)
    return f"""
WITH toks_l AS ({shl}),
toks_r AS ({shr}),
dfreq AS (
  SELECT sh, count(*) AS tdf FROM (
    SELECT sh FROM toks_l UNION ALL SELECT sh FROM toks_r
  ) u GROUP BY sh
),
pref_l AS (
  SELECT {id_col}, sh FROM (
    SELECT t.{id_col}, t.sh, d.tdf,
           row_number() OVER (PARTITION BY t.{id_col}
                              ORDER BY d.tdf, t.sh) AS rn,
           count(*) OVER (PARTITION BY t.{id_col}) AS nsz
    FROM toks_l t JOIN dfreq d ON d.sh = t.sh
  ) r WHERE rn <= nsz - ceil(nsz * {t_lit}) + 1 AND tdf >= 2
),
pref_r AS (
  SELECT {id_col}, sh FROM (
    SELECT t.{id_col}, t.sh, d.tdf,
           row_number() OVER (PARTITION BY t.{id_col}
                              ORDER BY d.tdf, t.sh) AS rn,
           count(*) OVER (PARTITION BY t.{id_col}) AS nsz
    FROM toks_r t JOIN dfreq d ON d.sh = t.sh
  ) r WHERE rn <= nsz - ceil(nsz * {t_lit}) + 1 AND tdf >= 2
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM pref_l a JOIN pref_r b ON a.sh = b.sh
),
sizes_l AS (SELECT {id_col}, count(*) AS nsh FROM toks_l GROUP BY {id_col}),
sizes_r AS (SELECT {id_col}, count(*) AS nsh FROM toks_r GROUP BY {id_col}),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN toks_l ta ON ta.{id_col} = c.id_a
  JOIN toks_r tb ON tb.{id_col} = c.id_b AND tb.sh = ta.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt), 6) AS jaccard
FROM inter i
JOIN sizes_l za ON za.{id_col} = i.id_a
JOIN sizes_r zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt) >= {t_lit}
""".strip()


def prefix_dual_pairs_sql(
    table: str,
    dialect: str,
    jaccard_threshold: float = 0.5,
    containment_threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
) -> str:
    """Dual-dialect SQL twin of :func:`prefix_dual_pairs` (one-sided
    prefix candidates at t_eff = min(tj, tc), single intersection
    CTE, both ratios from it)."""
    t_eff = min(jaccard_threshold, containment_threshold)
    sh = _shingle_cte(table, n, dialect, id_col)
    tj, tc = jaccard_threshold, containment_threshold
    return f"""
WITH toks AS ({sh}),
dfreq AS (SELECT sh, count(*) AS tdf FROM toks GROUP BY sh),
ranked AS (
  SELECT t.{id_col}, t.sh, d.tdf,
         row_number() OVER (PARTITION BY t.{id_col}
                            ORDER BY d.tdf, t.sh) AS rn,
         count(*) OVER (PARTITION BY t.{id_col}) AS nsz
  FROM toks t JOIN dfreq d ON d.sh = t.sh
),
enriched AS (
  -- rank over the FULL element set (the pigeonhole prefix is defined
  -- on it), THEN drop df=1 rows (a shared element always has df >= 2)
  SELECT * FROM ranked WHERE tdf >= 2
),
cand AS (
  SELECT DISTINCT least(p.{id_col}, q.{id_col}) AS id_a,
                  greatest(p.{id_col}, q.{id_col}) AS id_b
  FROM enriched p JOIN enriched q
    ON p.sh = q.sh AND p.{id_col} <> q.{id_col}
  WHERE p.rn <= p.nsz - ceil(p.nsz * {t_eff!r}) + 1
),
sizes AS (SELECT {id_col}, count(*) AS nsh FROM toks GROUP BY {id_col}),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS icnt
  FROM cand c
  JOIN toks ta ON ta.{id_col} = c.id_a
  JOIN toks tb ON tb.{id_col} = c.id_b AND tb.sh = ta.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt), 6) AS jaccard,
       round(CAST(i.icnt AS DOUBLE) / least(za.nsh, zb.nsh), 6) AS containment,
       CAST(CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt) >= {tj!r} AS INT)
         AS jaccard_dup,
       CAST(CAST(i.icnt AS DOUBLE) / least(za.nsh, zb.nsh) >= {tc!r} AS INT)
         AS containment_dup
FROM inter i
JOIN sizes za ON za.{id_col} = i.id_a
JOIN sizes zb ON zb.{id_col} = i.id_b
WHERE CAST(i.icnt AS DOUBLE) / (za.nsh + zb.nsh - i.icnt) >= {tj!r}
   OR CAST(i.icnt AS DOUBLE) / least(za.nsh, zb.nsh) >= {tc!r}
""".strip()


def ngram_novelty(
    df: DataFrame, text: str = "text", n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document novelty: the fraction of the doc's DISTINCT word
    ``n``-gram shingles that occur in no other document (corpus
    frequency 1). Low novelty flags template/boilerplate-dominated or
    heavily-duplicated documents; the same corpus-frequency counting
    is the core of exact substring-level dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better").
    Output: (doc_id, n_shingles, n_unique, novelty); docs shorter
    than ``n`` tokens have no shingle set and are absent.

    Scale shape — two aggregations, no join back on the shingle key:
    the frequency agg keeps ``min(doc_id)`` as the unique shingle's
    OWNER, so df=1 rows re-aggregate straight to per-doc counts and
    the (potentially huge, skewed) shingle relation is never joined
    against itself. A ubiquitous shingle costs one map-side-combined
    count, not a skewed join partition. The shingle relation is
    RECOMPUTED by its two consumers, not persisted (r9, measured):
    its lineage is one pruned scan + a stateless explode, so paying it
    twice is 35% cheaper cold than materializing millions of rows into
    storage — and at 100 TB a persisted shingle relation (larger than
    the corpus) would be a memory disaster while the recompute stays
    embarrassingly parallel."""
    sh = shingle_table(df, text, n, id_col)
    freq = sh.groupBy("sh").agg(
        F.count(F.lit(1)).alias("df_cnt"), F.min(id_col).alias("owner")
    )
    uniq = (
        freq.filter(F.col("df_cnt") == 1)
        .groupBy(F.col("owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return sizes.join(uniq, id_col, "left").select(
        id_col,
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.coalesce(F.col("n_unique"), F.lit(0)).cast("bigint").alias("n_unique"),
        F.round(
            F.coalesce(F.col("n_unique"), F.lit(0)) / F.col("n_shingles"), 6
        ).alias("novelty"),
    )


def ngram_novelty_sql(
    table: str, dialect: str, n: int = 3, id_col: str = "doc_id"
) -> str:
    """Dual-dialect SQL twin of :func:`ngram_novelty` (same
    owner-reaggregation shape: frequency agg carries min(doc_id), df=1
    rows re-group per owner — no shingle self-join)."""
    sh = _shingle_cte(table, n, dialect, id_col)
    return f"""
WITH shingles AS ({sh}),
freq AS (SELECT sh, count(*) AS df_cnt, min({id_col}) AS owner
         FROM shingles GROUP BY sh),
sizes AS (SELECT {id_col}, count(*) AS n_shingles FROM shingles GROUP BY {id_col}),
uniq AS (SELECT owner AS {id_col}, count(*) AS n_unique
         FROM freq WHERE df_cnt = 1 GROUP BY owner)
SELECT s.{id_col},
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(u.n_unique, 0) AS BIGINT) AS n_unique,
       round(CAST(coalesce(u.n_unique, 0) AS DOUBLE) / s.n_shingles, 6) AS novelty
FROM sizes s LEFT JOIN uniq u ON u.{id_col} = s.{id_col}
""".strip()


def ngram_novelty_k(
    df: DataFrame,
    text: str = "text",
    n: int = 3,
    k: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """df<=K novelty: per-document fraction of its DISTINCT word
    ``n``-gram shingles whose corpus document-frequency is at most
    ``k`` (generalizing :func:`ngram_novelty`, which is the k=1 case
    via the owner trick). Output: (doc_id, n_shingles, n_rare,
    novelty_k).

    Scale shape — COUNT FIRST, LIST SECOND (the SCALING.md-documented
    extension of the novelty owner trick): the frequency aggregation
    runs before any list materializes, rare shingles (df <= k) are
    filtered out of it, and only THEN are owner lists built — via
    ``slice(sort_array(collect_set(id)), 1, k)`` over a relation where
    every group holds <= k rows BY CONSTRUCTION (the df filter already
    bounded it). A ubiquitous shingle ("in the", df = 1e9) costs one
    map-side-combined count and never materializes a list or a join
    row. The rejoin on the shingle key touches only rare keys, each
    carrying <= k rows — bounded multiplicity, no skew partition. The
    owner-list explode then re-aggregates to doc-keyed counts, so the
    final join is doc-sized vs doc-sized."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # recompute-not-persist: same scale argument as ngram_novelty (r9)
    sh = shingle_table(df, text, n, id_col)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_cnt"))
    rare = freq.filter(F.col("df_cnt") <= k).select("sh")
    owners = (
        sh.join(rare, "sh")
        .groupBy("sh")
        .agg(
            F.slice(F.sort_array(F.collect_set(F.col(id_col))), 1, k).alias(
                "owners"
            )
        )
    )
    rare_per_doc = (
        owners.select(F.explode("owners").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_rare"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    out = sizes.join(rare_per_doc, id_col, "left").select(
        id_col,
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.coalesce(F.col("n_rare"), F.lit(0)).cast("bigint").alias("n_rare"),
        F.round(
            F.coalesce(F.col("n_rare"), F.lit(0)) / F.col("n_shingles"), 6
        ).alias("novelty_k"),
    )
    return out


def ngram_novelty_k_sql(
    table: str, dialect: str, n: int = 3, k: int = 2, id_col: str = "doc_id"
) -> str:
    """Dual-dialect SQL twin of :func:`ngram_novelty_k` (count-first
    df filter, rare-key rejoin, doc-keyed final join)."""
    sh = _shingle_cte(table, n, dialect, id_col)
    return f"""
WITH shingles AS ({sh}),
freq AS (SELECT sh, count(*) AS df_cnt FROM shingles GROUP BY sh),
rare AS (SELECT sh FROM freq WHERE df_cnt <= {k}),
sizes AS (SELECT {id_col}, count(*) AS n_shingles FROM shingles GROUP BY {id_col}),
rcnt AS (
  SELECT s.{id_col}, count(*) AS n_rare
  FROM shingles s JOIN rare r ON r.sh = s.sh
  GROUP BY s.{id_col}
)
SELECT z.{id_col},
       CAST(z.n_shingles AS BIGINT) AS n_shingles,
       CAST(coalesce(c.n_rare, 0) AS BIGINT) AS n_rare,
       round(CAST(coalesce(c.n_rare, 0) AS DOUBLE) / z.n_shingles, 6) AS novelty_k
FROM sizes z LEFT JOIN rcnt c ON c.{id_col} = z.{id_col}
""".strip()


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def _free_local_checkpoint(df: DataFrame) -> None:
    """Best-effort EAGER release of a ``localCheckpoint``'s persisted
    blocks (r9, the dedup_clusters sf1 GC-spike fix): a local
    checkpoint persists its RDD in the block manager, and without an
    explicit unpersist those blocks linger until the JVM happens to
    GC the superseded RDD handle — at sf1 the accumulated superseded
    label generations produced an 8x-median GC-stalled rep. The
    checkpointed RDD sits on the analyzed LogicalRDD plan; unpersist
    it non-blocking. Internal-API access is wrapped so a Spark version
    drift degrades back to GC-timed cleanup, never an error."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 - cleanup is best-effort by design
        pass


def connected_components(
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    driver_edge_limit: int = 1_000_000,
) -> DataFrame:
    """Resolve near-dup pairs into duplicate clusters: connected
    components of the (id_a, id_b) edge list, labelling every node
    with the minimum doc id of its component. This is the missing last
    step of corpus dedup — pair emitters (MinHash LSH, SimHash,
    blocked Jaccard, embedding LSH) give EDGES, but keep/drop
    decisions need one canonical doc per transitive CLUSTER
    (A~B, B~C must collapse A,B,C together even when A~C was never
    emitted as a pair).

    Algorithm: iterative min-label propagation with pointer jumping
    (label <- label[label] each round), the DataFrame rendering of the
    two-phase CC-in-MapReduce family (Kiveris et al. 2014). Each
    iteration is two equi-joins + one groupBy — all shuffles keyed on
    node/label ids, never all-pairs — and pointer jumping halves the
    remaining chain depth, so convergence takes O(log diameter)
    driver rounds (near-dup clusters are shallow: 2-4 rounds in
    practice). ``localCheckpoint`` truncates the per-iteration lineage
    so the plan does not grow unboundedly; the state is one
    (node, label) row per distinct doc appearing in any pair — tiny
    next to the corpus at any scale.

    Returns (id_col, cluster_id) for every doc appearing in >= 1
    pair; singleton docs are their own implicit cluster and are
    deliberately not materialized.

    Two-tier strategy (the broadcast-join pattern applied to CC): the
    edge list is ALWAYS orders of magnitude smaller than the corpus —
    it is the verified near-dup pairs — so when it fits comfortably
    on the driver (``<= driver_edge_limit`` edges, ~16 MB at the
    default) a single union-find pass replaces 2-4 distributed rounds
    of 2 joins + groupBy each, identical output, none of the per-round
    job latency. Beyond the limit the log-round distributed loop runs
    unchanged; ``driver_edge_limit=0`` forces it (used by the tests
    that pin the distributed algorithm).
    """
    # symmetrize with ONE pass over the (possibly expensive) pair
    # plan — a union of two selects would execute it twice
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint()
    )
    if sym.count() <= driver_edge_limit:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in sym.toLocalIterator():
            a, b = row["src"], row["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)  # min root = min label
        rows = [(n, find(n)) for n in parent]
        _free_local_checkpoint(sym)
        return pairs.sparkSession.createDataFrame(
            rows, f"{id_col} long, cluster_id long"
        )

    lab = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # labels are node ids and only ever decrease, so sum(label) is a
    # strictly decreasing convergence witness — no compare-join needed
    prev_sum = lab.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        nbr = sym.join(lab.withColumnRenamed("node", "dst"), "dst").select(
            F.col("src").alias("node"), "label"
        )
        prop = (
            lab.unionByName(nbr).groupBy("node").agg(F.min("label").alias("label"))
        )
        # pointer jump: follow the label's own label (labels are node
        # ids, monotone non-increasing -> the jump only lowers them)
        jumped = (
            prop.alias("x")
            .join(
                prop.select(
                    F.col("node").alias("label"), F.col("label").alias("_jump")
                ).alias("y"),
                "label",
                "left",
            )
            .select("node", F.coalesce(F.col("_jump"), F.col("label")).alias("label"))
        )
        superseded = lab
        lab = jumped.localCheckpoint()
        # the new generation is materialized; release the old one's
        # blocks NOW instead of waiting for JVM GC (sf1 spike fix)
        _free_local_checkpoint(superseded)
        new_sum = lab.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    _free_local_checkpoint(sym)
    return lab.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def cluster_summary(
    components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-cluster rollup of a connected-components labelling:
    (cluster_id, n_docs, max_id). cluster_id doubles as the canonical
    keep id (it is the component's min doc id by construction)."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max(id_col).alias("max_id"),
    )


def _cc_label_ctes(pairs_sql: str) -> str:
    """The recursive-CTE chain computing per-node min-label connected
    components — shared by the cluster-summary oracle and every
    oracle that composes on the labels (``lab(node, cluster_id)``)."""
    return f"""pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(a, b) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
lab AS (SELECT a AS node, min(b) AS cluster_id FROM reach GROUP BY a)"""


def connected_components_sql(pairs_sql: str) -> str:
    """DuckDB oracle twin of pair-list connected components: a
    recursive CTE materializing full reachability over the
    symmetrized edge list (terminates because UNION dedups), then
    ``min(reachable)`` as the cluster label — O(component^2) paths,
    exact at oracle scale; the Spark side's log-rounds propagation is
    the 100-TB rendering of the same fixpoint. Returns the
    :func:`cluster_summary` shape."""
    return f"""
WITH RECURSIVE {_cc_label_ctes(pairs_sql)}
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs, max(node) AS max_id
FROM lab GROUP BY cluster_id
""".strip()


def simhash_lsh_sql(
    table: str,
    dialect: str,
    nbits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
) -> str:
    """Fully oracle-expressible SimHash near-dup (md5 hash family,
    per-bit majority sums, pigeonhole banding, bit_count(xor)
    verification) — the engine-portable twin of
    :func:`simhash_neardup_pairs`, with every stage replayed by the
    oracle. ``nbits`` stays small (one conditional sum per bit in
    plain SQL; the production path packs 3 counters per accumulator),
    and ``max_hamming < bands`` keeps the pigeonhole completeness
    guarantee."""
    if nbits % bands:
        raise ValueError(f"bands={bands} must divide nbits={nbits}")
    if max_hamming >= bands:
        raise ValueError("completeness requires max_hamming < bands")
    w = nbits // bands
    mask = (1 << w) - 1
    if dialect == "spark":
        tok_src = (
            f"SELECT {id_col}, explode(split(text, ' ')) AS tok FROM {table}"
        )
        def shr(x, n):
            return f"shiftright({x}, {n})"
        xor = "fa ^ fb"
    elif dialect == "duckdb":
        tok_src = (
            f"SELECT {id_col}, unnest(string_split(text, ' ')) AS tok FROM {table}"
        )
        def shr(x, n):
            return f"({x} >> {n})"
        xor = "xor(fa, fb)"
    else:
        raise ValueError(dialect)
    h = _md5_hash_sql(0, "tok", dialect)
    csums = ", ".join(
        f"sum({shr('h', b)} & 1) AS c{b}" for b in range(nbits)
    )
    fp = " + ".join(
        f"(CASE WHEN 2 * c{b} > n THEN {1 << b} ELSE 0 END)" for b in range(nbits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, fp, {b} AS band, "
        f"{shr('fp', b * w)} & {mask} AS slice FROM fps"
        for b in range(bands)
    )
    return f"""
WITH toks AS ({tok_src}),
hashes AS (SELECT {id_col}, {h} AS h FROM toks),
sums AS (SELECT {id_col}, CAST(count(*) AS BIGINT) AS n, {csums}
         FROM hashes GROUP BY {id_col}),
fps AS (SELECT {id_col}, CAST({fp} AS BIGINT) AS fp FROM sums),
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.fp AS fa, b.fp AS fb
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.slice = b.slice AND a.{id_col} < b.{id_col}
)
SELECT id_a, id_b, CAST(bit_count({xor}) AS BIGINT) AS hamming
FROM cand WHERE bit_count({xor}) <= {max_hamming}
""".strip()


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_FIELD_BITS = 21  # 3 packed bit-counters per 64-bit accumulator
_SIMHASH_MAX_TOKENS = (1 << _SIMHASH_FIELD_BITS) - 1  # ~2.1M tokens/doc


def simhash(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    nbits: int = 48,
) -> DataFrame:
    """Per-doc SimHash fingerprint (Charikar 2002): hash each token,
    sum +1/-1 per bit position over all tokens, take the sign vector
    as an ``nbits``-bit integer. 48 bits keeps the fingerprint positive
    in a signed bigint.

    The per-bit +1/-1 sums are packed, not separate: a naive nbits
    conditional-sum aggregate (48 CASE WHENs per row) compiles past
    the JIT method budget and ran ~3x slower interpreted. Instead each
    aggregate column packs 3 bit-counters into 21-bit fields of one
    long — ``sum(((h>>b)&1) | ((h>>b+1)&1)<<21 | ((h>>b+2)&1)<<42)``
    — so 48 bits need 16 small JIT-friendly sums, map-side combined.
    The ±1 sum is recovered as ``2*count_b - n_tokens``. Carry-safe
    for docs up to ``_SIMHASH_MAX_TOKENS`` (~2.1M) tokens; longer
    docs raise at runtime via an ANSI-checked guard below."""
    per_acc = 64 // _SIMHASH_FIELD_BITS  # 3
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))

    def bit(b: int):
        return F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)).cast("bigint")

    aggs = []
    for a in range(0, nbits, per_acc):
        packed = F.lit(0).cast("bigint")
        for k in range(min(per_acc, nbits - a)):
            packed = packed + F.shiftleft(bit(a + k), k * _SIMHASH_FIELD_BITS)
        aggs.append(F.sum(packed).alias(f"acc_{a}"))
    aggs.append(F.count(F.lit(1)).alias("_n_tok"))
    sums = toks.groupBy(id_col).agg(*aggs)

    mask = F.lit((1 << _SIMHASH_FIELD_BITS) - 1).cast("bigint")
    fp = F.lit(0).cast("bigint")
    for b in range(nbits):
        acc, k = (b // per_acc) * per_acc, b % per_acc
        cnt = F.shiftright(F.col(f"acc_{acc}"), k * _SIMHASH_FIELD_BITS).bitwiseAND(mask)
        # sign of (2*cnt - n) > 0  <=>  +1 majority on bit b
        fp = fp + F.when(
            cnt * 2 > F.col("_n_tok"), F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    guard = F.when(
        F.col("_n_tok") <= _SIMHASH_MAX_TOKENS, fp
    ).otherwise(F.raise_error(F.lit("simhash: doc exceeds packed-counter capacity")))
    return sums.select(F.col(id_col), guard.alias("simhash"))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every ``k``-char gram, then keep
    only the MINIMUM hash of each sliding window of ``w`` consecutive
    gram hashes, deduplicated per doc. Guarantee: two docs sharing
    any substring of length >= w + k - 1 share at least one
    fingerprint, at ~2/(w+1) the density of all-positions hashing —
    position-robust (no stride-alignment caveat) while cutting the
    shuffled volume by ~w/2x. Returns (id, fp) rows.

    The gram-hash array is projected ONCE per row and the min-window
    pass reads the bound column — inlining the transform inside the
    second lambda would re-evaluate the md5 chain per window (O(m*w)
    hashes instead of O(m)). Ties in a window need no rightmost rule:
    the fingerprint IS the value, so equal mins yield the same fp.
    Docs shorter than w + k - 1 chars have no window and are absent.

    At 100 TB: the explode emits ~2*len/(w+1) 8-byte keys per doc —
    the only shuffle downstream consumers (dup scan, all-pairs
    overlap, clone search) ever see. Spark higher-order functions run
    interpreted, so the sliding min is a chain of w-1 ``zip_with(...,
    least)`` passes over shifted slices — O(m*w) comparisons but only
    w-1 lambda dispatches per row and no per-window array allocation,
    measured ~2x faster than the naive per-window
    ``array_min(slice(...))`` (which costs m lambda dispatches and m
    array copies); a true O(m) sliding-min deque would need a Python
    UDF and lose more to Arrow transfer than it saves."""
    h = _md5_hash_sql(0, f"substring({text}, p + 1, {k})", "spark")
    grams = f"transform(sequence(0, length({text}) - {k}), p -> {h})"
    acc = f"slice(hs, 1, size(hs) - {w - 1})"
    for j in range(1, w):
        acc = (
            f"zip_with({acc}, slice(hs, {1 + j}, size(hs) - {w - 1}), "
            "(x, y) -> least(x, y))"
        )
    mins = f"array_distinct({acc})"
    return (
        df.filter(F.length(text) >= k + w - 1)
        .select(F.col(id_col), F.expr(grams).alias("hs"))
        .select(F.col(id_col), F.explode(F.expr(mins)).alias("fp"))
    )


def winnow_dup_stats(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    min_docs: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    spread: int | None = None,
) -> DataFrame:
    """Cross-document repeated-substring scan — the exact-substring
    dedup concern of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") answered with winnowed
    fingerprints instead of a distributed suffix array: per doc,
    the fraction of its winnowed fingerprints that also occur in
    >= ``min_docs`` distinct docs. Long boilerplate/template spans
    (>= w + k - 1 chars) are always caught, wherever they sit in
    either doc; doc-level MinHash misses them when the surrounding
    text differs.

    Three bounded stages: fingerprint explode (map-side, no shuffle);
    distinct-doc count per fp (partial+final agg, 8-byte keys); join
    the counts back — same key partitioning as the agg, so the
    exchange is reused — and re-aggregate per doc. The fingerprint
    relation feeds both consumers, hence the persist. A viral
    boilerplate fp collapses to one (fp, count) row in the agg and
    only fans out on the instance join, which AQE skew-splits.

    ``spread``: optional pre-repartition width for the fingerprint
    projection. The gram-hash + sliding-min work happens BEFORE the
    first shuffle, so its parallelism is the SCAN's task count — on a
    single-row-group local file that is ONE task (measured 9.0 s vs
    6.1 s end-to-end at sf0.1 with spread=32). On a wide production
    input leave it None: the scan is already parallel and the extra
    exchange is pure cost."""
    if spread:
        df = df.repartition(spread)
    fps = winnow_fingerprints(df, k, w, text, id_col).persist()
    # fps is per-doc distinct (array_distinct), so the plain count IS
    # the distinct-doc count — no distinct-aggregate expand needed.
    counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.when(F.col("n_docs") >= min_docs, 1).otherwise(0)
    return (
        fps.join(counts, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.sum(dup).cast("bigint").alias("dup_fps"),
        )
        .withColumn("dup_fraction", F.round(F.col("dup_fps") / F.col("n_fps"), 6))
    )


def winnow_dup_sql(
    table: str,
    k: int = 16,
    w: int = 8,
    min_docs: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`winnow_dup_stats` — the md5 hash
    family, integer mins, and integer counts replay bit-for-bit; the
    only division is exact-int / exact-int rounded at 6. (DuckDB's
    ``range`` is end-exclusive where Spark's ``sequence`` is
    end-inclusive, and ``list_slice`` is 1-based inclusive — both
    renderings below emit the same windows.)"""
    h = _md5_hash_sql(0, f"substr({text}, p + 1, {k})", "duckdb")
    grams = f"list_transform(range(0, length({text}) - {k} + 1), p -> {h})"
    mins = (
        f"list_distinct(list_transform(range(0, len(hs) - {w} + 1), "
        f"i -> list_min(list_slice(hs, i + 1, i + {w}))))"
    )
    return f"""
WITH g AS (
  SELECT {id_col}, {grams} AS hs
  FROM {table} WHERE length({text}) >= {k + w - 1}
),
f AS (SELECT {id_col}, unnest({mins}) AS fp FROM g),
-- f is per-doc distinct (list_distinct), so count(*) = distinct docs
kc AS (SELECT fp, count(*) AS n_docs FROM f GROUP BY fp)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_fps,
       CAST(sum(CASE WHEN n_docs >= {min_docs} THEN 1 ELSE 0 END) AS BIGINT) AS dup_fps,
       round(sum(CASE WHEN n_docs >= {min_docs} THEN 1 ELSE 0 END) / count(*), 6) AS dup_fraction
FROM f JOIN kc USING (fp)
GROUP BY {id_col}
""".strip()


def simhash_neardup_pairs(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    nbits: int = 48,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band the fingerprint into ``bands``
    contiguous bit slices (a pair within hamming distance d < bands
    must agree exactly on >= 1 band — pigeonhole), bucket-join on
    (band, slice), then verify with bit_count(xor) <= max_hamming.

    Completeness: the result is guaranteed-complete only for
    ``max_hamming < bands``; a larger threshold returns only pairs
    that happen to share a band (recall < 1) — raise ``bands`` (or
    use multi-band slices) to widen the guarantee."""
    fps = simhash(df, text, id_col, nbits)
    width = nbits // bands
    mask = (1 << width) - 1
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("slice"),
        )
        for b in range(bands)
    ]
    buckets = fps.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_rows)).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.slice").alias("slice"))
    a, b = buckets.alias("a"), buckets.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def canonical_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    quality: str = "n_chars",
    id_col: str = "doc_id",
    driver_edge_limit: int = 1_000_000,
) -> DataFrame:
    """Near-dup retention by QUALITY: resolve verified pairs into
    clusters (:func:`connected_components`) and keep the best-quality
    doc per cluster instead of the min-id — the retention policy real
    pipelines want (keep the longest / highest-scored rendering of a
    template, not whichever crawled first). Ties break on ascending
    id, so an exact re-crawl copy loses to its original.

    Returns one row per duplicate cluster: ``(cluster_id,
    canonical_id, canonical_quality, n_docs, total_quality)`` —
    bounded by the number of CLUSTERED docs (the near-dup pairs), not
    the corpus; singleton docs never enter a pair and are implicitly
    kept. Scale shape: the CC label relation is pair-node-sized; the
    quality join is an equi-join on id against the corpus (semi-join
    pushdown prunes the scan to clustered ids); the per-cluster
    argmax is a row_number window over millions of independent
    cluster partitions — no global sort."""
    from pyspark.sql.window import Window

    comp = connected_components(
        pairs, id_col=id_col, driver_edge_limit=driver_edge_limit
    )
    labeled = docs.select(
        F.col(id_col), F.col(quality).cast("bigint").alias("_q")
    ).join(comp, id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_q").desc(), F.col(id_col)
    )
    # ranked is consumed twice (winner filter + cluster rollup); its
    # lineage carries the whole pair-derivation -> CC pipeline, so an
    # unpinned plan would re-run near-dup detection per consumer.
    # The relation is clustered-doc-sized — pin it. (Same
    # checkpoint-vs-persist tradeoff note as analysis/graph.pagerank.)
    ranked = labeled.withColumn(
        "rk", F.row_number().over(w)
    ).localCheckpoint(eager=True)
    per_cluster = ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_q").cast("bigint").alias("total_quality"),
    )
    winners = ranked.filter(F.col("rk") == 1).select(
        "cluster_id",
        F.col(id_col).alias("canonical_id"),
        F.col("_q").alias("canonical_quality"),
    )
    return winners.join(per_cluster, "cluster_id")


def canonical_by_quality_sql(
    pairs_sql: str,
    table: str,
    quality: str = "n_chars",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle twin of :func:`canonical_by_quality`: the
    recursive-CTE reachability fixpoint of
    :func:`connected_components_sql` for the labels, then the same
    quality join + per-cluster argmax window."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(a, b) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
lab AS (SELECT a AS node, min(b) AS cluster_id FROM reach GROUP BY a),
ranked AS (
  SELECT l.cluster_id, d.{id_col}, CAST(d.{quality} AS BIGINT) AS _q,
         row_number() OVER (
           PARTITION BY l.cluster_id
           ORDER BY CAST(d.{quality} AS BIGINT) DESC, d.{id_col}
         ) AS rk
  FROM lab l JOIN (SELECT * FROM {table}) d ON d.{id_col} = l.node
),
agg AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(_q) AS BIGINT) AS total_quality
  FROM ranked GROUP BY cluster_id
)
SELECT r.cluster_id, r.{id_col} AS canonical_id,
       r._q AS canonical_quality, a.n_docs, a.total_quality
FROM ranked r JOIN agg a USING (cluster_id) WHERE r.rk = 1
""".strip()


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    by: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-source duplication matrix: verified near-dup pairs rolled
    up by the (source_a, source_b) of their endpoints — the crawl
    -overlap diagnostic ('how much of dump B is already in dump A'),
    which drives dedup ORDER (dedup the overlap-heavy pair first) and
    provenance-aware retention. Symmetrized with source_a <= source_b
    so each unordered source pair appears once.

    Output bounded by |sources|^2: ``(source_a, source_b, n_pairs,
    n_docs_a, n_docs_b)`` where n_docs_x counts DISTINCT docs of that
    side appearing in the cross pairs. Scale shape: two broadcast-able
    id->source lookups (the doc-id side prunes via semi-join pushdown)
    and one grid-sized groupBy."""
    src = docs.select(F.col(id_col), F.col(by))
    a = src.select(F.col(id_col).alias("id_a"), F.col(by).alias("_sa"))
    b = src.select(F.col(id_col).alias("id_b"), F.col(by).alias("_sb"))
    lab = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
            # keep endpoint ids aligned with the sorted source order
            F.when(F.col("_sa") <= F.col("_sb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("doc_a"),
            F.when(F.col("_sa") <= F.col("_sb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("doc_b"),
        )
    )
    return lab.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("doc_a").cast("bigint").alias("n_docs_a"),
        F.countDistinct("doc_b").cast("bigint").alias("n_docs_b"),
    )


def cross_source_dup_matrix_sql(
    pairs_sql: str,
    table: str,
    by: str = "source",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`cross_source_dup_matrix`."""
    return f"""
WITH pairs AS ({pairs_sql}),
src AS (SELECT {id_col}, {by} FROM (SELECT * FROM {table}) d),
lab AS (
  SELECT least(sa.{by}, sb.{by}) AS source_a,
         greatest(sa.{by}, sb.{by}) AS source_b,
         CASE WHEN sa.{by} <= sb.{by} THEN p.id_a ELSE p.id_b END AS doc_a,
         CASE WHEN sa.{by} <= sb.{by} THEN p.id_b ELSE p.id_a END AS doc_b
  FROM pairs p
  JOIN src sa ON sa.{id_col} = p.id_a
  JOIN src sb ON sb.{id_col} = p.id_b
)
SELECT source_a, source_b,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(count(DISTINCT doc_a) AS BIGINT) AS n_docs_a,
  CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_b
FROM lab GROUP BY source_a, source_b
""".strip()


def positioned_shingles(
    df: DataFrame, text: str = "text", n: int = 5, id_col: str = "doc_id"
) -> DataFrame:
    """Word n-grams WITH start positions: (id, pos, sh) — the
    positioned variant of :func:`shingle_table` (which is distinct and
    positionless). Pure array ops, no UDF."""
    toks = df.select(F.col(id_col), F.split(F.col(text), " ").alias("toks")).filter(
        F.size("toks") >= n
    )
    gen = F.expr(
        f"transform(sequence(0, size(toks) - {n}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {n})))"
    )
    return toks.select(F.col(id_col), F.posexplode(gen).alias("pos", "sh"))


def dup_spans(
    df: DataFrame,
    text: str = "text",
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated substring spans per document — the practical
    Spark rendering of exact substring-level dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    token position is COVERED when some word ``n``-gram starting at or
    over it also occurs in >= ``min_docs`` distinct documents; covered
    positions merge into maximal spans (gaps-and-islands). Returns
    (id, span_start, span_end) in token coordinates.

    Scale shape (the suffix-array alternative that actually
    distributes): positioned n-grams are linear in corpus tokens; the
    duplicated-gram set is one exact two-level aggregation (distinct
    (sh, doc) then count per sh — map-side combined, never a
    count-distinct shuffle of raw positions); positions join the dup
    set equi-keyed on the gram (AQE splits viral boilerplate grams);
    the island merge is one window per doc. Two shuffles + one join —
    no suffix array, no quadratic candidate set."""
    pos_sh = positioned_shingles(df, text, n, id_col)
    dup = (
        pos_sh.select("sh", id_col)
        .distinct()
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("sh")
    )
    hits = pos_sh.join(dup, "sh").select(
        F.col(id_col),
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(n - 1)).alias("e"),
    )
    return merge_spans(hits, id_col)


def merge_spans(hits: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Gaps-and-islands merge of covered intervals (id, s, e) into
    maximal spans: overlapping AND abutting intervals (s == prev
    running max + 1) coalesce — a contiguous run of covered tokens is
    ONE maximal span. One window per id."""
    w = Window.partitionBy(id_col).orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = hits.withColumn(
        "new_isl",
        F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0),
    ).withColumn(
        "island", F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("s").alias("span_start"), F.max("e").alias("span_end")
    ).select(id_col, "span_start", "span_end")


def dup_span_stats(
    df: DataFrame,
    text: str = "text",
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span statistics over :func:`dup_spans`:
    (id, n_spans, dup_tokens, total_tokens, dup_frac) — the corpus
    health report for substring-level duplication, and the gate query
    for the whole family (all-integer except the final rounded
    fraction; :func:`dup_span_stats_sql` is the DuckDB twin)."""
    total = df.select(
        F.col(id_col), F.size(F.split(F.col(text), " ")).alias("total_tokens")
    )
    spans = dup_spans(df, text, n, min_docs, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    return total.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)) / F.col("total_tokens"), 6
        ).alias("dup_frac"),
    )


def dup_span_stats_sql(
    table: str, n: int = 5, min_docs: int = 2, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`dup_span_stats` — identical tokenization
    (single-space split, the module convention), identical island
    rule, identical rounding."""
    return f"""
WITH toks AS (SELECT {id_col}, string_split(text, ' ') AS toks FROM {table}),
pos_sh AS (
  SELECT {id_col}, u.i AS pos,
         array_to_string(toks[u.i + 1: u.i + {n}], ' ') AS sh
  FROM toks, unnest(range(len(toks) - {n} + 1)) AS u(i)
  WHERE len(toks) >= {n}),
dup AS (
  SELECT sh FROM (SELECT DISTINCT sh, {id_col} FROM pos_sh) d
  GROUP BY sh HAVING count(*) >= {min_docs}),
hits AS (
  SELECT p.{id_col}, p.pos AS s, p.pos + {n - 1} AS e
  FROM pos_sh p JOIN dup USING (sh)),
ord AS (
  SELECT *, max(e) OVER (PARTITION BY {id_col} ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM hits),
isl AS (
  SELECT *, sum(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
    OVER (PARTITION BY {id_col} ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ord),
spans AS (
  SELECT {id_col}, island, min(s) AS s0, max(e) AS e1
  FROM isl GROUP BY {id_col}, island),
per_doc AS (
  SELECT {id_col}, count(*) AS n_spans, sum(e1 - s0 + 1) AS dup_tokens
  FROM spans GROUP BY {id_col}),
totals AS (SELECT {id_col}, len(string_split(text, ' ')) AS total_tokens FROM {table})
SELECT t.{id_col},
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(t.total_tokens AS BIGINT) AS total_tokens,
       round(CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / t.total_tokens, 6) AS dup_frac
FROM totals t LEFT JOIN per_doc p ON p.{id_col} = t.{id_col}
""".strip()


def dup_span_mask_sql(
    table: str, n: int = 5, min_docs: int = 2, id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`dup_span_mask` (removal mode, no marker):
    reuses the exact span pipeline of :func:`dup_span_stats_sql`, then
    explodes tokens with their index, anti-joins tokens covered by any
    span, and reassembles the kept tokens in order — so the driver's
    hash gate verifies the actual CLEANED-CORPUS product (VERDICT r9
    #5), string-exact, not just the span accounting. Fully-masked docs
    keep a row with kept_tokens 0 and empty text."""
    return f"""
WITH toks AS (SELECT {id_col}, string_split(text, ' ') AS toks FROM {table}),
pos_sh AS (
  SELECT {id_col}, u.i AS pos,
         array_to_string(toks[u.i + 1: u.i + {n}], ' ') AS sh
  FROM toks, unnest(range(len(toks) - {n} + 1)) AS u(i)
  WHERE len(toks) >= {n}),
dup AS (
  SELECT sh FROM (SELECT DISTINCT sh, {id_col} FROM pos_sh) d
  GROUP BY sh HAVING count(*) >= {min_docs}),
hits AS (
  SELECT p.{id_col}, p.pos AS s, p.pos + {n - 1} AS e
  FROM pos_sh p JOIN dup USING (sh)),
ord AS (
  SELECT *, max(e) OVER (PARTITION BY {id_col} ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM hits),
isl AS (
  SELECT *, sum(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
    OVER (PARTITION BY {id_col} ORDER BY s, e
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM ord),
spans AS (
  SELECT {id_col}, island, min(s) AS s0, max(e) AS e1
  FROM isl GROUP BY {id_col}, island),
toks2 AS (
  SELECT {id_col}, u.i AS i, toks[u.i + 1] AS t
  FROM toks, unnest(range(len(toks))) AS u(i)),
kept AS (
  SELECT k.{id_col}, k.i, k.t
  FROM toks2 k
  WHERE NOT EXISTS (SELECT 1 FROM spans s WHERE s.{id_col} = k.{id_col}
                    AND k.i BETWEEN s.s0 AND s.e1)),
agg AS (
  SELECT {id_col}, count(*) AS kept_tokens,
         string_agg(t, ' ' ORDER BY i) AS masked_text
  FROM kept GROUP BY {id_col})
SELECT d.{id_col},
       CAST(COALESCE(kept_tokens, 0) AS BIGINT) AS kept_tokens,
       COALESCE(masked_text, '') AS masked_text
FROM {table} d LEFT JOIN agg USING ({id_col})
""".strip()


def dup_span_mask(
    df: DataFrame,
    text: str = "text",
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    marker: str = "",
) -> DataFrame:
    """Masked-text rendering of :func:`dup_spans`: duplicated spans are
    removed from the token stream (optionally replaced by ``marker``),
    yielding the CLEANED corpus — the actual Lee-et-al training-data
    product. Pure higher-order array expressions: spans are
    collect_list'ed per doc (span count per doc is bounded by
    tokens/2n — small), tokens outside every span are kept with one
    ``filter`` lambda. No UDF, no text round-trip through Python."""
    spans = dup_spans(df, text, n, min_docs, id_col).groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    out = df.join(spans, id_col, "left").withColumn(
        "_toks", F.split(F.col(text), " ")
    )
    kept = F.expr(
        "filter(transform(_toks, (t, i) -> CASE WHEN _spans IS NULL THEN t "
        "WHEN exists(_spans, sp -> i >= sp.span_start AND i <= sp.span_end) "
        "THEN NULL ELSE t END), t -> t IS NOT NULL)"
    )
    masked = F.array_join(kept, " ")
    if marker:
        # marker mode: each removed span collapses to one marker token.
        # The marker is embedded in a SQL string literal — escape
        # single quotes and backslashes so an adversarial marker can't
        # break the expression parse (ADVICE r8: expression injection).
        esc = marker.replace("\\", "\\\\").replace("'", "\\'")

        def _mask():
            return F.expr(
                "array_join(filter(transform(_toks, (t, i) -> CASE "
                "WHEN _spans IS NULL THEN t "
                "WHEN exists(_spans, sp -> i = sp.span_start) THEN "
                f"'{esc}' "
                "WHEN exists(_spans, sp -> i > sp.span_start AND "
                "i <= sp.span_end) THEN NULL ELSE t END), "
                "t -> t IS NOT NULL), ' ')"
            )

        masked = _mask()
    return out.withColumn("masked_text", masked).drop("_spans", "_toks")


# ---------------------------------------------------------------------------
# C4 sentence-span dedup (Raffel et al. 2020 §2.2: "we discarded all
# but one of any three-sentence span occurring more than once in the
# data set") — the sentence-granularity member of the dedup family,
# between chunk-level (paragraphs) and dup-span (token substrings).
# ---------------------------------------------------------------------------

# Rule-based sentence segmentation (r10, VERDICT r9 #4 — replaces the
# bare '. ' seam): ONE ordered step table rendered into BOTH dialects,
# the html_to_text pattern. chr(1) protects dots that do NOT end a
# sentence (common abbreviations + single-letter initials; decimals
# like 3.14 are safe already — only dot-space splits); chr(2) marks
# sentence boundaries after [.!?]; a final literal restores protected
# dots. Sentences RETAIN their terminal punctuation.
_SENT_ABBREVS = [
    "Dr", "Mr", "Mrs", "Ms", "Prof", "St", "Mt", "Jr", "Sr", "vs",
    "etc", "e.g", "i.e", "cf", "Fig", "Eq", "Inc", "Ltd", "Co", "No",
    "Vol", "pp", "approx", "al",
]
_SENT_PROTECT = "\x01"
_SENT_BREAK = "\x02"


# Group-1 backreference marker in step replacements — rendered as "$1"
# by the Spark dialect and "\\1" by the DuckDB dialect.
_SENT_G1 = "\x00g1\x00"


def _sent_steps() -> list[tuple[str, str, str]]:
    """(kind, pattern-or-needle, replacement), applied strictly in
    order. 're' patterns stay in the Java/RE2-common subset (\\b on
    ASCII text behaves identically in both engines; alternation is
    leftmost-first in both). r11 collapsed the 50 per-abbreviation /
    per-initial passes into ONE alternation pass (VERDICT r10 #5) —
    safe because no two ``name.`` matches can overlap (names contain
    no terminal-dot-of-another-name, and protecting a dot swaps one
    non-word char for another, so \\b structure is untouched), which
    makes the sequential chain and the single leftmost scan pick the
    identical match set. Replacements may carry the ``_SENT_G1``
    group-1 marker; each renderer maps it to its dialect's syntax."""
    alts = [a.replace(".", r"\.") for a in _SENT_ABBREVS] + ["[A-Z]"]
    return [
        # abbreviations + single-letter initials ("J. Smith"), one pass
        ("re", r"\b(" + "|".join(alts) + r")\.", _SENT_G1 + _SENT_PROTECT),
        # sentence boundaries after [.!?]-space, one pass
        ("re", r"([.!?]) ", _SENT_G1 + _SENT_BREAK),
        ("lit", _SENT_PROTECT, "."),
    ]


def sentence_split_expr(col: "Column | str"):
    """Spark Column: array of sentences under the rule segmenter."""
    out = F.col(col) if isinstance(col, str) else col
    for kind, pat, rep in _sent_steps():
        if kind == "re":
            out = F.regexp_replace(out, pat, rep.replace(_SENT_G1, "$1"))
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return F.split(out, _SENT_BREAK)


def _sent_sql_quote(s: str) -> str:
    """SQL literal with control chars rendered as chr(n) concats."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if ord(ch) < 32:
            if buf:
                parts.append("'" + buf.replace("'", "''") + "'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
        else:
            buf += ch
    if buf:
        parts.append("'" + buf.replace("'", "''") + "'")
    return " || ".join(parts) if parts else "''"


def sentence_split_sql(expr: str) -> str:
    """DuckDB rendering of the identical segmentation chain; returns
    a split-to-array SQL expression."""
    out = expr
    for kind, pat, rep in _sent_steps():
        q_pat = _sent_sql_quote(pat)
        # group-1 marker -> RE2 backreference '\1' (literal backslash-one
        # inside a single-quoted DuckDB string)
        q_rep = " || '\\1' || ".join(
            _sent_sql_quote(p) for p in rep.split(_SENT_G1)
        )
        if kind == "re":
            out = f"regexp_replace({out}, {q_pat}, {q_rep}, 'g')"
        else:
            out = f"replace({out}, {q_pat}, {q_rep})"
    return f"string_split({out}, chr(2))"


def sentence_spans(
    docs: DataFrame,
    n_sent: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, span_idx, span) — every window of ``n_sent``
    consecutive sentences per doc. Sentences come from the rule
    segmenter (:func:`sentence_split_expr` — abbreviation list +
    single-initial guards + [.!?]-space boundaries, dialect-identical
    by construction), empties dropped. One doc-keyed window over the
    sentence relation; spans are linear in sentences."""
    from pyspark.sql.window import Window as W

    sent = (
        docs.select(
            F.col(id_col),
            F.posexplode(sentence_split_expr(F.col(text))).alias("idx", "s"),
        )
        .filter(F.col("s") != "")
    )
    w = W.partitionBy(id_col).orderBy("idx")
    leads = [F.col("s")] + [F.lead("s", i).over(w) for i in range(1, n_sent)]
    return (
        sent.select(
            id_col,
            F.col("idx").alias("span_idx"),
            *[c.alias(f"_s{i}") for i, c in enumerate(leads)],
        )
        .filter(F.col(f"_s{n_sent - 1}").isNotNull())
        .select(
            id_col,
            "span_idx",
            F.concat_ws(" | ", *[f"_s{i}" for i in range(n_sent)]).alias(
                "span"
            ),
        )
    )


def sentence_span_dedup(
    docs: DataFrame,
    n_sent: int = 3,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc C4 span-dedup accounting: ``n_spans``, ``n_dup_spans``
    (spans whose text occurs elsewhere in the corpus) and
    ``n_remove`` (duplicated spans NOT owned by this doc — C4 keeps
    the first occurrence, rendered here as min(doc_id, span_idx)
    ownership). All-integer output: exact gate.

    Scale shape: spans are linear in sentences; the span frequency
    agg carries min-owner in the SAME pass (struct-min), so df and
    ownership cost ONE shuffle on the span key and the flag join is
    an equi-join the count exchange already co-partitioned. No
    count-distinct, no self-join of positions — the dup_span_stats
    discipline at sentence granularity."""
    spans = sentence_spans(docs, n_sent, text, id_col)
    freq = spans.groupBy("span").agg(
        F.count(F.lit(1)).alias("df"),
        F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("owner"),
    )
    j = spans.join(freq, "span")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_spans"),
            F.sum(
                F.when(
                    (F.col("df") > 1)
                    & ~(
                        (F.col("owner")[id_col] == F.col(id_col))
                        & (F.col("owner")["span_idx"] == F.col("span_idx"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_remove"),
        )
    )


def sentence_span_dedup_sql(
    table: str = "documents",
    n_sent: int = 3,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`sentence_span_dedup`."""
    lead_cols = ", ".join(
        f"lead(s, {i}) OVER (PARTITION BY {id_col} ORDER BY idx) AS s{i}"
        for i in range(1, n_sent)
    )
    concat = " || ' | ' || ".join(["s"] + [f"s{i}" for i in range(1, n_sent)])
    return f"""
WITH sent AS (
  SELECT {id_col}, generate_subscripts(parts, 1) - 1 AS idx,
         unnest(parts) AS s
  FROM (SELECT {id_col}, {sentence_split_sql("text")} AS parts
        FROM {table}) t
),
sent2 AS (SELECT * FROM sent WHERE s <> ''),
spans AS (
  SELECT {id_col}, idx AS span_idx, {concat} AS span
  FROM (SELECT {id_col}, idx, s, {lead_cols} FROM sent2) l
  WHERE s{n_sent - 1} IS NOT NULL
),
freq AS (
  SELECT span, count(*) AS df,
         min(ROW({id_col}, span_idx)) AS owner
  FROM spans GROUP BY span
)
SELECT s.{id_col},
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(sum(CASE WHEN f.df > 1 AND NOT (
             f.owner = ROW(s.{id_col}, s.span_idx)
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_remove
FROM spans s JOIN freq f USING (span)
GROUP BY s.{id_col}
""".strip()
