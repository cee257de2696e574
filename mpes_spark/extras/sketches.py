"""Distinct-count and frequency sketches under the oracle gate.

Production Spark already ships sketch aggregates (`approx_count_distinct`
is a HyperLogLog++, exercised by the rows-only `hll_distinct_users`
query), but their register layouts are engine-private, so nothing a
DuckDB oracle can replay. This module implements the two classic
sketches — HyperLogLog [Flajolet 2007] and count-min [Cormode &
Muthukrishnan 2005] — on the portable md5-prefix hash family
(:func:`mpes_spark.extras.dedup._md5_hash_sql`), with every stage
(bucketing, rho/register max, integer-domain harmonic sum, CMS cell
counts, min-over-rows estimate) expressible identically in Spark SQL
and DuckDB, so the FULL sketch pipeline sits under the driver's
hash-match gate the same way `minhash_lsh_oracle` does for MinHash.

Cross-engine float determinism: the HLL harmonic mean is accumulated
in the INTEGER domain — sum(2^(53 - rho)) as BIGINT is exact and
order-independent, unlike a float sum of 2^-rho — and only divided
once at the end; the sole libm call (ln, linear-counting branch) is
rounded to 6 decimals. CMS is integer-only throughout.

Scale shapes (100 TB):
- HLL: one scan, map-side partial max per (bucket), final state is m
  rows (m = 256 here, 2^p in general) — the shuffle carries registers,
  never values. This is exactly the partial/final agg Spark's own
  `approx_count_distinct` runs; the point of this variant is oracle
  replayability, not speed.
- CMS: one scan + map-side combine into depth*width bounded cells
  (4 * 1024 here); the estimate side joins a top-k-sized probe relation
  (broadcast) against the bounded sketch. The long tail of tokens never
  shuffles individually — only their hashed cell counts do.
"""

from __future__ import annotations

from mpes_spark.extras.dedup import _md5_hash_sql


def _seeded_hash(seed_expr: str, arg: str, dialect: str) -> str:
    """Like :func:`_md5_hash_sql` but with a COLUMN seed (the CMS row
    index), not a literal one."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    inner = f"md5(concat(CAST({seed_expr} AS {s}), '|', {arg}))"
    if dialect == "spark":
        return f"CAST(conv(substring({inner}, 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr({inner}, 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# HyperLogLog (p register-index bits out of the 60-bit md5-prefix hash)
# ---------------------------------------------------------------------------

def hll_estimate_sql(table: str, col: str, dialect: str, p: int = 8) -> str:
    """One-row HLL distinct-count estimate with the registers, the
    harmonic sum, the bias constant, and the linear-counting branch
    all computed in-query, identically in both dialects.

    Layout: h is the 60-bit md5-prefix integer; the LOW ``p`` bits
    pick the register, the remaining ``w_bits = 60 - p`` form the
    suffix whose leading-zero run (+1) is rho. ``bin()`` returns the
    minimal binary string in BOTH engines, so
    ``rho = w_bits + 1 - length(bin(w))`` exactly, with the w = 0
    convention rho = w_bits + 1. The harmonic sum is kept exact as
    BIGINT: sum(2^(maxrho - rho)) with maxrho = w_bits + 1 <= 53,
    so each term is an exactly-representable power of two and the
    256-term sum fits 2^61.
    """
    m = 1 << p
    w_bits = 60 - p
    maxrho = w_bits + 1
    h = _md5_hash_sql(0, f"CAST({col} AS {'STRING' if dialect == 'spark' else 'VARCHAR'})", dialect)
    div = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        buckets = f"SELECT id AS bucket FROM range({m})"
    else:
        buckets = f"SELECT range AS bucket FROM range({m})"
    # alpha_m for m >= 128. CAUTION: Spark SQL parses plain decimal
    # literals (0.7213, 256.0) as DECIMAL and then runs DECIMAL
    # arithmetic — which rounds differently from DuckDB's doubles
    # (observed: est 1473.484229 vs ...224 at sf0.1). So the whole
    # constant alpha*m^2*2^maxrho is computed HERE as one Python
    # float and inlined with an explicit DOUBLE cast; the in-query
    # arithmetic is then a single bigint->double division, identical
    # IEEE ops in both engines.
    alpha = 0.7213 / (1.0 + 1.079 / m)
    c = alpha * m * m * float(1 << maxrho)
    raw = f"(CAST({c!r} AS DOUBLE) / s.hsum)"
    lin = (
        f"CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / s.n_zero)"
    )
    return f"""
WITH h AS (SELECT {h} AS h FROM {table} WHERE {col} IS NOT NULL),
r AS (SELECT h % {m} AS bucket,
             CASE WHEN (h {div} {m}) = 0 THEN {maxrho}
                  ELSE {maxrho} - length(bin(h {div} {m})) END AS rho
      FROM h),
reg AS (SELECT b.bucket, coalesce(max(r.rho), 0) AS rho
        FROM ({buckets}) b LEFT JOIN r ON b.bucket = r.bucket
        GROUP BY b.bucket),
s AS (SELECT CAST(sum(CAST(power(2.0, {maxrho} - rho) AS BIGINT)) AS BIGINT)
             AS hsum,
             CAST(sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero
      FROM reg),
x AS (SELECT CAST(count(DISTINCT {col}) AS BIGINT) AS exact_distinct
      FROM {table} WHERE {col} IS NOT NULL)
SELECT CAST({m} AS BIGINT) AS m, s.n_zero,
       CAST(round(CASE WHEN {raw} <= CAST({2.5 * m!r} AS DOUBLE)
                        AND s.n_zero > 0
                       THEN {lin}
                       ELSE {raw} END, 6) AS DOUBLE) AS est_distinct,
       x.exact_distinct
FROM s CROSS JOIN x
""".strip()


# ---------------------------------------------------------------------------
# count-min sketch over the whitespace token stream
# ---------------------------------------------------------------------------

def cms_topk_estimate_sql(
    table: str,
    dialect: str,
    text: str = "text",
    depth: int = 4,
    width: int = 1024,
    topk: int = 50,
) -> str:
    """Build a depth x width count-min sketch over the token stream
    and read back the estimates for the ``topk`` most frequent tokens
    next to their exact counts: (token, exact_cnt, cms_est) with
    cms_est >= exact_cnt guaranteed (one-sided error). Integer-only,
    so hash-exact across engines.

    The sketch build is one token scan crossed with the depth-row
    relation, combined map-side into depth*width cells; the probe side
    is topk*depth rows (broadcast-sized at any corpus scale).
    """
    if dialect == "spark":
        tok = f"SELECT explode(split({text}, ' ')) AS token FROM {table}"
        depths = f"SELECT id AS r FROM range({depth})"
    else:
        tok = f"SELECT unnest(string_split({text}, ' ')) AS token FROM {table}"
        depths = f"SELECT range AS r FROM range({depth})"
    h = _seeded_hash("d.r", "t.token", dialect)
    hp = _seeded_hash("d.r", "t.token", dialect)
    return f"""
WITH tok AS ({tok}),
exact AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM tok GROUP BY token),
top AS (SELECT token, exact_cnt FROM exact
        ORDER BY exact_cnt DESC, token LIMIT {topk}),
cell AS (SELECT d.r AS r, {h} % {width} AS c,
                CAST(count(*) AS BIGINT) AS cnt
         FROM tok t CROSS JOIN ({depths}) d
         GROUP BY d.r, {h} % {width}),
probe AS (SELECT t.token, t.exact_cnt, d.r AS r, {hp} % {width} AS c
          FROM top t CROSS JOIN ({depths}) d)
SELECT p.token, p.exact_cnt, min(cell.cnt) AS cms_est
FROM probe p JOIN cell ON cell.r = p.r AND cell.c = p.c
GROUP BY p.token, p.exact_cnt
""".strip()


# ---------------------------------------------------------------------------
# bloom-filter semi-join pruning (the runtime-filter shape, replayable)
# ---------------------------------------------------------------------------

def bloom_semijoin_sql(
    build_table: str,
    build_key: str,
    probe_table: str,
    probe_key: str,
    dialect: str,
    m_bits: int = 4096,
    k: int = 3,
    build_pred: str = "TRUE",
) -> str:
    """Audit a bloom-filter runtime prune in-query: build an m-bit /
    k-hash filter over the (filtered) build side's keys, probe every
    distinct probe-side key, and report exactly what the prune would
    do — keys passed, true members, false positives, bits set.

    In production Spark this is `spark.sql.optimizer.runtime.
    bloomFilter.enabled` (the optimizer injects a BloomFilterAggregate
    and prunes the big side's scan before the shuffle); that filter's
    bit layout is engine-private, so this portable md5-position
    rendering exists to put the SEMANTICS — one-sided error, never a
    false negative, fp rate vs m/k/n — under the driver's hash gate.

    Scale shape: the filter relation is at most m rows of distinct
    bit positions (the set-bit list, the relational rendering of the
    bitmap) built from a distinct-key agg; the probe joins that
    <=m-row relation (broadcast at any m that makes sense) and passes
    a key only when all k positions hit: count(matched) = k. One
    scan per side, no key ever crosses the network un-pruned."""
    pos_exprs = [
        f"({_md5_hash_sql(i, 'CAST(x AS ' + ('STRING' if dialect == 'spark' else 'VARCHAR') + ')', dialect)} % {m_bits})"
        for i in range(k)
    ]
    pos_union = " UNION ALL ".join(
        f"SELECT x, {p} AS pos FROM bkeys" for p in pos_exprs
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT x, {p} AS pos FROM pkeys" for p in pos_exprs
    )
    return f"""
WITH bkeys AS (SELECT DISTINCT {build_key} AS x FROM {build_table}
               WHERE {build_pred} AND {build_key} IS NOT NULL),
bloom AS (SELECT DISTINCT pos FROM ({pos_union}) q),
pkeys AS (SELECT DISTINCT {probe_key} AS x FROM {probe_table}
          WHERE {probe_key} IS NOT NULL),
hits AS (SELECT q.x, CAST(count(bloom.pos) AS BIGINT) AS nhit
         FROM ({probe_pos}) q LEFT JOIN bloom ON bloom.pos = q.pos
         GROUP BY q.x),
passed AS (SELECT x FROM hits WHERE nhit = {k}),
truth AS (SELECT p.x FROM pkeys p JOIN bkeys b ON b.x = p.x)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM bkeys) AS n_build_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM bloom) AS n_bits_set,
       (SELECT CAST(count(*) AS BIGINT) FROM pkeys) AS n_probe_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM passed) AS n_pass,
       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM passed) -
       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_false_pos
""".strip()


# ---------------------------------------------------------------------------
# CMS inner product = join-cardinality estimate
# ---------------------------------------------------------------------------

def cms_join_size_sql(
    table_a: str,
    key_a: str,
    table_b: str,
    key_b: str,
    dialect: str,
    depth: int = 4,
    width: int = 256,
    pred_a: str = "TRUE",
    pred_b: str = "TRUE",
) -> str:
    """Estimate |A join B on key| WITHOUT running the join: the
    count-min inner product [Cormode & Muthukrishnan 2005, thm 3] —
    sketch each side's key stream into depth x width cells, take
    min over rows of sum_c cntA[r,c]*cntB[r,c]. One-sided
    (est >= exact), integer-only, so hash-exact across engines; the
    exact size is computed alongside from the per-key count join for
    the gate to compare.

    This is the cardinality-estimation primitive a planner wants
    before committing to a shuffle strategy at 100 TB: each sketch is
    one scan combined map-side into bounded cells, and the estimate
    is a depth*width-row join — no data-sized work at all."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        depths = f"SELECT id AS r FROM range({depth})"
    else:
        depths = f"SELECT range AS r FROM range({depth})"
    ha = _seeded_hash("d.r", f"CAST(a.x AS {s})", dialect)
    hb = _seeded_hash("d.r", f"CAST(b.x AS {s})", dialect)
    return f"""
WITH ka AS (SELECT {key_a} AS x FROM {table_a}
            WHERE {pred_a} AND {key_a} IS NOT NULL),
kb AS (SELECT {key_b} AS x FROM {table_b}
       WHERE {pred_b} AND {key_b} IS NOT NULL),
ca AS (SELECT d.r AS r, {ha} % {width} AS c, CAST(count(*) AS BIGINT) AS cnt
       FROM ka a CROSS JOIN ({depths}) d GROUP BY d.r, {ha} % {width}),
cb AS (SELECT d.r AS r, {hb} % {width} AS c, CAST(count(*) AS BIGINT) AS cnt
       FROM kb b CROSS JOIN ({depths}) d GROUP BY d.r, {hb} % {width}),
ip AS (SELECT ca.r, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS dot
       FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c GROUP BY ca.r),
exact AS (SELECT CAST(coalesce(sum(na.cnt * nb.cnt), 0) AS BIGINT) AS size
          FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM ka GROUP BY x) na
          JOIN (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM kb GROUP BY x) nb
            ON na.x = nb.x)
SELECT (SELECT CAST(min(dot) AS BIGINT) FROM ip) AS est_join_size,
       (SELECT size FROM exact) AS exact_join_size
""".strip()


def hll_set_ops_sql(
    table: str,
    col: str,
    pred_a: str,
    pred_b: str,
    dialect: str,
    p: int = 8,
) -> str:
    """HLL SET-OPERATION estimates between two predicate-defined
    populations: distinct estimates for A, B, A∪B and the
    inclusion-exclusion intersection estimate
    ``est(A) + est(B) - est(A∪B)`` — the standard sketch-algebra
    answer to "how many users did BOTH" without ever materializing
    either id set. One row out, with exact counterparts for the gate.

    The union estimate is computed from the unioned ROW set, which is
    IDENTICAL to merging the two sketches register-by-register with
    max (the HLL merge lemma: registers are maxima over row hashes,
    and max over a union is the pairwise max of per-set maxima) — so
    this query IS the distributed merge semantics, expressed
    oracle-checkably. est_a/est_b/est_union are each rounded to 6
    before the intersection arithmetic, keeping the cross-engine
    float story identical to :func:`hll_estimate_sql`."""
    a = hll_estimate_sql(f"(SELECT * FROM {table} WHERE {pred_a})", col, dialect, p)
    b = hll_estimate_sql(f"(SELECT * FROM {table} WHERE {pred_b})", col, dialect, p)
    u = hll_estimate_sql(
        f"(SELECT * FROM {table} WHERE ({pred_a}) OR ({pred_b}))",
        col,
        dialect,
        p,
    )
    return f"""
WITH ha AS ({a}),
hb AS ({b}),
hu AS ({u})
SELECT ha.m,
       ha.est_distinct AS est_a,
       hb.est_distinct AS est_b,
       hu.est_distinct AS est_union,
       CAST(round(ha.est_distinct + hb.est_distinct - hu.est_distinct, 6)
            AS DOUBLE) AS est_intersection,
       ha.exact_distinct AS exact_a,
       hb.exact_distinct AS exact_b,
       hu.exact_distinct AS exact_union,
       CAST(ha.exact_distinct + hb.exact_distinct - hu.exact_distinct
            AS BIGINT) AS exact_intersection
FROM ha CROSS JOIN hb CROSS JOIN hu
""".strip()
