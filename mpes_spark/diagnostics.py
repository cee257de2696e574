"""Data-distribution diagnostics that inform physical-plan choices.

At 100 TB the difference between a clean run and a dead executor is
usually one skewed join key; the remedies (salting —
:func:`mpes_spark.transforms.columns.salted_agg` — AQE skew-join
splitting, broadcast thresholds) all start from the same question:
HOW skewed is this key, exactly? This module answers it with one
bounded aggregation pass — per-key counts collapse map-side, every
derived statistic is computed over the key-count relation (n_keys
rows), never the data — so profiling a join key costs one scan of
the key column and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """One-row skew profile of a prospective shuffle/join key:
    ``(n_keys, total, max_cnt, max_share, top10_share, entropy)``.

    ``max_share`` is the heaviest key's fraction (the single-task
    straggler bound under hash partitioning: one partition gets AT
    LEAST this fraction of the rows); ``top10_share`` the mass of
    the 10 heaviest; ``entropy`` the Shannon entropy of the key
    distribution in nats (uniform = ln(n_keys); the gap from that
    ceiling is the skew). Rule of thumb: max_share * total >> the
    per-partition row budget -> salt or let AQE split."""
    k = (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = k.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    top10 = (
        k.orderBy(F.col("cnt").desc(), "k")
        .limit(10)
        .agg(F.sum("cnt").cast("bigint").alias("t10"))
    )
    p = F.col("cnt").cast("double") / F.col("total")
    ent = (
        k.crossJoin(F.broadcast(tot))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )
    return (
        tot.crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(ent))
        .select(
            "n_keys",
            "total",
            "max_cnt",
            F.round(F.col("max_cnt").cast("double") / F.col("total"), 6).alias(
                "max_share"
            ),
            F.round(F.col("t10").cast("double") / F.col("total"), 6).alias(
                "top10_share"
            ),
            "entropy",
        )
    )


def key_skew_profile_sql(table: str, key: str) -> str:
    """DuckDB oracle twin of :func:`key_skew_profile`. The only float
    accumulation is the entropy sum (cross-engine summation order,
    ~1e-16 relative), rounded to 6."""
    return f"""
WITH k AS (SELECT {key} AS k, CAST(count(*) AS BIGINT) AS cnt
           FROM {table} WHERE {key} IS NOT NULL GROUP BY {key}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(cnt) AS BIGINT) AS total,
               CAST(max(cnt) AS BIGINT) AS max_cnt FROM k),
top10 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t10 FROM
          (SELECT cnt FROM k ORDER BY cnt DESC, k LIMIT 10) q),
ent AS (SELECT round(-sum((CAST(cnt AS DOUBLE) / t.total) *
                          ln(CAST(cnt AS DOUBLE) / t.total)), 6) AS entropy
        FROM k CROSS JOIN tot t)
SELECT tot.n_keys, tot.total, tot.max_cnt,
       round(CAST(tot.max_cnt AS DOUBLE) / tot.total, 6) AS max_share,
       round(CAST(top10.t10 AS DOUBLE) / tot.total, 6) AS top10_share,
       ent.entropy
FROM tot CROSS JOIN top10 CROSS JOIN ent
""".strip()


def auto_salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    *,
    rows_per_task_budget: int = 5_000_000,
    max_buckets: int = 64,
    seed: int = 42,
):
    """Profile-then-decide aggregation: run :func:`key_skew_profile`
    on the (first) group key — one bounded pass — and pick between a
    plain groupBy (max key fits the per-task row budget) and
    :func:`mpes_spark.transforms.columns.salted_agg` with
    ``ceil(max_cnt / budget)`` buckets (capped). Returns
    ``(result_df, decision)`` where decision is
    ``{"salt_buckets": n, "max_cnt": ..., "max_share": ...}`` —
    n == 1 means plain.

    The profile is a driver decision from an n_keys-bounded relation
    (the same regime as AQE's runtime statistics, made explicit and
    loggable); the budget default matches a ~few-hundred-MB reducer
    at typical event-row widths. For multi-key groupings the first
    key dominates hash placement, so it is the one profiled."""
    import math

    from mpes_spark.transforms.columns import salted_agg

    prof = key_skew_profile(df, keys[0]).collect()[0]
    if prof["max_cnt"] is None:
        # Empty input / all-NULL key: no skew to split; plain groupBy.
        buckets = 1
    else:
        buckets = min(
            max_buckets, max(1, math.ceil(prof["max_cnt"] / rows_per_task_budget))
        )
    decision = {
        "salt_buckets": buckets,
        "max_cnt": prof["max_cnt"],
        "max_share": prof["max_share"],
    }
    if buckets == 1:
        phase = []
        for col, how in aggs.items():
            out = f"{how}_{col}"
            if how == "count":
                phase.append(F.count(F.lit(1)).alias(out))
            else:
                phase.append(getattr(F, how)(F.col(col)).alias(out))
        return df.groupBy(*keys).agg(*phase), decision
    return salted_agg(df, keys, aggs, salt_buckets=buckets, seed=seed), decision


def psi_drift(
    base: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard data-drift monitor for feature/label
    distributions between a training corpus and incoming data
    (PSI < 0.1 stable, 0.1-0.25 moderate, > 0.25 action; the credit-
    scoring folklore thresholds). Values bucket into ``nbins``
    equal-width bins over [lo, hi) plus an ``-1`` outside-range bin,
    counts get add-``smoothing`` Laplace mass (so an empty bin can't
    produce log(0)/div-0), and each row reports
    ``(bin, p_base, p_cur, psi_term)`` with ``psi = sum(psi_term)``.

    Scale shape: ONE bounded aggregation per side (map-side combined,
    nbins+1 output rows each) — each side's total and smoothed floor
    ride a whole-relation window over that (<= nbins+1)-row aggregate
    instead of a second pass (r11, guide §2.4: the old shape consumed
    each side's bin-count relation twice — shares + totals — and ran
    two extra eager ``count()`` scans for the floors, so each snapshot
    was scanned 3x) — then a broadcast-sized join on bin id and pure
    column math: monitoring a 100 TB snapshot pair costs two column
    scans, one per side. The floors are the same IEEE-754 doubles the
    driver-side computation produced (sum-of-integer-counts is exact,
    and the expression tree is operation-for-operation identical), so
    shares and terms round (9/6) to the same hashes the DuckDB twin
    checks."""
    if nbins <= 0 or hi <= lo:
        raise ValueError("need nbins > 0 and hi > lo")
    from pyspark.sql.window import Window

    step = (hi - lo) / nbins
    denom_add = F.lit(smoothing) * (nbins + 1)
    wall = Window.partitionBy()  # whole-relation: <= nbins+1 rows/side

    def side(df: DataFrame, name: str) -> DataFrame:
        x = F.col(col)
        b = F.when(
            (x >= lo) & (x < hi),
            F.floor((x - F.lit(lo)) / F.lit(step)).cast("int"),
        ).otherwise(F.lit(-1))
        cnt = df.filter(x.isNotNull()).groupBy(b.alias("bin")).agg(
            F.count(F.lit(1)).cast("double").alias("cnt")
        )
        tot = F.sum("cnt").over(wall)
        return cnt.select(
            "bin",
            ((F.col("cnt") + F.lit(smoothing)) / (tot + denom_add)).alias(
                name
            ),
            tot.alias(f"_tot_{name}"),
        )

    p = side(base, "p_raw")
    q = side(current, "q_raw")
    # full outer on bin: a bin empty on one side still gets its
    # smoothed floor share from that side's total — recovered from any
    # joined row that carries it (the joined relation is <= 2(nbins+1)
    # rows; an entirely empty side coalesces to the 0-count floor,
    # exactly the old driver-side count()==0 behavior)
    joined = p.join(q, "bin", "outer")
    tot_p = F.coalesce(F.max("_tot_p_raw").over(wall), F.lit(0.0))
    tot_q = F.coalesce(F.max("_tot_q_raw").over(wall), F.lit(0.0))
    floor_p = F.lit(smoothing) / (tot_p + denom_add)
    floor_q = F.lit(smoothing) / (tot_q + denom_add)
    pp = F.round(F.coalesce(F.col("p_raw"), floor_p), 9)
    qq = F.round(F.coalesce(F.col("q_raw"), floor_q), 9)
    return joined.select(
        F.col("bin").cast("int").alias("bin"),
        pp.alias("p_base"),
        qq.alias("p_cur"),
        F.round((pp - qq) * F.log(pp / qq), 6).alias("psi_term"),
    )


def psi_drift_sql(
    base_sql: str,
    current_sql: str,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 10,
    smoothing: float = 0.5,
) -> str:
    """DuckDB twin of :func:`psi_drift` — ``base_sql``/``current_sql``
    are relations exposing ``col``. Constants are Python-precomputed
    and inlined via CAST so DECIMAL parsing can't diverge."""
    step = (hi - lo) / nbins

    def side(src: str, name: str) -> str:
        b = (
            f"CASE WHEN {col} >= CAST({lo!r} AS DOUBLE)"
            f" AND {col} < CAST({hi!r} AS DOUBLE)"
            f" THEN CAST(floor(({col} - CAST({lo!r} AS DOUBLE))"
            f" / CAST({step!r} AS DOUBLE)) AS INTEGER) ELSE -1 END"
        )
        return (
            f"SELECT bin, (cnt + CAST({smoothing!r} AS DOUBLE))"
            f" / (tot + CAST({smoothing!r} AS DOUBLE) * {nbins + 1}) AS {name} "
            f"FROM (SELECT {b} AS bin, CAST(count(*) AS DOUBLE) AS cnt"
            f" FROM ({src}) s WHERE {col} IS NOT NULL GROUP BY bin) c,"
            f" (SELECT CAST(count(*) AS DOUBLE) AS tot FROM ({src}) s2"
            f" WHERE {col} IS NOT NULL) t"
        )

    # smoothed floor shares for bins absent on one side
    return f"""
WITH pside AS ({side(base_sql, "p_raw")}),
qside AS ({side(current_sql, "q_raw")}),
bn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ({base_sql}) b WHERE {col} IS NOT NULL),
cn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM ({current_sql}) c WHERE {col} IS NOT NULL),
j AS (
  SELECT coalesce(pside.bin, qside.bin) AS bin,
         round(coalesce(p_raw, CAST({smoothing!r} AS DOUBLE)
               / ((SELECT n FROM bn) + CAST({smoothing!r} AS DOUBLE) * {nbins + 1})), 9) AS p_base,
         round(coalesce(q_raw, CAST({smoothing!r} AS DOUBLE)
               / ((SELECT n FROM cn) + CAST({smoothing!r} AS DOUBLE) * {nbins + 1})), 9) AS p_cur
  FROM pside FULL OUTER JOIN qside ON pside.bin = qside.bin
)
SELECT CAST(bin AS INTEGER) AS bin, p_base, p_cur,
       round((p_base - p_cur) * ln(p_base / p_cur), 6) AS psi_term
FROM j
""".strip()


def exact_quantile(
    df: DataFrame,
    col: str,
    q: float,
    nbins: int = 1024,
    passes: int = 2,
    tail_limit: int = 2_000_000,
) -> float:
    """EXACT quantile of an arbitrarily large column with NO global
    sort: iterative histogram narrowing (the classic distributed
    selection algorithm — Blum et al.'s selection problem done with
    histograms). Each pass bins the surviving range into ``nbins``
    equal-width cells (one scan, map-side combined, ``nbins`` longs
    to the driver), locates the cell containing the target rank, and
    recurses into it; after ``passes`` rounds the survivors shrink by
    ~``nbins^passes`` and the k-th element is taken exactly from the
    remainder. Returns the element at 0-indexed rank
    ``floor((n-1) * q)`` (lower/type-1 quantile — an actual data
    value, which is what makes the result engine-exact with no
    float-interpolation drift).

    At 100 TB: 2 passes x one column scan + a ``tail_limit``-bounded
    ordered take — vs a full-sort quantile whose exchange IS the 100
    TB. approx_percentile answers fast with error; this answers
    exactly with two scans. NULLs are excluded (SQL semantics).

    The surviving cell is re-filtered with the SAME
    ``floor((v - lo) / w)`` expression the histogram binned with —
    recomputing the cell's [lo2, hi2) bounds in float can disagree
    with the floor assignment by one ulp at cell edges, silently
    shifting the target rank. Duplicate-heavy columns (one value
    filling a whole cell, so narrowing stalls) are handled: if the
    oversized remainder is a single distinct value, that value IS the
    answer; otherwise raises with a passes/nbins hint."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    base = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    n = base.count()
    if n == 0:
        raise ValueError("exact_quantile of an empty column")
    k = int((n - 1) * q)  # 0-indexed target rank

    agg = base.agg(F.min("v"), F.max("v")).collect()[0]
    lo, hi = float(agg[0]), float(agg[1])
    cur = base
    for _ in range(passes):
        if lo == hi:
            return lo
        w = (hi - lo) / nbins
        # Bin expression: clamped at BOTH ends — survivors of a prior
        # pass can sit one ulp outside the rescaled [lo, hi) (the
        # bounds are derived, the membership predicate was the floor),
        # and an unclamped floor would drop them into bins the rank
        # walk never visits.
        bexpr = (
            F.greatest(
                F.least(
                    F.floor((F.col("v") - F.lit(lo)) / F.lit(w)),
                    F.lit(nbins - 1),
                ),
                F.lit(0),
            )
            .cast("int")
            .alias("b")
        )
        hist = cur.groupBy(bexpr).agg(F.count(F.lit(1)).alias("c")).collect()
        counts = {r.b: r.c for r in hist}
        cum = 0
        for b in range(nbins):
            c = counts.get(b, 0)
            if cum + c > k:
                k -= cum
                # Re-filter with the EXACT binning expression, not
                # recomputed [lo + b*w, lo + (b+1)*w) range bounds —
                # float re-derivation of the bounds can disagree with
                # the floor by one ulp at cell edges, shifting ranks.
                cur = cur.filter(
                    F.greatest(
                        F.least(
                            F.floor((F.col("v") - F.lit(lo)) / F.lit(w)),
                            F.lit(nbins - 1),
                        ),
                        F.lit(0),
                    ).cast("int")
                    == F.lit(b)
                )
                lo = lo + b * w
                hi = hi if b == nbins - 1 else lo + w
                break
            cum += c
    remainder = cur.count()
    if remainder > tail_limit:
        # Duplicate-heavy stall: a single value filling the cell can't
        # narrow further — but then that value IS the k-th element.
        mm = cur.agg(F.min("v"), F.max("v")).collect()[0]
        if mm[0] == mm[1]:
            return float(mm[0])
        raise ValueError(
            f"remainder {remainder} exceeds tail_limit {tail_limit} "
            "with >1 distinct value in the cell; raise passes/nbins"
        )
    vals = [r.v for r in cur.orderBy("v").limit(k + 1).collect()]
    return float(vals[k])
