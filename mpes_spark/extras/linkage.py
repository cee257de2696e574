"""Record linkage: blocked fuzzy matching of mention strings to a
canonical entity table.

The classic entity-resolution shape (Fellegi & Sunter 1969; surveyed
in Christen, *Data Matching*, 2012): comparing every mention against
every canonical record is O(N*M) and dead at scale, so candidate
pairs are generated only inside *blocks* — cheap deterministic keys
(a name suffix, a phonetic code, a length band) that any true match
almost surely shares — and the expensive string distance runs only on
co-blocked pairs. Multi-pass blocking (union of several block keys)
recovers matches a single key would miss.

Scale shape: each blocking pass is one equi-join on the block key
(shuffle on that key only — never a cross join); passes union and
dedup before the per-pair distance; resolution is one per-mention
window argmin. At 100 TB the only hazard is a degenerate block (one
key covering a large fraction of either side), which re-creates the
quadratic blowup inside a single task — ``max_block`` drops such
blocks up front (standard practice: oversized blocks carry almost no
discriminating signal anyway), and the drop is computed per side with
one count agg before the join.

Spark and DuckDB both implement classic Levenshtein (unit-cost
insert/delete/substitute, case-sensitive), so the distance — and the
whole pipeline — is integer-exact across the oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_best_match(
    mentions: DataFrame,
    canon: DataFrame,
    block_fns: list[Callable[[Column], Column]],
    max_dist: int,
    mention_id: str = "mention_id",
    mention_name: str = "mention_name",
    canon_id: str = "canon_id",
    canon_name: str = "canon_name",
    max_block: int | None = None,
) -> DataFrame:
    """Resolve each mention to its best canonical record: generate
    candidates inside each blocking pass, keep pairs with
    ``levenshtein <= max_dist``, then pick per mention the lowest
    distance (ties to the lowest ``canon_id``).

    ``block_fns`` maps a name Column to a block-key Column; one
    equi-join per pass, passes unioned and deduped on
    (mention, canon) before the distance filter. ``max_block`` (when
    set) drops block keys whose canonical-side population exceeds the
    cap *before* the join — the skew guard that keeps the worst task
    bounded at scale.

    Returns (mention_id, mention_name, canon_id, lev_dist) with one
    row per resolvable mention; mentions with no candidate under
    ``max_dist`` are absent (the caller left-joins if it needs the
    unresolved set).
    """
    m = mentions.select(
        F.col(mention_id).alias("__mid"),
        F.col(mention_name).alias("__mname"),
    )
    c = canon.select(
        F.col(canon_id).alias("__cid"),
        F.col(canon_name).alias("__cname"),
    )
    passes = []
    for i, fn in enumerate(block_fns):
        mb = m.withColumn("__bk", fn(F.col("__mname")))
        cb = c.withColumn("__bk", fn(F.col("__cname")))
        if max_block is not None:
            ok = (
                cb.groupBy("__bk")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") <= F.lit(max_block))
                .select("__bk")
            )
            cb = cb.join(ok, "__bk")
        passes.append(
            mb.join(cb, "__bk").select("__mid", "__mname", "__cid", "__cname")
        )
    cand = passes[0]
    for p in passes[1:]:
        cand = cand.unionByName(p)
    cand = cand.dropDuplicates(["__mid", "__cid"])
    scored = cand.withColumn(
        "__d", F.levenshtein("__mname", "__cname")
    ).filter(F.col("__d") <= F.lit(max_dist))
    w = Window.partitionBy("__mid").orderBy(
        F.col("__d").asc(), F.col("__cid").asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(
            F.col("__mid").alias(mention_id),
            F.col("__mname").alias(mention_name),
            F.col("__cid").alias(canon_id),
            F.col("__d").cast("int").alias("lev_dist"),
        )
    )


def blocked_best_match_sql(
    mentions_sql: str,
    canon_sql: str,
    block_sqls: list[str],
    max_dist: int,
    mention_id: str = "mention_id",
    mention_name: str = "mention_name",
    canon_id: str = "canon_id",
    canon_name: str = "canon_name",
    max_block: int | None = None,
) -> str:
    """DuckDB twin of :func:`blocked_best_match`. ``block_sqls`` are
    SQL expressions over a name column spelled ``{n}`` (formatted per
    side); pass relations must yield the four named columns."""
    pass_sqls = []
    for b in block_sqls:
        mk = b.format(n=f"m.{mention_name}")
        ck = b.format(n=f"c.{canon_name}")
        guard = ""
        if max_block is not None:
            guard = (
                f" AND ({b.format(n=f'c.{canon_name}')}) IN ("
                f"SELECT bk FROM (SELECT {b.format(n=canon_name)} AS bk "
                f"FROM canon GROUP BY 1 HAVING count(*) <= {max_block}) g)"
            )
        pass_sqls.append(
            f"SELECT m.{mention_id} AS mid, m.{mention_name} AS mname, "
            f"c.{canon_id} AS cid, c.{canon_name} AS cname "
            f"FROM mentions m JOIN canon c ON {ck} = {mk}{guard}"
        )
    cand = " UNION ALL ".join(pass_sqls)
    return f"""
WITH mentions AS ({mentions_sql}),
canon AS ({canon_sql}),
cand AS (SELECT DISTINCT mid, mname, cid, cname FROM ({cand}) u),
scored AS (
  SELECT mid, mname, cid, levenshtein(mname, cname) AS d
  FROM cand
),
best AS (
  SELECT mid, mname, cid, d,
         row_number() OVER (PARTITION BY mid ORDER BY d ASC, cid ASC) AS rk
  FROM scored WHERE d <= {max_dist}
)
SELECT mid AS {mention_id}, mname AS {mention_name},
       cid AS {canon_id}, CAST(d AS INTEGER) AS lev_dist
FROM best WHERE rk = 1
""".strip()
