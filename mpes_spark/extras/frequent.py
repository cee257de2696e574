"""Exact distributed heavy hitters via a Misra-Gries candidate pass.

The naive "GROUP BY item HAVING count >= T" shuffles every distinct
item — at 100 TB of tokenized text that is trillions of long-tail keys
moving through the exchange to produce a result with a few thousand
rows. The classic two-pass alternative (Misra & Gries 1982; the
MapReduce adaptation is folklore in every web-count pipeline):

1. **Candidate pass** — each input partition maintains a k-counter
   Misra-Gries summary (map-side only, zero shuffle). MG guarantees any
   item whose count within the partition exceeds n_p/(k+1) survives, so
   by averaging, any item with GLOBAL frequency >= n/(k+1) appears in at
   least one partition summary. The union of summaries (<= k rows per
   partition) is the candidate set.
2. **Exact pass** — broadcast-semi-join the input against the candidate
   set and count only matching rows: the shuffle now carries candidate
   occurrences only, never the long tail, and the counts are EXACT.

With a fractional threshold ``min_frac`` the completeness guarantee is
scale-free: ``1/(k+1) < min_frac`` makes the output provably identical
to the naive plan at any data size (k = 2000 covers min_frac >= 0.0005).
That is why the registry query carries a plain SQL oracle — this is an
exact operator with a sketch-shaped physical plan, not an approximation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frequent_items", "mg_summary"]


def mg_summary(counts: dict, k: int) -> dict:
    """One Misra-Gries eviction: if more than ``k`` counters live,
    subtract the (size-k)-th smallest count from every counter and drop
    the non-positive ones (>= size-k evictions, <= k survivors). Each
    eviction removes >= (k+1)*d total mass, so the cumulative
    underestimate is <= n/(k+1)."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values())
    d = vals[len(counts) - k - 1]
    return {i: v - d for i, v in counts.items() if v > d}


def frequent_items(
    df: DataFrame,
    col: str,
    *,
    min_frac: float,
    k: int = 2000,
) -> DataFrame:
    """All items occurring in >= ``min_frac`` of ``df``'s rows, with
    EXACT counts — output identical to
    ``df.groupBy(col).count().filter(count >= min_frac * n)`` provided
    ``min_frac > 1/(k+1)`` (checked), at a fraction of the shuffle.

    Columns out: ``col`` (item), ``freq`` (exact BIGINT count).
    """
    if not 0.0 < min_frac <= 1.0:
        raise ValueError(f"min_frac must be in (0, 1]: {min_frac}")
    if min_frac <= 1.0 / (k + 1):
        raise ValueError(
            f"completeness requires min_frac > 1/(k+1): "
            f"min_frac={min_frac} k={k} -> raise k above {1.0 / min_frac - 1:.0f}"
        )

    def mg_partition(batches):
        counter: dict = {}
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, c in zip(vc.index, vc.values):
                counter[item] = counter.get(item, 0) + int(c)
            counter = mg_summary(counter, k)
        yield pd.DataFrame({col: list(counter.keys())})

    candidates = (
        df.select(col)
        .mapInPandas(
            mg_partition,
            schema=f"{col} {df.schema[col].dataType.simpleString()}",
        )
        .distinct()
    )
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.join(F.broadcast(candidates), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= F.lit(min_frac) * F.col("__n"))
        .drop("__n")
    )
