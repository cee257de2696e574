"""Scalable temporal / interval join operators.

The reference resolves timestamped configuration against event data with
driver-side searchsorted lookups (``/root/reference/mpes/fprocessing.py:
2604-2660`` — aperture interval containment, latest-config-before-file
as-of semantics). Those are fine for config-sized tables; this module
provides the cluster-scale equivalents for when BOTH sides are large:

- :func:`asof_join` — merge-join as-of (backward / forward / nearest,
  optional tolerance) via a single union + per-key sorted window pass.
  Unlike the inequality-equi-join + group-max plan (``registry.py:
  asof_latest_event``), it never materializes the quadratic set of
  (row, earlier-row) matches: one hash shuffle on the key, one per-key
  sort, O(n) scan — the classic kdb/Flink temporal-join plan expressed
  declaratively so Catalyst/AQE still handle skew and spill.
- :func:`range_join_binned` — point-in-interval join that replaces the
  broadcast nested-loop strategy with an equi-join on a quantized bin
  key. Broadcast NLJ is O(|points| * |intervals|) work and requires the
  interval side to fit in every executor; the binned plan shuffles both
  sides by ``floor(coord / bin_width)`` and compares only within a bin —
  the standard time-range-join technique in streaming systems.

Both operators are pure DataFrame compositions: no UDFs, whole-stage
codegen end-to-end, AQE-compatible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join_binned"]


def _ensure_disjoint(left: DataFrame, right_cols: list[str]) -> None:
    clash = set(left.columns) & set(right_cols)
    if clash:
        raise ValueError(
            f"right-side value columns {sorted(clash)} collide with left "
            "columns; rename before joining"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | float | None = None,
    matched_ts: str = "matched_ts",
) -> DataFrame:
    """For every left row, attach the single right row with the same
    ``on`` key and the nearest ``right_ts`` at-or-before (``backward``),
    at-or-after (``forward``), or closest-in-either-direction
    (``nearest``) ``left_ts``. Unmatched left rows keep NULLs (left-join
    semantics, like ``pandas.merge_asof``).

    Equal timestamps on the two sides count as a match in every
    direction (inclusive, merge_asof-compatible). If several right rows
    share one (key, ts), which one wins is unspecified — pre-aggregate
    the right side to one row per (key, ts) for deterministic output.

    ``tolerance`` (same units as the ts columns — this engine's event
    time is epoch-nanos BIGINT, see ``io.readers.normalize_event_time``)
    nulls out matches farther than the bound, again like merge_asof.

    Scale plan: tag + union both sides, hash-shuffle once on ``on``,
    sort each partition by (ts, side), and carry the last non-null
    right payload forward with an unbounded-preceding window — O(n)
    state per key, zero row amplification. ``nearest`` runs the same
    sorted pass twice (ascending + descending; the second sort reuses
    the first shuffle's partitioning) and picks the closer match.
    Contrast: the join-then-aggregate as-of materializes every (left,
    earlier-right) pair first — quadratic in rows-per-key, which at
    100 TB with hot keys is the difference between a sort and an OOM.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest: {direction!r}")

    right_vals = [c for c in right.columns if c not in (on, right_ts)]
    _ensure_disjoint(left, right_vals + [matched_ts])

    payload = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in right_vals]
    )
    r_tagged = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__r"),
    )
    pay_t = r_tagged.schema["__r"].dataType
    l_tagged = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_t).alias("__r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    u = l_tagged.unionByName(r_tagged.withColumn("__l", F.lit(None).cast(l_tagged.schema["__l"].dataType)))

    # right rows sort before left rows at equal ts (__side 0 < 1), so an
    # exact-tie right row is visible to the left row in the same pass
    asc = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    desc = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    if direction == "backward":
        u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(asc))
    elif direction == "forward":
        u = u.withColumn("__m", F.last("__r", ignorenulls=True).over(desc))
    else:  # nearest: both passes, then pick the closer (ties -> backward)
        u = (
            u.withColumn("__mb", F.last("__r", ignorenulls=True).over(asc))
            .withColumn("__mf", F.last("__r", ignorenulls=True).over(desc))
            .withColumn(
                "__m",
                F.when(F.col("__mf").isNull(), F.col("__mb"))
                .when(F.col("__mb").isNull(), F.col("__mf"))
                .when(
                    (F.col("__t") - F.col("__mb.__mts"))
                    <= (F.col("__mf.__mts") - F.col("__t")),
                    F.col("__mb"),
                )
                .otherwise(F.col("__mf")),
            )
        )

    out = u.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = F.abs(F.col("__t") - F.col("__m.__mts"))
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        F.col("__m.__mts").alias(matched_ts),
        *[F.col("__m")[c].alias(c) for c in right_vals],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    bin_width: float,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``start <= point < end`` (half-open, matching the binning engine's
    edge rule) — WITHOUT a broadcast nested-loop join.

    Each interval is exploded to the bins it overlaps
    (``floor(start/w) .. floor(end/w)``); each point belongs to exactly
    one bin (``floor(point/w)``); the join is then a plain equi-join on
    the bin id plus the exact range post-filter. Every qualifying
    (point, interval) pair is produced exactly once because the point's
    bin is unique.

    Cost model: the interval side is replicated ``ceil(len/w) + 1``
    times, so pick ``bin_width`` near the median interval length (w =
    median gives ~2-3x replication). Both sides shuffle by a uniform
    integer key -> sort-merge or shuffled-hash join, AQE-splittable on
    hot bins. A small interval table still broadcasts (Catalyst decides
    from size stats — nothing here forces a strategy), so this operator
    degrades gracefully to the `interval_lookup` plan on config-sized
    tables while staying executable when intervals are 100 GB.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    _ensure_disjoint(points, [c for c in intervals.columns])

    w = F.lit(float(bin_width))
    p = points.withColumn("__bin", F.floor(F.col(point) / w).cast("long"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / w).cast("long"),
                F.floor(F.col(end) / w).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bin")
        .filter((F.col(point) >= F.col(start)) & (F.col(point) < F.col(end)))
        .drop("__bin")
    )


def overlap_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
) -> DataFrame:
    """Interval-interval overlap join (half-open:
    ``l_start < r_end AND r_start < l_end``) WITHOUT a nested-loop
    join — the two-sided sibling of :func:`range_join_binned`, the
    genomics/session-overlap shape.

    Both sides explode to the bins they cover; the join is a plain
    equi-join on the bin id plus the exact overlap post-filter. An
    overlapping pair shares MANY bins, so a naive bin join needs a
    distinct pass over the pair relation; instead each pair is
    emitted in exactly ONE canonical bin — the bin containing
    ``greatest(l_start, r_start)`` (the overlap's first instant),
    which both sides cover by construction — so the output is
    duplicate-free with no extra shuffle.

    Cost model matches :func:`range_join_binned`: each side
    replicates ``ceil(len/w) + 1``x, pick ``bin_width`` near the
    median interval length; both sides shuffle by a uniform integer
    key, AQE-splittable, and a small side still broadcasts."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    _ensure_disjoint(left, [c for c in right.columns])

    w = F.lit(float(bin_width))
    la = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / w).cast("long"),
                F.floor(F.col(left_end) / w).cast("long"),
            )
        ),
    )
    rb = right.withColumn(
        "__rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / w).cast("long"),
                F.floor(F.col(right_end) / w).cast("long"),
            )
        ),
    )
    canon = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / w
    ).cast("long")
    return (
        la.join(rb, la["__bin"] == rb["__rbin"])
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
            & (F.col("__bin") == canon)
        )
        .drop("__bin", "__rbin")
    )
