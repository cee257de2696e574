"""Multi-resolution time rollups (continuous-aggregate cascade).

The reference downsamples time series by rebinning already-binned
arrays (``/root/reference/mpes/utils.py:arraybin``; the hypertable /
continuous-aggregate pattern in TimescaleDB terms). The distributed
form: aggregate raw events ONCE into the finest bucket, persist that
(it is grid-sized, orders of magnitude smaller than the event table),
and derive every coarser resolution by re-aggregating the finer rollup
— never rescanning the events.

Correctness rests on the measures being mergeable: count and sum add,
min/max compose, and avg is derived as sum/cnt at read time (an avg of
avgs would be wrong under uneven buckets — hence avg is not carried,
only derived). The registry query ``rollup_cascade_1h`` proves the
cascade against a direct-from-raw oracle.

At 100 TB this is the difference between one full scan per resolution
and one full scan total: the 1-minute rollup of a year of nanosecond
events is ~526k rows per series — re-aggregating that to hours/days is
driver-trivial, and the cascade parallelizes as an ordinary groupBy on
integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup", "coarsen", "finalize_rollup", "value_runs", "time_weighted_avg"]

_MEASURES = ("cnt", "sum_m", "min_m", "max_m")


def _floor_div(expr: str, n: int):
    """Integer FLOOR division as a Column: ``div`` truncates toward
    zero, so pre-1970 (negative) epoch-nanos would land one bucket
    high and the -1..0 bucket would absorb two bucket-widths; and a
    float ``floor(a / b)`` is out because epoch-nanos (~1.7e18) exceed
    double's exact range. ``(a - pmod(a, n)) div n`` is exact floor in
    pure integer arithmetic (pmod is the non-negative remainder), and
    keeps minute->hour->day cascades consistent with directly-bucketed
    rollups on both sides of the epoch."""
    n = int(n)
    return F.expr(f"(({expr}) - pmod(({expr}), {n})) div {n}").cast("long")


def time_rollup(
    df: DataFrame,
    *,
    measure: str,
    bucket_ns: int,
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Finest-resolution rollup: per ``bucket`` (epoch-nanos ``ts``
    integer-divided by ``bucket_ns``) and optional ``keys``, the
    mergeable stats (cnt, sum, min, max) of ``measure``."""
    keys = keys or []
    bucket = _floor_div(f"`{ts_col}`", bucket_ns)
    return df.groupBy(bucket.alias("bucket"), *keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(measure).alias("sum_m"),
        F.min(measure).alias("min_m"),
        F.max(measure).alias("max_m"),
    )


def _rollup_keys(rollup: DataFrame, keys: list[str] | None) -> list[str]:
    """Resolve the key columns of a rollup frame. ``keys=None`` INFERS
    them as every column besides ``bucket`` and the mergeable measures,
    so a keyed rollup can never be silently collapsed across its key
    groups by a caller that forgot ``keys=``. Explicit ``keys`` are
    validated against the schema: a key absent from the frame, or an
    extra non-measure column not listed in ``keys``, raises rather than
    silently dropping/collapsing it."""
    missing_m = [c for c in _MEASURES if c not in rollup.columns]
    if missing_m:
        raise ValueError(f"not a rollup frame (missing {missing_m})")
    extra = [c for c in rollup.columns if c != "bucket" and c not in _MEASURES]
    if keys is None:
        return extra
    absent = [k for k in keys if k not in rollup.columns]
    if absent:
        raise ValueError(f"keys {absent} not in rollup columns {rollup.columns}")
    unexpected = [c for c in extra if c not in keys]
    if unexpected:
        raise ValueError(
            f"rollup has key-like columns {unexpected} not listed in keys={keys};"
            " aggregating across them would silently merge key groups"
        )
    return list(keys)


def coarsen(rollup: DataFrame, factor: int, keys: list[str] | None = None) -> DataFrame:
    """Re-aggregate a rollup to buckets ``factor``x coarser — same
    schema, no raw-event scan. Composable: coarsen(coarsen(r, 60), 24)
    is minutes -> hours -> days. Key columns are inferred from the
    schema when ``keys`` is omitted (see :func:`_rollup_keys`)."""
    keys = _rollup_keys(rollup, keys)
    return rollup.groupBy(
        _floor_div("bucket", factor).alias("bucket"), *keys
    ).agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum("sum_m").alias("sum_m"),
        F.min("min_m").alias("min_m"),
        F.max("max_m").alias("max_m"),
    )


def merge_rollups(
    *rollups: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Merge rollup frames at the SAME bucket granularity — the
    incremental-view-maintenance step: ``merge_rollups(base, delta)``
    equals the rollup of the union of their inputs, because every
    stat is mergeable (cnt/sum re-sum, min/max re-extremize) —
    exactly for the integer/extremal stats, to float-summation-order
    for sum_m (absorbed by finalize_rollup's determinism rounding).
    At 100 TB this is the whole point of the cascade: a new ingest
    batch re-aggregates ONLY its own buckets (delta-sized shuffle)
    and merges into history without rescanning it; hash-partitioned
    history on ``bucket`` makes the merge co-located.

    Key columns are inferred from the first frame's schema when
    ``keys`` is omitted and every frame is validated against them, so
    merging keyed rollups without ``keys=`` can no longer silently
    aggregate across the key groups."""
    keys = _rollup_keys(rollups[0], keys)
    for r in rollups:
        _rollup_keys(r, keys)
    out = rollups[0]
    for r in rollups[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket", *keys).agg(
        F.sum("cnt").cast("bigint").alias("cnt"),
        F.sum("sum_m").alias("sum_m"),
        F.min("min_m").alias("min_m"),
        F.max("max_m").alias("max_m"),
    )


def finalize_rollup(rollup: DataFrame, *, sum_dp: int = 2, dp: int = 6) -> DataFrame:
    """Read-time projection: derive avg from the mergeable stats and
    round the float measures (identically to the SQL oracle) so the
    order-insensitive value hash is stable across summation orders.

    avg divides the ROUNDED sum: measures with fixed decimal
    granularity make raw sums sit ~1e-12 from an exact multiple, so
    two engines' summation orders agree after round(sum_dp) — and a
    division of identical doubles is identical IEEE output — whereas
    raw-sum/cnt lands on round(dp) half-way points and flips
    (observed at sf0.1: 45.2771875 rounding either way)."""
    avg = F.round(F.round("sum_m", sum_dp) / F.col("cnt"), dp)
    return rollup.select(
        "bucket",
        "cnt",
        F.round("sum_m", sum_dp).alias("sum_m"),
        F.round("min_m", dp).alias("min_m"),
        F.round("max_m", dp).alias("max_m"),
        avg.alias("avg_m"),
    )


def value_runs(
    df: DataFrame,
    value: str,
    order: list[str],
    group: str,
) -> DataFrame:
    """Collapse consecutive equal values of ``value`` (per ``group``,
    under the ``order`` columns) into validity runs — the
    gaps-and-islands VALUE-CHANGE variant (the time-gap variant is
    session segmentation): (group, run_seq, value, run_start/end
    order-key bounds, n_events). This is how SCD Type-2 dimension
    history is derived from a snapshot/event stream — each run is one
    valid_from/valid_to row of the history table.

    Plan: one lag window marks change points, one running sum numbers
    runs, one groupBy collapses them — all three shuffles keyed on
    ``group`` (Spark reuses the exchange across the two windows:
    millions of independent group partitions, no global sort).
    NULL-safe value comparison (a NULL run is a run)."""
    from pyspark.sql.window import Window

    ocols = [F.col(c) for c in order]
    w = Window.partitionBy(group).orderBy(*ocols)
    # the first row is ALWAYS a change point — a bare null-safe lag
    # compare would fuse a NULL-valued first run with "no previous
    # row" and start run_seq at 0 (caught by the NULL-run test)
    chg = (
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(F.lag(value).over(w).eqNullSafe(F.col(value)), F.lit(0))
        .otherwise(F.lit(1))
    )
    run = df.withColumn("_chg", chg).withColumn(
        "run_seq",
        F.sum("_chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    first_order = order[0]
    return run.groupBy(group, "run_seq", value).agg(
        F.min(first_order).alias("run_start"),
        F.max(first_order).alias("run_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts: str,
    value: str,
    group: str,
    tiebreak: str = "event_id",
    sum_dp: int = 4,
    dp: int = 6,
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled series per
    group: each observation holds until the next one, so
    ``twap = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)`` — the
    TWAP/duration-weighted metric a plain AVG gets wrong whenever
    sampling density correlates with level (bursts of readings at a
    spike overweight the spike). The last observation of each group
    carries no duration and contributes nothing (standard left-closed
    convention). Groups with a single observation (zero total
    duration) return NULL.

    One lead window + one agg, both keyed on ``group``; the exchange
    is reused. Tie order under equal timestamps is pinned by
    ``tiebreak`` (ties carry zero duration, but WHICH row gets the
    zero changes the sum — both engines must agree). The weighted sum
    is rounded once before the divide (the cross-engine money rule)
    and the ratio floor-rounded to ``dp`` (the portable half-up
    round; see extras/similarity._pround6)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group).orderBy(F.col(ts), F.col(tiebreak))
    d = df.withColumn("_nxt", F.lead(ts).over(w))
    # durations rescale to SECONDS before the weighted sum: at nanos
    # magnitude (~1e13) a double's ulp exceeds the 4dp determinism
    # rounding, so summation-order differences would survive; at
    # seconds magnitude round(sum, 4) absorbs them (the money rule)
    dt = (F.col("_nxt") - F.col(ts)).cast("double") / F.lit(1e9)
    num = F.round(F.sum(F.col(value) * dt), sum_dp)
    den = (F.max(ts) - F.min(ts)).cast("double") / F.lit(1e9)
    ratio = F.try_divide(num, F.nullif(den, F.lit(0.0)))
    twap = F.floor(ratio * F.lit(10.0 ** dp) + F.lit(0.5)) / F.lit(10.0 ** dp)
    return d.groupBy(group).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        twap.alias("twap"),
    )
