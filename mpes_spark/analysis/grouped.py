"""Distributed per-group analysis via ``applyInPandas``.

Batch the driver-side §2.6 operators over many spectra at once: the
sparse per-group histogram relation (group, bin, cnt) is grouped by
key and each group's trace is processed as one pandas batch — the
Arrow-backed analog of the reference's per-trace loops
(``bootstrapfit`` per momentum column, /root/reference/mpes/analysis.py:3034-3163;
``peaksearch`` over traces, :569-615).

Scale notes: groups are independent -> one shuffle on the group key,
then embarrassing parallelism; each group's trace is grid-bounded
(nbins rows), so per-task memory is tiny regardless of event count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def shirley_per_group(
    hist: DataFrame,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
) -> DataFrame:
    """Subtract a Shirley background from each group's histogram
    trace. Input: sparse (group, bin, cnt); output (group, bin, cnt,
    background, signal)."""
    from mpes_spark.analysis.background import shirley

    schema = (
        f"{group_col} string, {bin_col} bigint, {cnt_col} double, "
        "background double, signal double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bin_col)
        x = pdf[bin_col].to_numpy(dtype="float64")
        y = pdf[cnt_col].to_numpy(dtype="float64")
        bg = shirley(x, y, edge_pts=min(3, max(1, len(x) // 10)))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                bin_col: pdf[bin_col],
                cnt_col: y,
                "background": bg,
                "signal": y - bg,
            }
        )

    return hist.groupBy(group_col).applyInPandas(per_group, schema=schema)


def bootstrapfit_per_group(
    hist: DataFrame,
    group_col: str,
    line_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    model=None,
    p0=None,
    param_names: list[str] | None = None,
) -> DataFrame:
    """Distributed bootstrapped line fitting: within each group, fit
    the (line, bin) -> cnt map line-by-line with parameter
    bootstrapping from the previous line (sequential by construction —
    SURVEY §7 risk 5); groups run in parallel across the cluster.
    Input: sparse (group, line, bin, cnt). Output: (group, line,
    param..., cost) one row per fitted line."""
    from mpes_spark.analysis.fitting import Model, gaussian

    if model is None:
        model = Model(lambda x, p: gaussian(x, *p), ["amp", "xc", "sig"])
        p0 = p0 or [1.0, 0.0, 1.0]
    names = param_names or model.param_names
    schema = (
        f"{group_col} string, {line_col} bigint, "
        + ", ".join(f"{n} double" for n in names)
        + ", cost double"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        p = np.asarray(p0, dtype=float)
        out = []
        for line, grp in pdf.sort_values([line_col, bin_col]).groupby(line_col):
            x = grp[bin_col].to_numpy(dtype="float64")
            y = grp[cnt_col].to_numpy(dtype="float64")
            res = model.fit(x, y, p)
            p = res["p"]  # bootstrap the next line from this solution
            out.append(
                [pdf[group_col].iloc[0], int(line), *p.tolist(), res["cost"]]
            )
        return pd.DataFrame(out, columns=[group_col, line_col, *names, "cost"])

    return hist.groupBy(group_col).applyInPandas(per_group, schema=schema)


def peaks_per_group(
    hist: DataFrame,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    lookahead: int = 3,
    delta: float = 0.0,
    num_peaks: int = 3,
) -> DataFrame:
    """Top-k 1-D peaks per group trace (position, height, rank)."""
    from mpes_spark.analysis.peaks import peakdetect1d

    schema = f"{group_col} string, peak_pos double, peak_height double, rank bigint"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bin_col)
        x = pdf[bin_col].to_numpy(dtype="float64")
        y = pdf[cnt_col].to_numpy(dtype="float64")
        maxs, _ = peakdetect1d(y, x, lookahead=lookahead, delta=delta)
        if len(maxs) == 0:
            return pd.DataFrame(columns=[group_col, "peak_pos", "peak_height", "rank"])
        order = np.argsort(maxs[:, 1])[::-1][:num_peaks]
        sel = maxs[order]
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]] * len(sel),
                "peak_pos": sel[:, 0],
                "peak_height": sel[:, 1],
                "rank": np.arange(1, len(sel) + 1, dtype="int64"),
            }
        )

    return hist.groupBy(group_col).applyInPandas(per_group, schema=schema)


def shirley_window(
    hist: DataFrame,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    niter: int = 6,
    edge_pts: int = 3,
) -> DataFrame:
    """Shirley background as pure window algebra — the fixed-iteration
    rendering of ``shirley`` (reference behavior
    /root/reference/mpes/analysis.py:58-155) with NO Python in the
    plan. Per iteration: one running trapezoid integral + one
    partition total per group; every window shares the single shuffle
    on the group key (one Exchange, one sort, reused across all
    ``niter`` stages). ``shirley_per_group`` (applyInPandas) remains
    for tol-based early exit; this form is the oracle-replayable twin
    (:func:`shirley_window_sql` renders the identical recurrence for
    DuckDB) and the 100 TB shape — O(1) state per row, no per-group
    pandas materialization.

    Fixed ``niter`` (no convergence break) keeps both engines on the
    same arithmetic path; the reference's ``total == 0`` early exit is
    equivalent to the CASE guard here because a zero-total iteration
    is idempotent (resid unchanged -> total stays 0 -> bg unchanged).

    Cross-engine sync (r8 gate red -> r9 structural fix): window
    running sums and partition totals accumulate floats in
    engine-specific association orders, so ``_bg`` drifts ~1e-12 per
    iteration between Spark and DuckDB; six iterations compound the
    residue and a single output cell landing on a .00005 boundary
    flips the final round. The recurrence state (``_yl``/``_yr`` once,
    ``_bg`` every iteration) is therefore quantized to a fixed 1e-6
    grid with the portable floor-round (``floor(x*1e6+0.5)/1e6``, the
    repo's ``_pround6`` convention) — identical input doubles give
    identical grid points in both engines, so residue cannot
    accumulate across iterations.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    def _sync(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    g, b = group_col, bin_col
    w_ord = W.partitionBy(g).orderBy(b)
    w_all = W.partitionBy(g)
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)

    df = (
        hist.select(
            F.col(g),
            F.col(b),
            F.col(cnt_col),
            F.col(b).cast("double").alias("_x"),
            F.col(cnt_col).cast("double").alias("_y"),
        )
        .withColumn("_rna", F.row_number().over(w_ord))
        .withColumn(
            "_rnd",
            F.row_number().over(W.partitionBy(g).orderBy(F.col(b).desc())),
        )
        .withColumn(
            "_yl",
            _sync(
                F.avg(F.when(F.col("_rna") <= edge_pts, F.col("_y"))).over(w_all)
            ),
        )
        .withColumn(
            "_yr",
            _sync(
                F.avg(F.when(F.col("_rnd") <= edge_pts, F.col("_y"))).over(w_all)
            ),
        )
        .withColumn("_bg", F.lit(0.0))
    )
    for _ in range(niter):
        resid = F.col("_y") - F.col("_yr") - F.col("_bg")
        seg = (
            F.lit(0.5)
            * (resid + F.lag(resid).over(w_ord))
            * (F.col("_x") - F.lag(F.col("_x")).over(w_ord))
        )
        df = (
            df.withColumn("_seg", seg)
            .withColumn("_cum", F.coalesce(F.sum("_seg").over(w_run), F.lit(0.0)))
            .withColumn("_tot", F.sum("_seg").over(w_all))
            .withColumn(
                "_bg",
                _sync(
                    F.when(
                        F.col("_tot").isNull() | (F.col("_tot") == 0.0),
                        F.col("_bg"),
                    ).otherwise(
                        (F.col("_yl") - F.col("_yr"))
                        * (F.col("_tot") - F.col("_cum"))
                        / F.col("_tot")
                    )
                ),
            )
            .drop("_seg", "_cum", "_tot")
        )
    bg = F.col("_bg") + F.col("_yr")
    return df.select(
        g,
        b,
        cnt_col,
        bg.alias("background"),
        (F.col("_y") - bg).alias("signal"),
    )


def shirley_window_sql(
    hist_sql: str,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    niter: int = 6,
    edge_pts: int = 3,
    round_digits: int = 4,
) -> str:
    """DuckDB twin of :func:`shirley_window`: the same fixed-point
    recurrence textually unrolled as ``niter`` chained CTE pairs
    (trapezoid segments, then the CASE-guarded background update).
    Recurrence state is quantized to the same 1e-6 grid as the Spark
    side (portable floor-round — see :func:`shirley_window`), so
    engine-specific accumulation order in the window sums cannot
    drift across iterations; the final round is the same portable
    floor-round at ``round_digits`` in both engines."""
    g, b = group_col, bin_col
    w = f"PARTITION BY {g} ORDER BY {b}"

    def _sync(expr: str) -> str:
        return f"floor(({expr}) * 1e6 + 0.5) / 1e6"

    parts = [
        f"h AS ({hist_sql})",
        (
            f"e AS (SELECT *, CAST({b} AS DOUBLE) AS _x, "
            f"CAST({cnt_col} AS DOUBLE) AS _y, "
            f"row_number() OVER ({w}) AS _rna, "
            f"row_number() OVER (PARTITION BY {g} ORDER BY {b} DESC) AS _rnd "
            "FROM h)"
        ),
        (
            f"s0 AS (SELECT *, "
            + _sync(
                f"avg(CASE WHEN _rna <= {edge_pts} THEN _y END) "
                f"OVER (PARTITION BY {g})"
            )
            + " AS _yl, "
            + _sync(
                f"avg(CASE WHEN _rnd <= {edge_pts} THEN _y END) "
                f"OVER (PARTITION BY {g})"
            )
            + " AS _yr, "
            "CAST(0 AS DOUBLE) AS _bg FROM e)"
        ),
    ]
    for i in range(niter):
        parts.append(
            f"t{i} AS (SELECT *, "
            f"0.5 * ((_y - _yr - _bg) + lag(_y - _yr - _bg) OVER ({w})) "
            f"* (_x - lag(_x) OVER ({w})) AS _seg FROM s{i})"
        )
        bg_case = (
            f"CASE WHEN sum(_seg) OVER (PARTITION BY {g}) IS NULL "
            f"OR sum(_seg) OVER (PARTITION BY {g}) = 0 THEN _bg "
            f"ELSE (_yl - _yr) * (sum(_seg) OVER (PARTITION BY {g}) "
            f"- COALESCE(sum(_seg) OVER ({w} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)) "
            f"/ sum(_seg) OVER (PARTITION BY {g}) END"
        )
        parts.append(
            f"s{i + 1} AS (SELECT {g}, {b}, {cnt_col}, _x, _y, _yl, _yr, "
            + _sync(bg_case)
            + f" AS _bg FROM t{i})"
        )
    scale = 10**round_digits
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {g}, {b}, {cnt_col}, "
        f"floor((_bg + _yr) * {scale} + 0.5) / {scale} AS background, "
        f"floor((_y - (_bg + _yr)) * {scale} + 0.5) / {scale} AS signal "
        f"FROM s{niter}"
    )


def peaks_window(
    hist: DataFrame,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    lookahead: int = 3,
    num_peaks: int = 3,
) -> DataFrame:
    """Top-k peaks per group under the window-expressible lookahead
    rule: a row is a peak iff its count strictly exceeds every count in
    the ``lookahead`` preceding trace rows and is >= every count in the
    ``lookahead`` following rows (left edge of a plateau wins — the
    same leftmost-extremum convention as ``peakdetect1d``, reference
    behavior /root/reference/mpes/analysis.py:308-427). All-integer
    comparisons -> exact hash gate; :func:`peaks_window_sql` is the
    verbatim DuckDB rendering. One shuffle on the group key; the
    bounded-frame maxes and the rank window reuse the same sort."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    g, b = group_col, bin_col
    w_ord = W.partitionBy(g).orderBy(b)
    prev_max = F.max(cnt_col).over(w_ord.rowsBetween(-lookahead, -1))
    next_max = F.max(cnt_col).over(w_ord.rowsBetween(1, lookahead))
    peaks = (
        hist.withColumn("_pm", F.coalesce(prev_max, F.lit(-1)))
        .withColumn("_nm", F.coalesce(next_max, F.lit(-1)))
        .filter((F.col(cnt_col) > F.col("_pm")) & (F.col(cnt_col) >= F.col("_nm")))
    )
    w_rank = W.partitionBy(g).orderBy(F.col(cnt_col).desc(), F.col(b))
    return (
        peaks.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= num_peaks)
        .select(
            g,
            F.col(b).alias("peak_bin"),
            F.col(cnt_col).cast("bigint").alias("peak_height"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def peaks_window_sql(
    hist_sql: str,
    group_col: str,
    bin_col: str,
    cnt_col: str = "cnt",
    lookahead: int = 3,
    num_peaks: int = 3,
) -> str:
    """DuckDB twin of :func:`peaks_window` (identical frames, identical
    tie rule, all-integer)."""
    g, b = group_col, bin_col
    w = f"PARTITION BY {g} ORDER BY {b}"
    return (
        f"WITH h AS ({hist_sql}), "
        f"m AS (SELECT *, "
        f"COALESCE(max({cnt_col}) OVER ({w} ROWS BETWEEN {lookahead} "
        f"PRECEDING AND 1 PRECEDING), -1) AS _pm, "
        f"COALESCE(max({cnt_col}) OVER ({w} ROWS BETWEEN 1 FOLLOWING "
        f"AND {lookahead} FOLLOWING), -1) AS _nm FROM h), "
        f"p AS (SELECT {g}, {b}, {cnt_col}, "
        f"row_number() OVER (PARTITION BY {g} "
        f"ORDER BY {cnt_col} DESC, {b}) AS rank "
        f"FROM m WHERE {cnt_col} > _pm AND {cnt_col} >= _nm) "
        f"SELECT {g}, {b} AS peak_bin, "
        f"CAST({cnt_col} AS BIGINT) AS peak_height, "
        f"CAST(rank AS BIGINT) AS rank FROM p WHERE rank <= {num_peaks}"
    )
