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
