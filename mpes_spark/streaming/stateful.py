"""Custom stateful streaming operator: cumulative per-group histogram.

Unlike the windowed aggregations in :mod:`mpes_spark.streaming.live`
(state evicted by watermark), a live acquisition display wants the
*running* histogram since scan start. That is a custom stateful
operator — ``applyInPandasWithState``: per group key, the state holds
the occupied-bin count vector; each micro-batch folds its events in
and emits the updated sparse histogram.

State size is grid-bounded per group (never event-bounded): at a
512x512x50 production grid the worst-case state per group is the
occupied-cell dict, exactly the memory the reference's accumulating
``binDataframe`` combine held per worker (SURVEY §2.3) — but sharded
across executors by group and checkpointed by the streaming engine.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mpes_spark.binning.spec import BinAxis

_OUT_SCHEMA = "group string, bin bigint, cnt bigint"
_STATE_SCHEMA = "bins array<bigint>, counts array<bigint>"


def cumulative_histogram(
    stream: DataFrame,
    axis: BinAxis,
    group_col: str,
) -> DataFrame:
    """Running sparse 1-D histogram per group over a stream. Emits the
    full updated (group, bin, cnt) set for a group whenever that group
    receives events. Input must already carry the value column
    ``axis.col``; out-of-range rows are dropped per the half-open bin
    rule (same semantics as the batch engine)."""
    lo, step, nbins = float(axis.lo), axis.step, axis.nbins

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bins, counts = state.get
            acc = dict(zip(bins, counts))
        else:
            acc = {}
        for pdf in pdfs:
            vals = pdf[axis.col].to_numpy(dtype="float64")
            idx = ((vals - lo) / step).astype("int64")
            ok = (vals >= lo) & (idx >= 0) & (idx < nbins)
            for b in idx[ok]:
                acc[int(b)] = acc.get(int(b), 0) + 1
        state.update((list(acc.keys()), list(acc.values())))
        yield pd.DataFrame(
            {
                "group": [str(key[0])] * len(acc),
                "bin": list(acc.keys()),
                "cnt": list(acc.values()),
            }
        )

    return (
        stream.groupBy(group_col)
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
