"""The binning engine — N-D histogram aggregation as a Spark groupBy.

The reference's core query reduces ~1e9 event rows to a dense 2-4-D
counts array via hand-rolled per-partition ``np.histogramdd``/numba
kernels plus a manual tree combine (``binDataframe*``,
``/root/reference/mpes/fprocessing.py:1485-1847``;
``parallelBinning``, ``:3010-3109``). In Spark the entire machinery —
partition-local partial histograms, wave scheduling, parallel combine —
is a single declarative plan:

    events.withColumn(bin_i, floor((x_i - lo_i)/step_i))
          .filter(0 <= bin_i < nbins_i)
          .groupBy(bin_0..bin_{d-1}).count()

Catalyst/Tungsten give partial (map-side) aggregation, whole-stage
codegen for the floor arithmetic, parquet column pruning down to the
binned axes, and AQE-coalesced shuffle for the final combine. The
sparse (bin..., count) relation is at most prod(nbins) rows (~1e7 for
production 512x512x50 grids) regardless of input row count, so the
shuffle is tiny and the densify step is a bounded driver-side scatter.

Scale notes (100 TB): the only shuffle moves <= grid-size rows per
partial aggregate; input is scanned once with only the axis columns
read (ReadSchema pruning). No collect() of event data ever happens —
only the aggregated sparse histogram (bounded by grid size, not data
size) comes to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mpes_spark.binning.spec import BinAxis
from mpes_spark.grid.binned import BinnedArray


def with_bin_indices(
    df: DataFrame, axes: Sequence[BinAxis], keep: Sequence[str] = ()
) -> DataFrame:
    """Project the input down to bin-index columns (+ optional
    carried-through columns), pre-filtering on the raw value domain
    ``lo <= x < hi`` per the half-open bin rule.

    Filtering on the *value* (not on ``floor(...)``) matters twice at
    scale: (a) plain-column range predicates push down to the parquet
    scan (``PushedFilters``) while floor-expressions never do, and
    (b) when the axis is an expensive derived expression (TPS warp,
    homography), the expression is evaluated once in the projection
    instead of being re-inlined into every range conditional — the
    round-1 formulation blew the whole-stage-codegen method limit on
    the TPS query and fell back to interpreted eval (~8x slower).
    The residual guard against float-edge stragglers moves to a
    post-aggregation filter on the (tiny) grouped result in
    :func:`bin_sparse`."""
    out = df
    for ax in axes:
        if not ax.prefilter:
            continue
        x = F.col(ax.col)
        out = out.filter((x >= F.lit(float(ax.lo))) & (x < F.lit(float(ax.hi))))
    cols = [ax.index_expr().alias(ax.out) for ax in axes] + [F.col(c) for c in keep]
    return out.select(*cols)


def bin_sparse(
    df: DataFrame,
    axes: Sequence[BinAxis],
    extra_keys: Sequence[str] = (),
    count_name: str = "cnt",
    weight: str | None = None,
) -> DataFrame:
    """N-D histogram as a sparse relation (bin_0..bin_{d-1}[, extra
    keys], count). ``extra_keys`` supports the per-file histogram
    matrix (``extractEDC``, /root/reference/mpes/fprocessing.py:3418-3435)
    and any group-parallel binning. ``weight`` switches the measure
    from row counts to a weighted histogram ``sum(weight)`` — the
    non-count-measure extension SURVEY §2.9 anticipates (the
    reference's kernels are count-only); same plan shape, the partial
    aggregate carries a sum instead of a count. The final bin-range
    filter runs on the aggregated relation (grid-bounded rows) and
    exists only to drop the rare float-boundary bin
    ``floor((x-lo)/step) == nbins`` for x just below hi."""
    keep = list(extra_keys) + ([weight] if weight else [])
    keyed = with_bin_indices(df, axes, keep=keep)
    keys = [ax.out for ax in axes] + list(extra_keys)
    measure = (
        F.sum(F.col(weight)).alias(count_name)
        if weight
        else F.count(F.lit(1)).alias(count_name)
    )
    out = keyed.groupBy(*keys).agg(measure)
    for ax in axes:
        out = out.filter(ax.in_range_expr(F.col(ax.out)))
    return out


def bin_sparse_sql(
    table: str,
    axes: Sequence[BinAxis],
    extra_keys: Sequence[str] = (),
    count_name: str = "cnt",
    where: str | None = None,
    weight: str | None = None,
    round_digits: int | None = None,
) -> str:
    """The DuckDB-oracle twin of :func:`bin_sparse` — same arithmetic,
    same half-open rule (value-domain pre-filter + post-aggregation
    bin guard), same column names. ``weight``/``round_digits`` mirror
    the weighted-measure variant."""
    sel = ", ".join(
        [f"{ax.index_sql()} AS {ax.out}" for ax in axes] + list(extra_keys)
    )
    conds = [
        f"({ax.col} >= {float(ax.lo)!r} AND {ax.col} < {float(ax.hi)!r})"
        for ax in axes
        if ax.prefilter
    ]
    if where:
        conds.append(f"({where})")
    where_sql = f"WHERE {' AND '.join(conds)} " if conds else ""
    keys = ", ".join([ax.out for ax in axes] + list(extra_keys))
    outer = " AND ".join(ax.in_range_sql(ax.out) for ax in axes)
    if weight:
        m = f"sum({weight})"
        if round_digits is not None:
            m = f"round({m}, {round_digits})"
        measure = f"{m} AS {count_name}"
    else:
        measure = f"count(*) AS {count_name}"
    return (
        f"SELECT * FROM (SELECT {sel}, {measure} FROM {table} "
        f"{where_sql}GROUP BY {keys}) binned WHERE {outer}"
    )


def densify(
    sparse: DataFrame,
    axes: Sequence[BinAxis],
    count_name: str = "cnt",
    dtype: str = "float64",
) -> BinnedArray:
    """Collect the sparse histogram (bounded by grid size, not input
    size) and scatter into a dense zero-filled ndarray with labeled
    midpoint axes — the engine's equivalent of the reference's
    ``histdict`` (``/root/reference/mpes/fprocessing.py:1199-1210``)."""
    shape = tuple(ax.nbins for ax in axes)
    ncells = int(np.prod(shape))
    if ncells > 200_000_000:
        raise ValueError(
            f"dense grid of {ncells} cells would not fit on the driver; "
            "keep the result sparse or coarsen the grid"
        )
    cols = [ax.out for ax in axes] + [count_name]
    pdf = sparse.select(*cols).toPandas()
    data = np.zeros(shape, dtype=dtype)
    if len(pdf):
        idx = tuple(pdf[ax.out].to_numpy(dtype="int64") for ax in axes)
        data[idx] = pdf[count_name].to_numpy()
    return BinnedArray(
        data=data,
        dims=[ax.out for ax in axes],
        coords={ax.out: ax.centers() for ax in axes},
        attrs={"units": "counts"},
    )


def bin_dataframe(
    df: DataFrame,
    axes: Sequence[BinAxis],
    jitter: dict[str, float] | None = None,
    jitter_type: str = "uniform",
    seed: int | None = 42,
) -> BinnedArray:
    """End-to-end binning: optional seeded jitter -> sparse groupBy ->
    dense labeled array. Replaces ``distributedBinning``
    (``/root/reference/mpes/fprocessing.py:2448-2486``).

    Jitter (dithering before binning, cf. ``applyJitter``,
    ``/root/reference/mpes/fprocessing.py:1849-1870``) defaults to a
    *seeded* RNG so runs are reproducible — the reference's unseeded
    ``np.random`` is explicitly nondeterministic."""
    if jitter:
        from mpes_spark.transforms.columns import apply_jitter

        df = apply_jitter(df, jitter, jitter_type=jitter_type, seed=seed)
    return densify(bin_sparse(df, axes), axes)


def histogram_per_group(
    df: DataFrame,
    axis: BinAxis,
    group_col: str,
    count_name: str = "cnt",
) -> DataFrame:
    """1-D histogram per group key — the ``extractEDC`` batch query
    (``/root/reference/mpes/fprocessing.py:3418-3435``: one EDC trace
    per bias-scan file). Sparse output (group, bin, count)."""
    return bin_sparse(df, [axis], extra_keys=[group_col], count_name=count_name)
