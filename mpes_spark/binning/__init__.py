from mpes_spark.binning.engine import (
    bin_dataframe,
    bin_sparse,
    bin_sparse_sql,
    densify,
    histogram_per_group,
    with_bin_indices,
)
from mpes_spark.binning.spec import BinAxis, axes_from_triples

__all__ = [
    "BinAxis",
    "axes_from_triples",
    "bin_dataframe",
    "bin_sparse",
    "bin_sparse_sql",
    "densify",
    "histogram_per_group",
    "with_bin_indices",
]
