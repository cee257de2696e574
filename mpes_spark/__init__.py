"""mpes_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``mpes-kit/mpes``.

The reference (``/root/reference``) is a Dask-based ETL/analytics
pipeline for single-electron event data: ingest event tables, apply
per-row calibration/correction column transforms, and reduce billions
of rows to dense N-D histograms ("binning"). This package re-expresses
that surface Spark-first:

- event tables are Spark DataFrames (``mpes_spark.io``),
- calibration/correction transforms are native ``Column`` expression
  factories (``mpes_spark.transforms``) — no UDFs in the hot path,
- binning is ``groupBy(bin indices).count()`` with Spark's partial+final
  hash aggregation replacing the reference's hand-rolled per-partition
  histogram + tree combine (``mpes_spark.binning``),
- the dense labeled histogram is a small driver-side container
  (``mpes_spark.grid``),
- calibration solvers run driver-side on small landmark data
  (``mpes_spark.calibrate``),
- post-aggregation analysis (backgrounds, peaks, segmentation,
  registration, fitting, alignment) in ``mpes_spark.analysis`` with
  ``applyInPandas`` adapters for per-group batching,
- large-scale training-data operators (dedup, similarity search, text
  stats, multimodal plumbing, portable HLL/count-min/bloom sketches)
  live in ``mpes_spark.extras``,
- iterative graph analytics (fixed-iteration PageRank) in
  ``mpes_spark.analysis.graph``,
- join-key skew profiling and profile-driven salting in
  ``mpes_spark.diagnostics``,
- live binning and continuous rollup maintenance over event streams
  in ``mpes_spark.streaming``.

Coverage vs the reference's operator inventory: COVERAGE.md.
Scale design rationale (100 TB / 1000 executors): SCALING.md.
"""

from mpes_spark.binning import BinAxis, bin_dataframe, bin_sparse, densify
from mpes_spark.grid import BinnedArray
from mpes_spark.pipeline import EventPipeline
from mpes_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "BinAxis",
    "BinnedArray",
    "EventPipeline",
    "bin_dataframe",
    "bin_sparse",
    "densify",
    "get_spark",
]
