from mpes_spark.grid.binned import BinnedArray

__all__ = ["BinnedArray"]
