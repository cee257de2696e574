from mpes_spark.transforms import columns, corrections, energy, momentum

__all__ = ["columns", "corrections", "energy", "momentum"]
