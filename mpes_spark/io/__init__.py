from mpes_spark.io.igor import load_ibw, read_waves_ibw, save_ibw
from mpes_spark.io.mirror import CopyTool
from mpes_spark.io.readers import gather_files, read_table

__all__ = [
    "CopyTool",
    "gather_files",
    "load_ibw",
    "read_table",
    "read_waves_ibw",
    "save_ibw",
]
