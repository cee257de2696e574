from mpes_spark.io.readers import gather_files, read_table

__all__ = ["gather_files", "read_table"]
