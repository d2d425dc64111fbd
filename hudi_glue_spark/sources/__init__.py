"""Sources & sinks: CSV scan, recursive Parquet scan, Parquet write."""

from hudi_glue_spark.sources.readers import read_csv, read_parquet, read_parquet_recursive
from hudi_glue_spark.sources.writers import write_parquet

__all__ = ["read_csv", "read_parquet", "read_parquet_recursive", "write_parquet"]
