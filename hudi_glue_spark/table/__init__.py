"""The keyed-lakehouse table layer (SURVEY.md §1.4, §2a #3,7-9,23).

Re-creates the reference's Hudi copy-on-write table semantics natively:
record key + precombine field + Hive-style partitioning + commit
timeline + cleaner, all above plain Parquet and DataFrames — no custom
Catalyst rules, no external table-format jar.
"""

from hudi_glue_spark.table.keyed_table import KeyedTable, ingest
from hudi_glue_spark.table.manifest import Manifest

__all__ = ["KeyedTable", "Manifest", "ingest"]
