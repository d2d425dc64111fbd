"""hudi_glue_spark — a PySpark-native keyed-lakehouse analytics engine.

Re-expresses the capabilities of the reference repo (mq-tran/hudi-glue:
an AWS Glue + Apache Hudi copy-on-write replication pipeline) as an
idiomatic, standalone PySpark library, and extends it with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout
------
- ``session``     : SparkSession builder (AQE, dynamic partition overwrite).
- ``sources``     : readers (CSV / recursive Parquet / snapshot) and writers.
- ``operators``   : relational ops + LLM-pipeline ops (dedup, similarity, text).
- ``functions``   : scalar & vector column-expression helpers.
- ``table``       : ``KeyedTable`` — manifest commits, bulk_insert / upsert /
                    delete / clean / snapshot read (the reference's Hudi-CoW
                    semantics, re-built natively on Parquet + DataFrames).
- ``plans``       : plan-inspection utilities (pushdown / broadcast asserts).
- ``streaming``   : foreachBatch-compatible incremental-ingest wrappers.
- ``sql_dml``     : restricted-grammar MERGE / UPDATE / DELETE / INSERT
                    SQL strings routed onto the KeyedTable API (r13).
- ``sql_read``    : SELECT with VERSION AS OF / TIMESTAMP AS OF time
                    travel routed onto read(at=/as_of=) (r14).
- ``sql_ddl``     : CREATE TABLE [AS SELECT] / DROP TABLE routed onto
                    the KeyedTable constructor (r14).
- ``catalog``     : warehouse-directory name→path catalog — a fresh
                    session resolves tables by NAME (r15).
"""

from hudi_glue_spark.catalog import catalog_attach, catalog_open
from hudi_glue_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "catalog_open",
    "catalog_attach",
    "__version__",
]
