"""Read-side connectors (SURVEY.md §2a #1-4).

The reference reads CSV with an explicit schema + header + glob
(glue/NYTaxiDataPrep.py:29,33) and Parquet through a Glue DynamicFrame
configured for recursive S3 listing with no file grouping
(glue/HudiJarGlueJob.py:73-74). Both collapse to plain ``spark.read``
here — the DynamicFrame indirection adds nothing on open Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema + header, glob-friendly.

    Mirrors glue/NYTaxiDataPrep.py:33. Passing an explicit ``schema``
    skips the inference scan — required at scale (an inference pass over
    100 TB of CSV is a full extra read).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str, *paths: str) -> DataFrame:
    """Plain Parquet scan. Column pruning + predicate pushdown are free."""
    return spark.read.parquet(path, *paths)


def normalize_ns_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """Normalize event-time columns to microsecond TimestampType (LTZ),
    whatever physical form the parquet writer chose:

    - TIMESTAMP(NANOS) read as LongType under
      ``spark.sql.legacy.parquet.nanosAsLong``: integer ``div`` (not
      ``/``) — ns epoch values exceed 2^53 so double division would
      lose precision.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 infers as
      TIMESTAMP_NTZ: cast to TIMESTAMP — an identity instant mapping
      under the engine's pinned UTC session timezone (session.py), and
      required by instant functions like ``unix_micros``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for c in cols:
        if c not in df.columns:
            continue
        dt = df.schema[c].dataType
        if isinstance(dt, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_parquet_recursive(spark: SparkSession, path: str) -> DataFrame:
    """Recursive Parquet scan over a directory tree.

    Replaces the reference's DynamicFrame reader
    (``connection_type='s3', recurse=True, groupFiles='none'`` →
    ``.toDF()``, glue/HudiJarGlueJob.py:73-74) with Spark's native
    ``recursiveFileLookup``. Note: recursive lookup disables Hive-style
    partition discovery by design — use :func:`read_parquet` with a
    ``basePath`` for partitioned layouts.
    """
    return spark.read.option("recursiveFileLookup", "true").parquet(path)
