"""Write-side connectors (SURVEY.md §2a #6, #10).

The reference writes raw Parquet with overwrite mode
(glue/NYTaxiDataPrep.py:38,43,48) and builds Hive-style partition values
by hand-concatenating ``"col=value"`` strings
(glue/HudiJarGlueJob.py:102). Spark's ``partitionBy`` produces that
layout natively, so the manual concat is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet write with optional Hive-style partitioning.

    At scale, one output file per (shuffle partition × partition value)
    is the small-file trap the reference disabled Hudi's handling of
    (``hoodie.parquet.small.file.limit: 0``, glue/HudiJarGlueJob.py:77).
    We instead repartition by the partition columns before writing so
    each partition value is written by few tasks, yielding ~target-size
    files; AQE coalescing sizes the final shuffle.
    """
    writer = df
    if partition_by:
        writer = df.repartition(*partition_by)
    w = writer.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    path: str,
    buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Hash-bucketed, sorted parquet table registered in the session
    catalog (``CLUSTERED BY (key) SORTED BY (...) INTO n BUCKETS``).

    This is the shuffle-amortization primitive the reference's Hudi
    tables never had: two tables bucketed by the same key with the same
    bucket count join WITHOUT an Exchange on either side — at 100 TB
    that converts the nightly fact⋈fact join from the single largest
    shuffle in the pipeline into a zipper over co-located files. The
    write pays the shuffle ONCE; every subsequent join/groupBy on the
    bucket key reuses the layout for free.

    ``path`` makes the table external, so no warehouse/metastore is
    required beyond the session's in-memory catalog.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(*(sort_cols or [key]))
        .saveAsTable(name)
    )
