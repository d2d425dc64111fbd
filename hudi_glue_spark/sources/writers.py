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
