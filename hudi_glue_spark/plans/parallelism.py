"""Parallelism guard for compute-heavy narrow stages.

A small parquet file yields few input splits; Spark then runs expensive
per-row expressions (minhash, simhash, shingling) on a handful of cores
while the rest of the cluster idles. ``ensure_parallelism`` round-robin
repartitions ONLY when the plan has fewer partitions than the target —
at real scale (thousands of splits) it is a no-op, so it never *adds* a
shuffle where the scan is already wide."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen a narrow file scan before compute-heavy expressions.

    The width probe is ``df.inputFiles()`` — pure plan metadata. The
    previous ``df.rdd.getNumPartitions()`` probe forced a separate
    physical-planning pass (DataFrame→RDD conversion) and bypassed AQE
    plan reuse on every dedup/similarity hot path. A non-file plan
    (inputFiles() == []) is left untouched: anything downstream of a
    shuffle already has ``spark.sql.shuffle.partitions`` partitions.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
