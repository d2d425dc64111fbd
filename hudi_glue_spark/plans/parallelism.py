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
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
