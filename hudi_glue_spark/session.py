"""SparkSession construction for the engine.

The reference configures its session at glue/HudiJarGlueJob.py:21 (Kryo
serializer, required by Hudi) and steers shuffle width with fixed
parallelism numbers (hoodie.*.shuffle.parallelism = 20/10/3,
glue/HudiJarGlueJob.py:83-84). Per SURVEY.md §4 we supersede the fixed
numbers with AQE and make dynamic partition overwrite the default so the
copy-on-write upsert only rewrites touched partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Engine defaults, tuned for correctness-at-scale rather than any one SF:
#: - AQE handles shuffle-partition sizing, skew joins, and runtime re-planning
#:   (replaces the reference's hard-coded parallelism 20/10/3).
#: - dynamic partitionOverwriteMode lets INSERT OVERWRITE touch only the
#:   partitions present in the written DataFrame — the CoW rewrite primitive.
#: - UTC session timezone keeps timestamp arithmetic engine-portable.
#: - Arrow enabled so Pandas UDFs (the §2b extension ops) batch-transfer.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Honor DataSourceReader.pushFilters on Python data sources (the
    # manifest-backed snapshot relation prunes files from pushed filters).
    "spark.sql.python.filterPushdown.enabled": "true",
    # Explicit-path reads below MANIFEST_READ_MIN_FILES stay on the
    # native scan; above Spark's default threshold (32 paths) that scan
    # launches a one-task-per-path listing JOB whose scheduling overhead
    # (~3 ms/task) dwarfs a driver-side stat at these counts. List
    # sequentially up to the manifest-relation crossover instead; tables
    # past the crossover never take the native path at all.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "8192",
    # Kryo kept for parity with the reference session (harmless under
    # Tungsten for pure-SQL plans; see glue/HudiJarGlueJob.py:21).
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # ~128 MB scan splits — the target base-file size at 100 TB scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Read parquet TIMESTAMP(NANOS) physically as long (nanos since epoch)
    # instead of erroring; sources.readers.normalize_ns_timestamps converts
    # to microsecond TimestampType (lossless on µs-grained data).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "hudi-glue-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master=None`` defers to the environment (spark-submit / existing
    session); tests pass ``local[N]``. ``shuffle_partitions`` is only a
    starting width — AQE coalesces at runtime.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if master and master.startswith("local"):
        # Local mode packs driver + every executor thread into ONE JVM
        # whose default heap is 1 GiB — 32 MB per task at local[32],
        # an order of magnitude under any sane executor sizing (real
        # clusters give cores 4-8 GiB each). Size the heap like a small
        # executor — a quarter of physical RAM, capped at 16g — so
        # sort/aggregate buffers behave the way they would in
        # production without starving a small host. Only effective at
        # first JVM launch; extra_conf overrides.
        try:
            total_gb = (
                os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            ) // (1024**3)
            heap = max(2, min(16, total_gb // 4))
        except (ValueError, OSError):
            heap = 4
        conf["spark.driver.memory"] = f"{heap}g"
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
