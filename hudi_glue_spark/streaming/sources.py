"""Streaming sources: file-stream over the engine's parquet layout.

A file source needs an explicit schema (no inference mid-stream); we
take it from a one-off batch footer read of the same path, so the
streaming schema can never drift from the batch schema.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hudi_glue_spark.sources.readers import normalize_ns_timestamps

#: Columns stored as parquet TIMESTAMP(NANOS) per fixture table
#: (mirrors hudi_glue_spark.queries._NS_TS_COLS).
_NS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def stream_parquet(
    spark: SparkSession,
    path: str,
    ns_ts_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a parquet path (file or directory of files).

    ``max_files_per_trigger`` forces multi-micro-batch execution — used
    in tests to prove operators are incremental, and at scale to bound
    per-batch memory. TIMESTAMP(NANOS) columns are read as longs (via
    ``nanosAsLong``) and normalized to microsecond timestamps, exactly
    as the batch reader does.
    """
    if ns_ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema  # footer-only read
    if os.path.isfile(path):
        # The file stream source only accepts directories: stage a
        # symlink to the single file in a scratch dir.
        tag = hashlib.sha1(path.encode()).hexdigest()[:12]
        staging = f"/tmp/hgs_stream_src_{tag}"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging)
        os.symlink(os.path.abspath(path), f"{staging}/{os.path.basename(path)}")
        path = staging
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    if ns_ts_cols:
        df = normalize_ns_timestamps(df, ns_ts_cols)
    return df


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of ``queries.table``: stream a fixture table."""
    return stream_parquet(
        spark,
        f"{sf_dir}/{name}.parquet",
        ns_ts_cols=_NS_TS_COLS.get(name),
        max_files_per_trigger=max_files_per_trigger,
    )
