"""Sharded corpus export — the hand-off from curation to training.

A training run doesn't read one giant table; its data loader reads N
shards that workers consume independently. The contract that matters:

- **Deterministic membership**: shard(doc) depends only on the doc's
  key — never on partitioning, row order, or cluster size — so a
  re-export after an incremental append moves no existing document
  between shards, and two engines (or two runs) produce identical
  shard contents. ``df.randomSplit``/round-robin break this.
- **Balanced**: md5-uniform assignment keeps shards within ~sqrt
  deviation of each other, with no coordination and no global sort.
- **Scale shape**: assignment is a pure projection (no shuffle); the
  write shuffles ONCE on the shard id, so each shard's files are
  written by the tasks that own it. At 100 TB with n_shards in the
  thousands this is a single hash exchange — no driver involvement,
  no global ordering stage.

The reference has no exporter (its curated output IS the Hudi table;
Redshift/spectrum_setup.sql:2-11 hands files to the next engine by
catalog pointer) — this is part of the §2b training-pipeline extension
surface, like packing and splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def shard_id(key: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard in [0, n_shards): first 15 hex digits of
    md5(salt + key) mod n_shards — engine-portable (md5 + string ops
    only), partitioning- and order-independent, salt-able so distinct
    exports draw independent assignments."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(n_shards)).cast("int")


def shard_id_sql(key: str, n_shards: int, salt: str = "") -> str:
    """DuckDB twin of :func:`shard_id`."""
    return (
        f"CAST(CAST(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {n_shards} AS INTEGER)"
    )


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    key: str,
    n_shards: int,
    salt: str = "",
) -> None:
    """Write ``df`` as ``n_shards`` JSONL shard directories
    (``shard=K/part-*.json``) under ``out_dir`` — the layout a data
    loader consumes (one worker per shard dir; JSONL because it is the
    lingua-franca landing/loader format, streamable and splittable).

    One shuffle, keyed on the shard id, so every task writes few shards
    and every shard is written by few tasks; no global sort, no
    coordination. Overwrites ``out_dir`` (an export is a publication of
    a snapshot, not an append target — re-export after changes instead).
    """
    sharded = df.withColumn(SHARD_COL, shard_id(key, n_shards, salt))
    (
        sharded.repartition(n_shards, F.col(SHARD_COL))
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
        .json(out_dir)
    )


def read_jsonl_shards(spark, out_dir: str, schema: str) -> DataFrame:
    """Read an export back (loader's view): explicit schema — never an
    inference scan — plus the ``shard`` partition column Spark recovers
    from the directory layout."""
    return (
        spark.read.schema(schema)
        .option("basePath", out_dir)
        .json(f"{out_dir}/{SHARD_COL}=*")
    )
