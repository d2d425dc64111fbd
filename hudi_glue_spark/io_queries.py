"""Format-ingestion queries: CSV and JSONL round-trips through real
files (driver-checked), covering the reference's CSV source operator
(SURVEY.md §2a #1, glue/NYTaxiDataPrep.py:29,33) as an EXACT query
rather than only a unit test.

Each query materializes the events table into the format under /tmp
(once per process per sf_dir), reads it back with an EXPLICIT schema —
the posture that matters at 100 TB, where a schema-inference pass is a
full extra scan of the corpus — and must reproduce the parquet-derived
oracle exactly. Doubles survive because Spark writes shortest-round-trip
representations; the timestamp column is excluded (CSV has no canonical
timestamp encoding — parquet is the typed format; CSV/JSONL are landing
formats)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling modules)

from hudi_glue_spark.operators.export import shard_id_sql
from hudi_glue_spark.operators.text import words_sql
from hudi_glue_spark.queries import query, sf_tag, table
from hudi_glue_spark.sources.readers import read_csv

_COLS = ["event_id", "user_id", "event_type", "value"]
_DDL = "event_id bigint, user_id bigint, event_type string, value double"

#: staging dirs already written by this process (bench/driver call each
#: query several times per session — write once)
_STAGED: set[str] = set()


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    base = sf_tag(sf_dir)
    out = f"/tmp/hudi_glue_spark_io_{fmt}_{base}"
    if out not in _STAGED or not os.path.isdir(out):
        ev = table(spark, sf_dir, "events").select(_COLS)
        w = ev.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).csv(out)
        elif fmt == "orc":
            w.orc(out)
        else:
            w.json(out)
        _STAGED.add(out)
    return out


_ORACLE = """
    SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value
    FROM events
"""


@query("csv_ingest_roundtrip", _ORACLE)
def q_csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema + header (§2a #1): events staged to
    CSV, read back via sources.read_csv, value-exact against the parquet
    oracle. No inference scan; the glob/path handling is Spark's own."""
    path = _stage(spark, sf_dir, "csv")
    return read_csv(spark, path, schema=_DDL, header=True).select(_COLS)


@query("jsonl_ingest_roundtrip", _ORACLE)
def q_jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingest with explicit schema — the landing format of
    most raw text corpora. Schema-on-read, no inference pass; malformed
    rows would surface as NULLs (PERMISSIVE), not job failures."""
    path = _stage(spark, sf_dir, "jsonl")
    return spark.read.schema(_DDL).json(path).select(_COLS)


@query("orc_ingest_roundtrip", _ORACLE)
def q_orc_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip — the third landing format (Hive-ecosystem
    counterpart of parquet; Spark reads/writes it natively with the
    same pushdown/pruning machinery). Typed columnar storage, so
    doubles and longs survive bit-exact without string round-trips;
    explicit schema keeps the read a single pass."""
    path = _stage(spark, sf_dir, "orc")
    return spark.read.schema(_DDL).orc(path).select(_COLS)


_N_EXPORT_SHARDS = 8


@query(
    "jsonl_shard_export",
    f"""
    SELECT {shard_id_sql("doc_id", _N_EXPORT_SHARDS)} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(len({words_sql("text")})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
    """,
)
def q_jsonl_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded training export round-trip: the documents table written
    as 8 deterministic md5-sharded JSONL shard dirs (the data-loader
    hand-off layout — operators/export.py), read back through the
    loader's view (explicit schema + recovered shard partition column),
    then audited per shard: doc count, key checksum, token total — all
    value-exact against computing the same shard assignment directly on
    the parquet table, which proves the export moved every document to
    exactly one correct shard with its text byte-intact."""
    from hudi_glue_spark.operators.export import (
        export_jsonl_shards,
        read_jsonl_shards,
    )
    from hudi_glue_spark.operators.text import token_count

    base = sf_tag(sf_dir)
    out = f"/tmp/hudi_glue_spark_io_shards_{base}"
    if out not in _STAGED or not os.path.isdir(out):
        docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        export_jsonl_shards(docs, out, key="doc_id", n_shards=_N_EXPORT_SHARDS)
        _STAGED.add(out)
    back = read_jsonl_shards(
        spark, out, "doc_id bigint, source string, text string"
    )
    return back.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(token_count("text").cast("bigint")).alias("n_tokens"),
    )
