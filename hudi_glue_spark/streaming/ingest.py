"""Streaming sinks: foreachBatch upsert into a KeyedTable, and a
memory-sink runner for finite (availableNow) streams.

``stream_ingest`` is the streaming twin of the reference's incremental
batch pipeline (glue/HudiJarGlueJob.py:89-134): each micro-batch goes
through the same ``ingest`` dispatch (bulk_insert first, upsert after) —
SURVEY.md §7's "keep upsert() foreachBatch-compatible" requirement,
fulfilled. Checkpointing makes the pipeline restartable; the KeyedTable
commit-per-batch gives exactly-once table state for idempotent keys.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from hudi_glue_spark.table import KeyedTable, ingest

_MEM_COUNTER = itertools.count()


def stream_ingest(
    table: KeyedTable,
    stream: DataFrame,
    checkpoint: str,
    mode: str = "rewrite",
) -> StreamingQuery:
    """Continuously merge a stream into a keyed table, one commit per
    micro-batch. ``availableNow`` drains what exists then stops — the
    streaming equivalent of the reference's day=N batch re-runs.

    ``mode="dv"`` routes each micro-batch through the merge-on-read
    upsert (``upsert_dv``): per-trigger cost becomes O(trigger rows) —
    winners appended, superseded base rows masked positionally —
    instead of O(touched partitions) rewrites, which is the write
    shape a standing high-frequency ingest needs (small triggers into
    big partitions); the maintenance loop folds the masks on its own
    cadence. Lost commit races re-run the whole merge against the new
    head (DV commits never rebase), bounded like upsert_with_retry.
    """
    if mode not in ("rewrite", "dv"):
        raise ValueError(f"unknown stream_ingest mode {mode!r}")

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        if mode == "rewrite" or not table.exists():
            ingest(table, batch)
            return
        from hudi_glue_spark.table import manifest as M

        last: Exception | None = None
        for _ in range(6):
            try:
                table.upsert_dv(batch)
                return
            except M.ConcurrentCommitError as e:
                last = e
        raise last  # type: ignore[misc]

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(
    spark: SparkSession,
    result: DataFrame,
    checkpoint: str,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a finite streaming aggregation to completion into a memory
    sink and return the result as a batch DataFrame.

    Used by the driver-facing queries: the stream drains under
    ``availableNow`` (plus Spark's no-data final batch, which advances
    the watermark so append-mode windows flush), then the memory table
    holds the complete answer.

    ``state_partitions`` sizes the stateful shuffle for the STREAM, not
    the session: every micro-batch opens (partitions × state-stores-
    per-operator) HDFS-backed stores, a fixed cost that dwarfs the data
    at test scale (a stream-stream join at 32 partitions pays ~8 s of
    pure store init/commit). The partition count is pinned into the
    checkpoint at first start, so this is per-query, and the session
    conf is restored right after start — batch queries keep AQE-sized
    shuffles. At 100 TB you raise it (state must fit per task); the
    number is a knob, not a constant baked into the plan.
    """
    name = f"hgs_stream_{next(_MEM_COUNTER)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            result.writeStream.queryName(name)
            .format("memory")
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination(timeout_s)
    q.stop()
    return spark.table(name)
