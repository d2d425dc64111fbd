"""The commit log as a Structured Streaming source
(streaming/table_source.py): per-commit deltas, offset resume from the
checkpoint, starting positions, DV semantics (history not rewritten),
and the retention error when an offset ages out of the log.

↦ Hudi incremental streaming read (query.type=incremental under
spark.readStream) — the consumption side of the reference's pipeline.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hudi_glue_spark.streaming.table_source import stream_changes
from hudi_glue_spark.table import KeyedTable


def _mk(spark, root, n=100) -> KeyedTable:
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root + "_ck", ignore_errors=True)
    t = KeyedTable(root, key="pk", precombine="ts", partition_by="part")
    t.bulk_insert(
        spark.range(0, n).select(
            F.col("id").alias("pk"),
            (F.col("id") % 4).cast("string").alias("part"),
            F.col("id").alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
    )
    return t


def _drain(spark, t, name, starting="earliest", ck=None):
    """Drain all pending commits through a foreachBatch collector (the
    memory sink does not support checkpoint recovery, which the resume
    tests need) and return the drained rows as a DataFrame."""
    src = stream_changes(spark, t, starting=starting)
    rows: list = []

    def _collect(batch, _bid):
        rows.extend(batch.collect())

    q = (
        src.writeStream.trigger(availableNow=True)
        .foreachBatch(_collect)
        .option("checkpointLocation", ck or (t.path + "_ck"))
        .start()
    )
    assert q.awaitTermination(240), "stream did not drain"
    return spark.createDataFrame(rows, src.schema)


def test_stream_changes_per_commit_deltas(spark):
    t = _mk(spark, "/tmp/ts_basic")
    t.upsert_dv(
        spark.createDataFrame(
            [(5, "1", 5000, -5), (200, "0", 1, -200)],
            "pk long, part string, ts long, val long",
        )
    )
    t.delete_dv([7])  # pure mask commit: adds no files, streams no rows
    out = _drain(spark, t, "ts_basic")
    c0, c1, _c2 = t.commits()
    per = {
        r["_commit"]: r["n"]
        for r in out.groupBy("_commit").agg(F.count("*").alias("n")).collect()
    }
    assert per == {c0: 100, c1: 2}  # bulk snapshot, then just the delta
    # partition column decoded from the hive dir; _commit attached
    got = {
        (r.pk, r.part, r.val)
        for r in out.filter(f"_commit = '{c1}'").collect()
    }
    assert got == {(5, "1", -5), (200, "0", -200)}
    # the later delete does NOT rewrite streamed history: pk=7 was
    # emitted as written at its commit time
    assert out.filter("pk = 7").count() == 1


def test_stream_changes_resumes_from_checkpoint(spark):
    t = _mk(spark, "/tmp/ts_resume")
    _drain(spark, t, "ts_resume_a")
    # two more commits while the stream is down
    t.upsert_dv(
        spark.createDataFrame(
            [(1, "1", 9000, -1)], "pk long, part string, ts long, val long"
        )
    )
    t.upsert_dv(
        spark.createDataFrame(
            [(300, "2", 1, -300)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain(spark, t, "ts_resume_b")
    # same checkpoint -> ONLY the two new commits' deltas arrive
    assert out.count() == 2
    assert {r.pk for r in out.collect()} == {1, 300}


def test_stream_changes_starting_latest(spark):
    t = _mk(spark, "/tmp/ts_latest")
    out = _drain(spark, t, "ts_latest_a", starting="latest")
    assert out.count() == 0  # nothing behind the head at stream start
    t.upsert_dv(
        spark.createDataFrame(
            [(400, "0", 1, -400)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain(spark, t, "ts_latest_b", starting="latest")
    assert {r.pk for r in out.collect()} == {400}


def test_stream_changes_offset_aged_out_errors(spark):
    import pytest

    t = _mk(spark, "/tmp/ts_aged")
    _drain(spark, t, "ts_aged_a")  # checkpoint now pins commit 1
    for i in range(3):
        t.upsert(
            spark.createDataFrame(
                [(i, str(i % 4), 10_000 + i, -i)],
                "pk long, part string, ts long, val long",
            )
        )
    t.clean(retain_commits=1)  # the checkpointed offset leaves the log
    with pytest.raises(Exception, match="aged out|not in the log"):
        _drain(spark, t, "ts_aged_b")


def test_stream_changes_cow_upsert_streams_rewritten_partitions(spark):
    """CoW upserts add whole rewritten partition files — the stream
    carries their post-image rows (file-level incremental parity),
    and replaying them through upsert still converges."""
    t = _mk(spark, "/tmp/ts_cow", n=40)
    t.upsert(
        spark.createDataFrame(
            [(0, "0", 9000, -99)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain(spark, t, "ts_cow")
    c0, c1 = t.commits()
    per = {
        r["_commit"]: r["n"]
        for r in out.groupBy("_commit").agg(F.count("*").alias("n")).collect()
    }
    assert per[c0] == 40
    assert per[c1] == 10  # part=0 rewritten: its 10 post-image rows
    # replay into a fresh table converges to the source snapshot
    view = KeyedTable("/tmp/ts_cow_view", key="pk", precombine="ts")
    shutil.rmtree(view.path, ignore_errors=True)
    for cid in t.commits():
        delta = out.filter(F.col("_commit") == cid).drop("_commit")
        from hudi_glue_spark.table import ingest

        ingest(view, delta)
    assert {tuple(r) for r in view.read(spark).collect()} == {
        tuple(r) for r in t.read(spark).collect()
    }
