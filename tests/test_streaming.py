"""Structured Streaming layer tests: incrementality across micro-batches,
session merging, and streaming-vs-batch agreement."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from hudi_glue_spark.streaming import (
    running_user_totals,
    run_to_memory,
    session_windows,
    stream_ingest,
    stream_parquet,
    tumbling_agg,
)
from hudi_glue_spark.table import KeyedTable


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _stage_event_files(spark, workdir: str, n_files: int = 3) -> str:
    """Split the events fixture into n single-file parquets, mtime-ordered."""
    from hudi_glue_spark.queries import table

    staging = f"{workdir}/staging"
    os.makedirs(staging)
    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    for i in range(n_files):
        part = ev.filter(F.col("event_id") % n_files == i)
        tmp = f"{workdir}/tmp_{i}"
        part.coalesce(1).write.parquet(tmp)
        f = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = f"{staging}/b{i}.parquet"
        shutil.move(f"{tmp}/{f}", dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        shutil.rmtree(tmp)
    return staging


def test_stateful_totals_multi_batch(spark, workdir):
    """With maxFilesPerTrigger=1 the stateful operator must fold state
    across 3 micro-batches; final emission per user == global batch agg."""
    staging = _stage_event_files(spark, workdir)
    stream = stream_parquet(spark, staging, max_files_per_trigger=1).select(
        "user_id", "value", "ts"
    )
    out = run_to_memory(
        spark, running_user_totals(stream), f"{workdir}/ckpt", output_mode="update"
    ).cache()
    emissions_per_user = out.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert emissions_per_user > 1, "expected multiple micro-batch emissions"

    final = {
        r["user_id"]: (r["n_events"], r["total_value_cents"])
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value_cents").alias("total_value_cents"),
        )
        .collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["cents"])
        for r in spark.read.parquet(staging)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert final == expected


def test_stream_ingest_commits_per_batch(spark, workdir):
    """foreachBatch ingest makes one commit per micro-batch (incremental,
    not one big swallow) and the final table equals the exact union."""
    staging = _stage_event_files(spark, workdir)
    tbl = KeyedTable(f"{workdir}/table", key="event_id", precombine="ts")
    stream = stream_parquet(spark, staging, max_files_per_trigger=1)
    q = stream_ingest(tbl, stream, f"{workdir}/ckpt")
    q.awaitTermination(120)
    assert len(tbl.commits()) == 3
    assert tbl.read(spark).count() == spark.read.parquet(staging).count()


def test_tumbling_agg_streaming_matches_batch(spark, workdir):
    staging = _stage_event_files(spark, workdir)
    stream = stream_parquet(spark, staging, max_files_per_trigger=1)
    agg = tumbling_agg(
        stream, "ts", "1 hour", F.count("*").alias("n"), keys=["event_type"]
    )
    got = run_to_memory(spark, agg, f"{workdir}/ckpt")
    expected = (
        spark.read.parquet(staging)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()


def test_session_window_merges_within_gap(spark, workdir):
    """Two events 10 min apart (gap 30) = one session; a third 2 h later
    opens a new one. Session end = last event + gap."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:10:00"),
    ]
    src = f"{workdir}/src"
    spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    ).coalesce(1).write.parquet(src)
    stream = stream_parquet(spark, src)
    got = run_to_memory(
        spark,
        session_windows(
            stream, "ts", "30 minutes", F.count("*").alias("n"), keys=["user_id"]
        ),
        f"{workdir}/ckpt",
    ).collect()
    sessions = {
        (str(r["session_start"]), str(r["session_end"]), r["n"]) for r in got
    }
    assert sessions == {
        ("2024-01-01 00:00:00", "2024-01-01 00:40:00", 2),
        ("2024-01-01 02:10:00", "2024-01-01 02:40:00", 1),
    }


def test_watermark_finalizes_windows_no_resurrection(spark, workdir):
    """Append-mode windowed agg with a 10-minute watermark. Spark's
    guarantee is one-directional: a window whose end passed the
    watermark is finalized, emitted ONCE, its state evicted — and a
    straggler arriving after eviction is dropped rather than
    resurrecting the window as a duplicate append row. (Late data for a
    still-live window MAY merge — that direction is not asserted.)"""
    import pyspark.sql.functions as F

    src = f"{workdir}/src"
    os.makedirs(src)

    def write_batch(i, rows):
        tmp = f"{workdir}/t{i}"
        spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.to_timestamp("ts_s").alias("ts")
        ).coalesce(1).write.parquet(tmp)
        f = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        shutil.move(f"{tmp}/{f}", f"{src}/b{i}.parquet")
        os.utime(f"{src}/b{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
        shutil.rmtree(tmp)

    # b0 advances the watermark to 11:50 (12:00 - 10 min)
    write_batch(0, [(1, "2024-01-01 10:05:00"), (1, "2024-01-01 12:00:00")])
    # b1: on-time row; at its end the 10:00 window (< watermark) is
    # emitted and evicted
    write_batch(1, [(1, "2024-01-01 12:05:00")])
    # b2: straggler for the already-evicted 10:00 window → dropped
    write_batch(2, [(1, "2024-01-01 10:07:00")])

    stream = stream_parquet(spark, src, max_files_per_trigger=1)
    agg = tumbling_agg(
        stream, "ts", "1 hour", F.count("*").alias("n"),
        keys=["user_id"], watermark="10 minutes",
    )
    got = run_to_memory(
        spark, agg, f"{workdir}/ckpt", output_mode="append"
    ).collect()
    rows_1000 = [r for r in got if str(r["window_start"]) == "2024-01-01 10:00:00"]
    assert len(rows_1000) == 1, got  # emitted once, never resurrected
    assert rows_1000[0]["n"] == 1  # the b2 straggler was dropped


def test_approx_distinct_within_error(spark):
    import pyspark.sql.functions as F
    from hudi_glue_spark.queries import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(1, 0.05 * e), (k, approx[k], e)


def test_stream_ingest_checkpoint_idempotent(spark, workdir):
    """Restarting a drained availableNow ingest with the SAME checkpoint
    must process nothing and create no new commits (exactly-once at the
    table level across restarts)."""
    staging = _stage_event_files(spark, workdir)
    tbl = KeyedTable(f"{workdir}/table", key="event_id", precombine="ts")
    q1 = stream_ingest(tbl, stream_parquet(spark, staging, max_files_per_trigger=1),
                       f"{workdir}/ckpt")
    q1.awaitTermination(120)
    n_commits = len(tbl.commits())
    n_rows = tbl.read(spark).count()
    q2 = stream_ingest(tbl, stream_parquet(spark, staging, max_files_per_trigger=1),
                       f"{workdir}/ckpt")
    q2.awaitTermination(120)
    assert len(tbl.commits()) == n_commits
    assert tbl.read(spark).count() == n_rows


def test_streaming_ivm_crash_replay_idempotent(spark, workdir):
    """At-least-once replay safety of the commit-stats idempotency
    ledger (the stream_cdf_agg_maintenance pattern): the maintainer
    CRASHES after its upsert lands but before the checkpoint commits
    the offset, so the restart REPLAYS that micro-batch — and the
    ledger must skip it instead of double-applying. An interleaved
    NON-stamping commit (a rollback here) must not reset the ledger:
    max_stat scans all retained commits, not just the head."""
    import os

    import pytest
    from pyspark.sql import functions as F

    staging = f"{workdir}/deltas"
    os.makedirs(staging)
    for i, rows in enumerate([[(1, 10.0), (2, 5.0)], [(1, 3.0)]]):
        tmp = f"{workdir}/d{i}"
        spark.createDataFrame(rows, "user_id int, v double").coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{part}", f"{staging}/f{i}.parquet")
        os.utime(f"{staging}/f{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    view = KeyedTable(f"{workdir}/view", key="user_id", precombine="ver")
    view.bulk_insert(
        spark.createDataFrame([(1, 0.0, 0)], "user_id int, s double, ver long")
    )
    crash = {"armed": True}

    def apply(batch, bid):
        applied = view.max_stat("applied_ver")
        if bid + 1 <= applied:
            return
        delta = batch.groupBy("user_id").agg(F.sum("v").alias("dv"))
        cur = view.read(spark).select("user_id", "s")
        merged = delta.join(cur, "user_id", "left").select(
            "user_id",
            (F.coalesce("s", F.lit(0.0)) + F.col("dv")).alias("s"),
            F.lit(bid + 1).cast("long").alias("ver"),
        )
        view.upsert(merged, extra_stats={"applied_ver": bid + 1})
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("injected crash after commit, before checkpoint")

    def run():
        return (
            stream_parquet(spark, staging, max_files_per_trigger=1)
            .writeStream.foreachBatch(apply)
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )

    q1 = run()
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination(120)

    # interleaved non-stamping maintenance commit on the view
    view.rollback(view.commits()[-1])
    assert view.latest_stats().get("applied_ver") is None  # head unstamped
    assert view.max_stat("applied_ver") == 1  # ledger still visible

    q2 = run()
    assert q2.awaitTermination(180)
    got = {r.user_id: r.s for r in view.read(spark).collect()}
    assert got == {1: 13.0, 2: 5.0}  # batch0 applied ONCE, batch1 applied


def test_streaming_ingest_maintains_vector_index(spark, workdir):
    """A file stream upserting into an INDEXED table inherits index
    maintenance per micro-batch (foreachBatch → upsert assigns each
    batch's rows from the stored centroids and carries the
    registration), so after the stream drains, indexed search equals a
    from-scratch rebuild — the standing-ingest ANN story, end to end."""
    import os

    from pyspark.sql import functions as F

    from hudi_glue_spark.operators import similarity as S
    from hudi_glue_spark.queries import table as read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 3)
    late = emb.filter(F.col("vec_id") % 5 == 3)

    tbl = KeyedTable(f"{workdir}/vtbl", key="vec_id", precombine="vec_id")
    tbl.bulk_insert(base)
    cents = S.ivf_centroids(emb, "vec_id", "embedding", n_centroids=4)
    tbl.build_ivf_index(spark, "embedding", centroids=cents)

    # stage the late rows as two stream files
    staging = f"{workdir}/vstage"
    os.makedirs(staging)
    halves = [late.filter(F.col("vec_id") % 2 == k) for k in (0, 1)]
    for i, h in enumerate(halves):
        tmp = f"{workdir}/vh{i}"
        h.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(f"{tmp}/{part}", f"{staging}/f{i}.parquet")
        os.utime(f"{staging}/f{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))

    q = stream_ingest(
        tbl,
        stream_parquet(spark, staging, max_files_per_trigger=1),
        f"{workdir}/vckpt",
    )
    assert q.awaitTermination(180)

    # maintained through BOTH micro-batches: registration live, every
    # row assigned, search == rebuild
    assert tbl.vector_index() is not None
    assert tbl.read(spark).filter(F.col("__cid").isNull()).count() == 0
    queries = emb.filter(F.col("vec_id") < 3)
    maintained = S.ivf_search_indexed(spark, tbl, queries, "vec_id", k=5)
    m_rows = sorted(map(tuple, maintained.collect()))
    tbl.build_ivf_index(spark, "embedding", centroids=cents)
    rebuilt = S.ivf_search_indexed(spark, tbl, queries, "vec_id", k=5)
    assert m_rows == sorted(map(tuple, rebuilt.collect()))


def test_stream_ingest_dv_mode_equals_rewrite(spark, workdir):
    """mode='dv' drains the same scenario through the merge-on-read
    upsert: final state equals the rewrite-mode twin row-for-row, no
    base file is ever rewritten across the triggers (commits only ADD
    files + masks), and the maintenance fold leaves the same rows."""
    from hudi_glue_spark.scenario_queries import _batches
    from hudi_glue_spark.table import manifest as M

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cols = ["event_id", "user_id", "event_type", "value", "ts"]

    def stage(tag):
        staging = f"{workdir}/stage_{tag}"
        os.makedirs(staging)
        for i, b in enumerate(_batches(spark, "/root/testdata/sf0.001")):
            tmp = f"{workdir}/{tag}_b{i}"
            b.select(cols).coalesce(1).write.parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            os.rename(f"{tmp}/{part}", f"{staging}/batch_{i}.parquet")
            os.utime(
                f"{staging}/batch_{i}.parquet",
                (1_700_000_000 + i, 1_700_000_000 + i),
            )
        return staging

    tables = {}
    for mode in ("rewrite", "dv"):
        t = KeyedTable(
            f"{workdir}/t_{mode}",
            key="event_id",
            precombine="ts",
            partition_by="event_type",
        )
        q = stream_ingest(
            t,
            stream_parquet(spark, stage(mode), max_files_per_trigger=1),
            f"{workdir}/ckpt_{mode}",
            mode=mode,
        )
        assert q.awaitTermination(180)
        tables[mode] = t

    want = {tuple(r) for r in tables["rewrite"].read(spark).collect()}
    got = {tuple(r) for r in tables["dv"].read(spark).collect()}
    assert got == want

    dv = tables["dv"]
    man = M.read_manifest(dv.path)
    first = set(M.read_manifest(dv.path, dv.commits()[0]).files)
    assert first <= set(man.files), "dv stream must never rewrite"
    assert dv.count_rows_metadata() == len(want)
    dv.optimize(spark)
    assert M.read_manifest(dv.path).dvs == {}
    assert {tuple(r) for r in dv.read(spark).collect()} == want
