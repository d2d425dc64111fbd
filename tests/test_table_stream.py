"""The commit log as a Structured Streaming source
(streaming/table_source.py): per-commit deltas, offset resume from the
checkpoint, starting positions, DV semantics (history not rewritten),
and the retention error when an offset ages out of the log.

↦ Hudi incremental streaming read (query.type=incremental under
spark.readStream) — the consumption side of the reference's pipeline.
"""

from __future__ import annotations

import os
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


def test_stream_rows_mode_skips_layout_only_commits(spark):
    """rows mode skips _SILENT_OPS too (ADVICE r9): an optimize()
    rewrites every masked/small file, and re-emitting those rows would
    re-deliver up to the whole table to every consumer — Hudi's
    incremental query likewise excludes compaction output."""
    t = _mk(spark, "/tmp/ts_rows_silent", n=40)
    t.delete_dv([3])
    t.optimize(spark, target_file_mb=64, small_file_mb=64)
    t.upsert_dv(
        spark.createDataFrame(
            [(500, "0", 1, -500)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain(spark, t, "ts_rows_silent")
    c0, _c1, c2, c3 = t.commits()
    per = {
        r["_commit"]: r["n"]
        for r in out.groupBy("_commit").agg(F.count("*").alias("n")).collect()
    }
    # bulk snapshot + the post-optimize upsert delta; the pure-mask
    # delete adds no files and the optimize is layout-only — neither
    # appears as a batch
    assert per == {c0: 40, c3: 1}
    assert c2 not in per


def _drain_cdf(spark, t, ck, **kw):
    from hudi_glue_spark.streaming.table_source import stream_changes as _sc

    shutil.rmtree(ck, ignore_errors=True)  # these tests never resume
    src = _sc(spark, t, mode="cdf", **kw)
    rows: list = []
    q = (
        src.writeStream.trigger(availableNow=True)
        .foreachBatch(lambda b, _bid: rows.extend(b.collect()))
        .option("checkpointLocation", ck)
        .start()
    )
    assert q.awaitTermination(240)
    return spark.createDataFrame(rows, src.schema)


def test_stream_cdf_retractions_and_silent_compaction(spark):
    """mode='cdf': DV DML streams exact delete/insert retraction
    pairs, optimize() is silent (compaction is not churn), a CoW
    rewrite streams coarse-but-correct pairs, and the maintained
    +insert/-delete aggregate equals the final snapshot."""
    t = _mk(spark, "/tmp/ts_cdf")
    t.update_where_dv(spark, {"val": "val + 1000"}, "pk < 3")
    t.delete_dv([50, 51])
    t.optimize(spark, target_file_mb=64, small_file_mb=64)  # folds masks
    t.upsert(
        spark.createDataFrame(
            [(99, "3", 9000, -1)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain_cdf(spark, t, "/tmp/ts_cdf_ck2")
    c1, c2, c3, c4, _c5 = t.commits()
    per = {
        (r["_commit"], r["_change_type"]): r["n"]
        for r in out.groupBy("_commit", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per[(c1, "insert")] == 100
    assert per[(c2, "delete")] == 3 and per[(c2, "insert")] == 3
    assert per[(c3, "delete")] == 2
    assert not any(cid == c4 for cid, _k in per)  # optimize: SILENT
    # update pre/post images carry the actual old/new values
    pre = {r.pk: r.val for r in out.filter(
        f"_commit = '{c2}' and _change_type = 'delete'").collect()}
    post = {r.pk: r.val for r in out.filter(
        f"_commit = '{c2}' and _change_type = 'insert'").collect()}
    assert pre == {0: 0, 1: 2, 2: 4}
    assert post == {0: 1000, 1: 1002, 2: 1004}
    # maintained aggregate == final snapshot
    net = out.selectExpr(
        "sum(case when _change_type='insert' then 1 else -1 end)"
    ).first()[0]
    s = out.selectExpr(
        "sum(case when _change_type='insert' then val else -val end)"
    ).first()[0]
    assert net == t.read(spark).count() == 98
    assert s == t.read(spark).selectExpr("sum(val)").first()[0]


def test_stream_cdf_exact_cow_rewrite_under_cap(spark):
    """VERDICT r9 #6: a CoW rewrite commit under the exact-CDF gate
    streams exactly its TRUE row delta (one delete + one insert for a
    1-row upsert into a rewritten partition), not the coarse
    whole-partition pairs; over the gate the documented coarse
    contract remains, and both net identically."""
    t = _mk(spark, "/tmp/ts_cdf_exact", n=40)
    t.upsert(
        spark.createDataFrame(
            [(0, "0", 9000, -99)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain_cdf(spark, t, "/tmp/ts_cdf_exact_ck")
    _c0, c1 = t.commits()
    got = {
        (r._change_type, r.pk, r.part, r.ts, r.val)
        for r in out.filter(F.col("_commit") == c1).collect()
    }
    assert got == {
        ("delete", 0, "0", 0, 0),
        ("insert", 0, "0", 9000, -99),
    }
    # coarse twin: same commit over a zeroed byte gate streams the
    # whole rewritten partition both ways, netting the same delta
    # (the gate travels as a READER OPTION — the planner runs in
    # Spark's Python DS worker, out of monkeypatch reach)
    out2 = _drain_cdf(
        spark, t, "/tmp/ts_cdf_exact_ck2", exact_rewrite_max_bytes=0
    )
    per = {
        r["_change_type"]: r["n"]
        for r in out2.filter(F.col("_commit") == c1)
        .groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per == {"delete": 10, "insert": 10}
    for df in (out, out2):
        net = df.selectExpr(
            "sum(case when _change_type='insert' then val else -val end)"
        ).first()[0]
        assert net == t.read(spark).selectExpr("sum(val)").first()[0]


def test_stream_cdf_exact_rewrite_multiset_duplicates(spark):
    """The exact rewrite diff is a MULTISET diff: duplicate identical
    rows (bulk_insert dedupe=False) drop/add by instance count, and
    NULLs never alias real values in the row keys."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT

    root = "/tmp/ts_cdf_multiset"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part")
    rows = [
        (1, "0", 1, 5),
        (1, "0", 1, 5),  # identical duplicate
        (2, "0", 1, None),  # NULL val
        (3, "0", 1, 7),
    ]
    t.bulk_insert(
        spark.createDataFrame(
            rows, "pk long, part string, ts long, val long"
        ),
        dedupe=False,
    )
    # rewrite the partition: pk=3 updated; the merge collapses the
    # pk=1 duplicates (window dedup), so the old side holds TWO
    # identical (1,5) rows and the new side ONE — a multiset diff
    # emits exactly one delete for it (a set diff would emit zero);
    # the NULL-val row is untouched and must emit nothing
    t.upsert(
        spark.createDataFrame(
            [(3, "0", 2, 8)], "pk long, part string, ts long, val long"
        )
    )
    out = _drain_cdf(spark, t, root + "_ck")
    c1 = t.commits()[-1]
    got = sorted(
        (r._change_type, r.pk, r.val if r.val is not None else -1)
        for r in out.filter(F.col("_commit") == c1).collect()
    )
    assert got == [
        ("delete", 1, 5),
        ("delete", 3, 7),
        ("insert", 3, 8),
    ]


def test_stream_cdf_exact_rewrite_separator_injective(spark):
    """ADVICE r10 (medium): the old rewrite-diff key joined columns
    with '\\x01', so old row ('a\\x01v\\x01b','c') and new row
    ('a','b\\x01v\\x01c') produced IDENTICAL keys and the change
    streamed as nothing. Row keys are now per-column tuples — no
    cross-column concatenation exists to be ambiguous."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT

    root = "/tmp/ts_cdf_sep"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part")
    sep = "\x01"
    t.bulk_insert(
        spark.createDataFrame(
            [
                (1, "0", 1, f"a{sep}v{sep}b", "c"),
                (2, "0", 1, "plain", "row"),
            ],
            "pk long, part string, ts long, s1 string, s2 string",
        )
    )
    # the crafted aliasing pair from the advisory repro
    t.upsert(
        spark.createDataFrame(
            [(1, "0", 2, "a", f"b{sep}v{sep}c")],
            "pk long, part string, ts long, s1 string, s2 string",
        )
    )
    out = _drain_cdf(spark, t, root + "_ck")
    c1 = t.commits()[-1]
    got = sorted(
        (r._change_type, r.pk, r.s1, r.s2)
        for r in out.filter(F.col("_commit") == c1).collect()
    )
    assert got == [
        ("delete", 1, f"a{sep}v{sep}b", "c"),
        ("insert", 1, "a", f"b{sep}v{sep}c"),
    ]  # pk=2 untouched → emits nothing; pk=1's change MUST stream


def test_stream_cdf_exact_rewrite_nested_binary_schema(spark):
    """§9e#1: embeddings (array<double>), struct metadata and binary
    payloads now qualify for the exact rewrite gate — a 1-row upsert
    into a rewritten partition streams exactly one delete + one
    insert, untouched rows (including one whose embedding holds a
    NaN) emit nothing, and the streamed pre/post images carry the
    real nested values."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT

    root = "/tmp/ts_cdf_nested"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part")
    sch = (
        "pk long, part string, ts long, emb array<double>, "
        "payload binary, meta struct<w:int,h:int>"
    )
    nan = float("nan")
    t.bulk_insert(
        spark.createDataFrame(
            [
                (1, "0", 1, [1.0, 2.0], b"\x00\x01", (3, 4)),
                (2, "0", 1, [nan, 0.5], b"\xff", (7, 8)),  # NaN: stable
                (3, "0", 1, None, None, None),  # all-NULL nested row
            ],
            sch,
        )
    )
    t.upsert(
        spark.createDataFrame(
            [(1, "0", 2, [9.0, 9.5], b"\x02", (5, 6))], sch
        )
    )
    out = _drain_cdf(spark, t, root + "_ck")
    c1 = t.commits()[-1]
    rows = sorted(
        out.filter(F.col("_commit") == c1).collect(),
        key=lambda r: r._change_type,
    )
    assert [(r._change_type, r.pk) for r in rows] == [
        ("delete", 1),
        ("insert", 1),
    ]  # exact: NaN row and NULL row are untouched → silent
    dele, ins = rows
    assert list(dele.emb) == [1.0, 2.0] and bytes(dele.payload) == b"\x00\x01"
    assert dele.meta.w == 3 and dele.meta.h == 4
    assert list(ins.emb) == [9.0, 9.5] and bytes(ins.payload) == b"\x02"
    assert (ins.meta.w, ins.meta.h) == (5, 6)


def test_stream_cdf_write_time_change_log_any_size(spark):
    """r11 change_log tables (Delta CDC-file parity): every CoW
    rewrite op records its exact logical delta at WRITE time, and the
    CDF stream serves it regardless of rewrite size — here the
    size gate is zeroed (reader option), so without the log these
    commits would stream the coarse whole-partition pairs. upsert,
    update_where, delete, and merge_into each stream their true
    row-level delta; the maintained aggregate equals the snapshot."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_cdf_chlog"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    t.bulk_insert(
        spark.range(0, 40).select(
            F.col("id").alias("pk"),
            (F.col("id") % 4).cast("string").alias("part"),
            F.col("id").alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
    )
    t.upsert(
        spark.createDataFrame(
            [(0, "0", 9000, -99)], "pk long, part string, ts long, val long"
        )
    )
    t.update_where(spark, {"val": "val + 1000"}, "pk IN (1, 2)")
    t.delete(spark.createDataFrame([(3,)], "pk long"))
    t.merge_into(
        spark.createDataFrame(
            [(4, "0", 9100, -4), (100, "0", 9100, 200)],
            "pk long, part string, ts long, val long",
        )
    )
    # partition refresh: part "1" recomputed with ONE value changed
    # and ONE row dropped — the overwrite delta must be exactly those
    ow = (
        t.read(spark)
        .filter("part = '1' AND pk <> 37")
        .withColumn(
            "val",
            F.when(F.col("pk") == 5, F.lit(-55)).otherwise(F.col("val")),
        )
    )
    t.insert_overwrite(ow, dedupe=False)
    # every rewrite commit recorded its delta
    for cid in t.commits()[1:]:
        assert ((M.read_manifest(root, cid).stats or {})
                .get("change_log") or {}).get("ref"), cid
    out = _drain_cdf(
        spark, t, root + "_ck", exact_rewrite_max_bytes=0
    )
    _c0, c1, c2, c3, c4, c5 = t.commits()
    got = {
        cid: sorted(
            (r._change_type, r.pk, r.val)
            for r in out.filter(F.col("_commit") == cid).collect()
        )
        for cid in (c1, c2, c3, c4, c5)
    }
    assert got[c1] == [("delete", 0, 0), ("insert", 0, -99)]
    assert got[c2] == [
        ("delete", 1, 2), ("delete", 2, 4),
        ("insert", 1, 1002), ("insert", 2, 1004),
    ]
    assert got[c3] == [("delete", 3, 6)]
    assert got[c4] == [
        ("delete", 4, 8), ("insert", 4, -4), ("insert", 100, 200),
    ]
    assert got[c5] == [
        ("delete", 5, 10), ("delete", 37, 74), ("insert", 5, -55),
    ]  # a 10-row partition refresh streams its TRUE 3-row delta
    net = out.selectExpr(
        "sum(case when _change_type='insert' then 1 else -1 end)"
    ).first()[0]
    s = out.selectExpr(
        "sum(case when _change_type='insert' then val else -val end)"
    ).first()[0]
    assert net == t.read(spark).count() == 39
    assert s == t.read(spark).selectExpr("sum(val)").first()[0]
    # clean() sweeps an aged ORPHAN token but keeps live refs
    ch = os.path.join(root, "_changes")
    orphan = os.path.join(ch, "deadbeef00000000")
    os.makedirs(orphan)
    os.utime(orphan, (os.path.getmtime(orphan) - 3600,) * 2)
    live_before = {
        ((M.read_manifest(root, cid).stats or {})
         .get("change_log") or {}).get("ref")
        for cid in t.commits()
    } - {None}
    t.clean(retain_commits=50)
    assert not os.path.isdir(orphan)
    assert live_before <= set(os.listdir(ch))


def test_change_log_skips_table_sized_delta(spark):
    """§9h#1: a rewrite whose recorded delta would approach the
    coarse stream volume (everything changed — here a partition
    refresh replacing every value) records NO log: the coarse
    contract nets the same rows, and the log would only double the
    op's write amplification. A small refresh still logs."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_chlog_cap"
    _sh.rmtree(root, ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    t.bulk_insert(
        spark.range(0, 30).select(
            F.col("id").alias("pk"),
            (F.col("id") % 3).cast("string").alias("part"),
            F.col("id").alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
    )
    # every row of part 0 changes → delta = 2x written rows → skip
    t.insert_overwrite(
        t.read(spark).filter("part = '0'")
        .withColumn("val", F.col("val") + 1),
        dedupe=False,
    )
    assert "change_log" not in (
        M.read_manifest(root, t.commits()[-1]).stats or {}
    )
    # one row of part 1 changes → tiny delta → logged
    t.insert_overwrite(
        t.read(spark).filter("part = '1'")
        .withColumn(
            "val",
            F.when(F.col("pk") == 1, F.lit(-1)).otherwise(F.col("val")),
        ),
        dedupe=False,
    )
    assert ((M.read_manifest(root, t.commits()[-1]).stats or {})
            .get("change_log") or {}).get("ref")
    # both commits still stream to the correct net state
    out = _drain_cdf(spark, t, root + "_ck")
    net = out.selectExpr(
        "sum(case when _change_type='insert' then val else -val end)"
    ).first()[0]
    assert net == t.read(spark).selectExpr("sum(val)").first()[0]
    # r13 (ADVICE r12): the capped delta's staged dir is reclaimed
    # IMMEDIATELY by the writer, not left for clean()'s aged sweep —
    # every surviving _changes token is referenced by a commit
    refs = {
        ((M.read_manifest(root, cid).stats or {})
         .get("change_log") or {}).get("ref")
        for cid in t.commits()
    } - {None}
    ch = os.path.join(root, "_changes")
    assert set(os.listdir(ch)) <= refs if os.path.isdir(ch) else True


def test_change_log_midflight_failure_leaves_no_orphan(spark, monkeypatch):
    """r13 (ADVICE r12): an exception AFTER the delta parquet lands
    (here: the footer count) must not fail the op NOR leak the staged
    ``_changes/<token>`` dir — the finally-path rmtrees it and the
    commit publishes refless (coarse contract)."""
    import shutil as _sh

    import pyarrow.dataset as pds

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_chlog_midfail"
    _sh.rmtree(root, ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    t.bulk_insert(
        spark.range(0, 20).select(
            F.col("id").alias("pk"),
            (F.col("id") % 2).cast("string").alias("part"),
            F.col("id").alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
    )
    real = pds.dataset

    def boom(src, *a, **k):
        if isinstance(src, str) and "_changes" in src:
            raise RuntimeError("post-write failure")
        return real(src, *a, **k)

    monkeypatch.setattr(pds, "dataset", boom)
    t.upsert(
        spark.createDataFrame(
            [(1, "1", 100, -5)], "pk long, part string, ts long, val long"
        )
    )
    monkeypatch.undo()
    stats = M.read_manifest(root, t.commits()[-1]).stats or {}
    assert "change_log" not in stats  # refless, op survived
    ch = os.path.join(root, "_changes")
    leftover = set(os.listdir(ch)) if os.path.isdir(ch) else set()
    refs = {
        ((M.read_manifest(root, cid).stats or {})
         .get("change_log") or {}).get("ref")
        for cid in t.commits()
    } - {None}
    assert leftover <= refs, f"orphaned staged delta: {leftover - refs}"


def test_stream_cdf_change_log_maps(spark):
    """Top-level map columns are LIFTED into the exact change log
    (r12): the delta job compares sorted ``map_entries`` twins —
    entry-order-insensitive, as map equality demands — and the stored
    delta carries real maps (``map_from_entries`` round trip). The
    stream serves the recorded delta with the map values intact."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_cdf_chlog_map"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    sch = "pk long, part string, ts long, v long, attrs map<string,long>"
    t.bulk_insert(
        spark.createDataFrame(
            [(1, "0", 1, 5, {"a": 1, "b": 2}), (2, "0", 1, 6, {"c": 3}),
             (3, "1", 1, 7, None)],
            sch,
        ),
        dedupe=False,  # precombine tie-break hashes all columns; maps
    )                  # are unhashable in Spark — dedup is off-path here
    # update that changes ONLY the map column: the delta must record it
    t.update_where(
        spark, {"attrs": "map('a', cast(9 as long))"}, "pk = 1"
    )
    ref = ((M.read_manifest(root, t.commits()[-1]).stats or {})
           .get("change_log") or {}).get("ref")
    assert ref, "top-level map schema must record an exact log"
    logged = spark.read.parquet(os.path.join(root, "_changes", ref))
    got = sorted(
        (r._change_type, r.pk, dict(r.attrs)) for r in logged.collect()
    )
    assert got == [
        ("delete", 1, {"a": 1, "b": 2}),
        ("insert", 1, {"a": 9}),
    ]
    # a rewrite that reorders map entries but changes nothing logical
    # records an EMPTY delta (canonicalization is order-insensitive)
    reordered = t.read(spark).filter("part = '0'").select(
        "pk", "part", "ts", "v",
        F.map_from_entries(
            F.reverse(F.map_entries(F.col("attrs")))
        ).alias("attrs"),
    )
    t.insert_overwrite(reordered, dedupe=False)
    ref2 = ((M.read_manifest(root, t.commits()[-1]).stats or {})
            .get("change_log") or {}).get("ref")
    assert ref2
    assert spark.read.parquet(
        os.path.join(root, "_changes", ref2)
    ).count() == 0
    # the stream serves the recorded deltas; net state == snapshot
    out = _drain_cdf(spark, t, root + "_ck", exact_rewrite_max_bytes=0)
    net = out.selectExpr(
        "sum(case when _change_type='insert' then 1 else -1 end)"
    ).first()[0]
    assert net == t.read(spark).count() == 3
    upd = sorted(
        ((r._change_type, dict(r.attrs))
         for r in out.filter(
             (F.col("pk") == 1) & (F.col("_commit") == t.commits()[1])
         ).collect()),
        key=lambda p: p[0],
    )
    assert upd == [("delete", {"a": 1, "b": 2}), ("insert", {"a": 9})]
    # diff_commits composes the map-bearing logs exactly (the
    # classifier compares maps through their canonical twin)
    d = t.diff_commits(spark, t.commits()[0])
    rows = sorted((r._change_type, r.pk) for r in d.collect())
    assert rows == [("update", 1)]


def test_stream_cdf_change_log_skips_nested_map_schema(spark):
    """A map NESTED inside a struct cannot be canonicalized without
    rebuilding the container — the table honestly records NO log, and
    (ADVICE r11) the WRITE ITSELF SUCCEEDS: exceptAll rejecting the
    schema must degrade to the coarse contract, never fail the op
    after its data files are staged."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_cdf_chlog_nmap"
    _sh.rmtree(root, ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    sch = ("pk long, part string, ts long, v long, "
           "meta struct<m: map<string,long>>")
    t.bulk_insert(
        spark.createDataFrame(
            [(1, "0", 1, 5, {"m": {"a": 1}})], sch
        ),
        dedupe=False,
    )
    t.update_where(spark, {"v": "v + 1"}, "pk = 1")  # must not raise
    assert "change_log" not in (
        M.read_manifest(root, t.commits()[-1]).stats or {}
    )
    assert t.read(spark).select("v").first()[0] == 6


def test_stream_cdf_folded_change_log_falls_back(spark):
    """After fold_change_logs, a commit whose recorded delta is gone
    plans through the exact-rewrite gate / coarse path instead of
    raising on the missing _changes dir — the maintained net state
    still equals the snapshot (coarse pairs net out)."""
    import shutil as _sh

    from hudi_glue_spark.table import KeyedTable as KT
    from hudi_glue_spark.table import manifest as M

    root = "/tmp/ts_cdf_chlog_fold"
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(root + "_ck", ignore_errors=True)
    t = KT(root, key="pk", precombine="ts", partition_by="part",
           change_log=True)
    t.bulk_insert(
        spark.range(0, 40).select(
            F.col("id").alias("pk"),
            (F.col("id") % 4).cast("string").alias("part"),
            F.col("id").alias("ts"),
            (F.col("id") * 2).alias("val"),
        )
    )
    t.upsert(spark.createDataFrame(
        [(0, "0", 9000, -99)], "pk long, part string, ts long, val long"
    ))
    t.delete(spark.createDataFrame([(3,)], "pk long"))
    assert len(t.fold_change_logs(keep_last=1)) == 1  # upsert's log goes
    out = _drain_cdf(spark, t, root + "_ck")
    net = out.selectExpr(
        "sum(case when _change_type='insert' then 1 else -1 end)"
    ).first()[0]
    s = out.selectExpr(
        "sum(case when _change_type='insert' then val else -val end)"
    ).first()[0]
    assert net == t.read(spark).count() == 39
    assert s == t.read(spark).selectExpr("sum(val)").first()[0]
    # the folded upsert commit still streamed its logical delta (via
    # the gate's exact rewrite diff at default caps)
    c1 = t.commits()[1]
    got = sorted(
        (r._change_type, r.pk, r.val)
        for r in out.filter(F.col("_commit") == c1).collect()
    )
    assert got == [("delete", 0, 0), ("insert", 0, -99)]


def test_stream_cdf_rollback_streams_inverse_delta(spark):
    """A rollback commit streams the INVERSE of what it undoes —
    including resurrection inserts for positions a DV delete had
    masked — so a CDF consumer's maintained state follows the table
    through the rollback."""
    t = _mk(spark, "/tmp/ts_cdf_rb")
    c0 = t.commits()[0]
    t.delete_dv([10, 11, 12])
    t.rollback(c0)
    out = _drain_cdf(spark, t, "/tmp/ts_cdf_rb_ck")
    rb = t.commits()[-1]
    kinds = {
        (r["_change_type"]): r["n"]
        for r in out.filter(F.col("_commit") == rb)
        .groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kinds == {"insert": 3}  # the three masked rows resurrect
    net = out.selectExpr(
        "sum(case when _change_type='insert' then 1 else -1 end)"
    ).first()[0]
    assert net == t.read(spark).count() == 100
