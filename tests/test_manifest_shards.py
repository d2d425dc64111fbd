"""Manifest v2: parquet metadata shards with cross-commit reuse.

The scale property under test (VERDICT r5 "What's missing" #1): commit
metadata must be O(delta), not O(table files) — a partition-scoped
upsert on a ~800k-file table may not re-serialize every file's entry.
Here that is asserted LITERALLY: the untouched partitions' shard files
are byte-identical reused references, only the touched partition gets a
new shard, and a rollback writes zero shard bytes at all.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table import manifest as M


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "id int, day string, v int, ts timestamp"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))


def _mk(spark, path, days=("a", "b", "c"), per=4) -> KeyedTable:
    t = KeyedTable(path, key="id", precombine="ts", partition_by="day",
                   stats_cols=["v"])
    rows = [
        (d * per + i, day, d * per + i, None)
        for d, day in enumerate(days)
        for i in range(per)
    ]
    t.bulk_insert(_batch(spark, rows))
    return t


def _shards(t: KeyedTable, cid=None) -> list[str]:
    return M.read_manifest(t.path, cid).shards


def test_upsert_reuses_untouched_partition_shards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    s1 = set(_shards(t))
    assert s1, "bulk_insert must publish a sharded manifest"
    # every shard of a fresh table belongs to one partition dir
    t.upsert(_batch(spark, [(0, "a", 100, None)]))
    man = M.read_manifest(t.path)
    s2 = set(man.shards)
    reused = s1 & s2
    fresh = s2 - s1
    # b's and c's shards reused verbatim; only a's slice was rewritten
    reused_files = set()
    for s in reused:
        reused_files |= M.shard_file_set(t.path, s)
    assert reused, "untouched partitions must keep their shards"
    assert all(M.partition_of(f) in ("day=b", "day=c") for f in reused_files)
    assert fresh and all(s.startswith(man.commit_id) for s in fresh)
    # and the snapshot is still exactly right
    got = {
        (r.id, r.v) for r in t.read(spark).select("id", "v").collect()
    }
    assert (0, 100) in got and len(got) == 12


def test_commit_json_is_o_delta(spark, tmp_path):
    """The commit JSON names shards; it does NOT inline the file list,
    so its size is independent of table file count."""
    t = _mk(spark, str(tmp_path / "t"))
    t.upsert(_batch(spark, [(0, "a", 100, None)]))
    raw = json.loads(
        open(os.path.join(M.commits_dir(t.path), t.commits()[-1] + ".json")).read()
    )
    assert "files" not in raw and "file_stats" not in raw
    assert raw["shards"] and raw["n_files"] == len(M.read_manifest(t.path).files)


def test_rollback_writes_zero_shards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    c1 = t.commits()[-1]
    t.upsert(_batch(spark, [(0, "a", 100, None)]))
    mdir = M.manifests_dir(t.path)
    before = set(os.listdir(mdir))
    t.rollback(c1)
    assert set(os.listdir(mdir)) == before, "rollback must be metadata-only"
    assert set(_shards(t)) == set(_shards(t, c1))
    assert {r.v for r in t.read(spark).collect()} == set(range(12))


def test_vectorized_pruning_matches_dict_walk(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    man = M.read_manifest(t.path)
    for lo, hi in [(0, 3), (4, 7), (0, 11), (100, 200), (-5, -1)]:
        fast = t.files_in_range("v", lo, hi)
        slow = sorted(
            f
            for f in man.files
            if (st := man.file_stats.get(f, {}).get("v")) is None
            or not (st[1] < lo or st[0] > hi)
        )
        assert fast == slow, (lo, hi)
        # pruned read still returns exactly the semantic rows
        got = {r.v for r in t.read_range(spark, "v", lo, hi).collect()}
        assert got == {v for v in range(12) if lo <= v <= hi}
    assert set(t.files_isin("v", [0, 11])) == set(
        t.files_in_range("v", 0, 0)
    ) | set(t.files_in_range("v", 11, 11))


def test_int64_stats_survive_exactly(spark, tmp_path):
    """Typed shard slots: int64 stats round-trip without double
    rounding (the 2^53 hazard), and pruning on them stays correct."""
    big = 2**60
    t = KeyedTable(str(tmp_path / "t"), key="id", precombine="v",
                   stats_cols=["v"])
    t.bulk_insert(
        spark.createDataFrame([(1, big), (2, big + 3)], "id int, v long")
    )
    st = M.read_manifest(t.path).file_stats
    mins = [s["v"][0] for s in st.values() if "v" in s]
    maxs = [s["v"][1] for s in st.values() if "v" in s]
    assert min(mins) == big and max(maxs) == big + 3
    assert all(isinstance(v, int) for v in mins + maxs)
    assert t.files_in_range("v", big + 1, big + 2)  # inside → kept
    got = {r.id for r in t.read_range(spark, "v", big + 3, big + 9).collect()}
    assert got == {2}


def test_clean_gcs_unreferenced_shards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(3):
        t.upsert(_batch(spark, [(0, "a", 100 + i, None)]))
    mdir = M.manifests_dir(t.path)
    # plant an orphan (crashed-commit residue)
    orphan = os.path.join(mdir, "99999999-0000.parquet")
    open(orphan, "wb").close()
    t.clean(retain_commits=1)
    left = set(os.listdir(mdir))
    assert left == set(_shards(t))
    assert "99999999-0000.parquet" not in left
    assert t.validate() == []


def test_v1_inline_manifest_still_reads_and_migrates(spark, tmp_path):
    """A legacy table whose manifest inlines files/file_stats (round-5
    format) reads fine, and the FIRST v2 commit carries its per-file
    stats into shards instead of dropping them."""
    t = _mk(spark, str(tmp_path / "t"))
    # rewrite the published manifest into v1 inline form
    man = M.read_manifest(t.path)
    raw = {
        "commit_id": man.commit_id,
        "op": man.op,
        "ts": man.ts,
        "files": man.files,
        "schema_json": man.schema_json,
        "stats": man.stats,
        "file_stats": man.file_stats,
    }
    os.unlink(os.path.join(M.commits_dir(t.path), man.commit_id + ".json"))
    with open(
        os.path.join(M.commits_dir(t.path), man.commit_id + ".json"), "w"
    ) as f:
        json.dump(raw, f)
    for s in man.shards:
        os.unlink(os.path.join(M.manifests_dir(t.path), s))
    t2 = KeyedTable.load(t.path)
    assert {r.v for r in t2.read(spark).collect()} == set(range(12))
    # v1 pruning path (no shards) still works
    assert len(t2.files_in_range("v", 0, 3)) < len(man.files)
    # migrating commit: shards appear, carried stats preserved
    t2.upsert(_batch(spark, [(0, "a", 100, None)]))
    man2 = M.read_manifest(t.path)
    assert man2.shards
    carried = [f for f in man2.files if M.partition_of(f) != "day=a"]
    assert carried and all("v" in man2.file_stats[f] for f in carried)


def test_shard_compaction_bounds_total(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(M, "MAX_TOTAL_SHARDS", 6)
    t = _mk(spark, str(tmp_path / "t"))
    for i in range(10):
        t.upsert(_batch(spark, [(i % 12, "abc"[i % 3], 200 + i, None)]))
    assert len(_shards(t)) <= 6 + M.MAX_DELTA_SHARDS
    assert t.validate() == [] or all(
        "orphan" in p for p in t.validate()
    ), t.validate()
    # post-compaction correctness: snapshot and pruning intact
    vals = {r.v for r in t.read(spark).collect()}
    assert len(vals) == 12


def test_incremental_read_uses_shard_diff(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    c1 = t.commits()[-1]
    t.upsert(_batch(spark, [(0, "a", 100, None), (20, "c", 20, None)]))
    inc = t.read_incremental(spark, c1)
    got = {(r.id, r.v) for r in inc.select("id", "v").collect()}
    # rewritten partitions a and c land fully in the incremental read
    assert (0, 100) in got and (20, 20) in got
    assert all(day in ("a", "c") for (_, day) in
               [(r.id, r.day) for r in inc.collect()] for day in ())  # shape
    assert {r.day for r in inc.collect()} == {"a", "c"}


def test_metadata_row_counts_and_aggregates(spark, tmp_path):
    """Per-file row counts ride in the shards; COUNT(*)/MIN/MAX answer
    from metadata alone and track every mutation exactly."""
    t = _mk(spark, str(tmp_path / "t"))
    assert t.count_rows_metadata() == 12
    assert t.minmax_metadata("v") == (0, 11)
    # upsert: 1 update (no count change) + 1 insert
    t.upsert(_batch(spark, [(0, "a", 100, None), (50, "b", 50, None)]))
    assert t.count_rows_metadata() == 13
    assert t.minmax_metadata("v") == (1, 100)
    # delete two keys
    t.delete(spark.createDataFrame([(0,), (50,)], "id int"))
    assert t.count_rows_metadata() == 11
    # counts survive shard reuse + time travel
    assert t.count_rows_metadata(at=t.commits()[0]) == 12
    # and agree with the engine
    assert t.read(spark).count() == 11


def test_legacy_shards_without_rows_still_read(spark, tmp_path):
    """Shards written before row counts (no 'rows' column) null-fill on
    load; total_rows() reports None instead of undercounting."""
    import pyarrow.parquet as pq

    t = _mk(spark, str(tmp_path / "t"))
    mdir = M.manifests_dir(t.path)
    for s in _shards(t):
        p = os.path.join(mdir, s)
        tab = pq.read_table(p)
        pq.write_table(tab.drop_columns(["rows"]), p)
    M._SHARD_CACHE.clear()
    man = M.read_manifest(t.path)
    assert man.total_rows() is None
    assert t.count_rows_metadata() is None
    assert t.minmax_metadata("v") == (0, 11)  # stats unaffected
    assert {r.v for r in t.read(spark).collect()} == set(range(12))
    # the next commit re-records counts for its delta only
    t.upsert(_batch(spark, [(0, "a", 100, None)]))
    assert t.count_rows_metadata() is None  # carried files still lack counts
    fr = M.read_manifest(t.path).file_rows
    assert fr and all(v > 0 for v in fr.values())


def test_drop_partitions_metadata_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    man0 = M.read_manifest(t.path)
    ddir = M.data_dir(t.path)
    files_on_disk = set()
    for dp, _dn, fs in os.walk(ddir):
        files_on_disk |= {os.path.join(dp, f) for f in fs}
    t.drop_partitions(["day=b"])
    man1 = M.read_manifest(t.path)
    # no data file touched; nothing new written anywhere
    after = set()
    for dp, _dn, fs in os.walk(ddir):
        after |= {os.path.join(dp, f) for f in fs}
    assert after == files_on_disk
    assert man1.files == [
        f for f in man0.files if M.partition_of(f) != "day=b"
    ]
    assert {r.day for r in t.read(spark).collect()} == {"a", "c"}
    # counts track the drop; time travel still sees the full table
    assert t.count_rows_metadata() == 8
    assert t.read(spark, at=man0.commit_id).count() == 12
    # bytes reclaimed only by clean()
    t.clean(retain_commits=1)
    assert t.validate() == []
    assert not any("day=b" in f for f in M.read_manifest(t.path).files)
    with pytest.raises(ValueError, match="unknown partition"):
        t.drop_partitions(["day=zz"])


import pytest


@pytest.mark.parametrize("seed", [20260814, 777])
def test_shard_protocol_invariants_random_ops(spark, tmp_path, seed):
    """Property check over randomized op sequences: after ANY mix of
    upsert / delete / insert_overwrite / rollback / optimize / clean,
    every retained snapshot's shards form a DISJOINT EXACT COVER of its
    file list, metadata row counts equal real counts, and the snapshot
    equals a model replay. (Driven by hypothesis via explicit examples
    + a seeded random walk: each Spark commit costs ~1s, so the walk is
    short but adversarial — rollbacks interleave with partition-scoped
    rewrites, the shapes that break shard reuse if anything does.)"""
    import random

    rng = random.Random(seed)
    t = _mk(spark, str(tmp_path / "p"))
    model = {i: i for i in range(12)}  # id -> v
    days = "abc"

    def day_of(i: int) -> str:
        # must match _mk's layout (ids 0-3→a, 4-7→b, 8-11→c) and stay
        # stable for new ids: insert_overwrite is PARTITION-level
        # replace (no global key matching — Hudi parity), so the model
        # keyed by id is only valid while ids never switch partitions
        return days[(i // 4) % 3]

    snapshots = {t.commits()[-1]: dict(model)}

    def check():
        man = M.read_manifest(t.path)
        seen: set[str] = set()
        for s in man.shards:
            fs = M.shard_file_set(t.path, s)
            assert not (fs & seen), "shards overlap"
            seen |= fs
        assert seen == set(man.files), "shards != file list"
        assert man.total_rows() == len(model)
        got = {r.id: r.v for r in t.read(spark).collect()}
        assert got == model

    for step in range(16):
        op = rng.choice(["upsert", "delete", "overwrite", "rollback",
                         "optimize", "clean", "upsert", "upsert",
                         "savepoint", "half_clean"])
        if op == "upsert":
            ids = rng.sample(range(16), rng.randint(1, 3))
            rows = [(i, day_of(i), 100 * step + i, None) for i in ids]
            t.upsert(_batch(spark, rows))
            for i, d, v, _ in rows:
                model[i] = v
        elif op == "delete" and model:
            ids = rng.sample(sorted(model), min(2, len(model)))
            t.delete(spark.createDataFrame([(i,) for i in ids], "id int"))
            for i in ids:
                del model[i]
        elif op == "overwrite":
            day = rng.choice(days)
            ids = [i for i in range(16) if day_of(i) == day][:3]
            rows = [(i, day, 1000 + i, None) for i in ids]
            t.insert_overwrite(_batch(spark, rows))
            for i in [i for i in list(model) if day_of(i) == day]:
                del model[i]
            for i, d, v, _ in rows:
                model[i] = v
        elif op == "rollback" and snapshots:
            cid = rng.choice(sorted(snapshots))
            t.rollback(cid)
            model = dict(snapshots[cid])
        elif op == "optimize":
            t.optimize(spark, target_file_mb=128)
        elif op == "clean":
            t.clean(retain_commits=3)
            snapshots = {
                c: m for c, m in snapshots.items() if c in t.commits()
            }
        elif op == "savepoint":
            t.savepoint(rng.choice(t.commits()))
        elif op == "half_clean":
            # crash-interrupted clean: publish the plan, DON'T execute.
            # Readers/writers must stay correct with the plan pending
            # (reuse refusal + later ops), and a subsequent "clean" op
            # resumes it re-entrantly.
            plan = t._plan_clean(retain_commits=3, orphan_grace_s=0.0)
            if plan is not None:
                M.write_clean_plan(t.path, plan)
        head = t.commits()[-1]
        snapshots[head] = dict(model)
        check()
    # settle any pending half-executed clean, then final audit
    M.clear_clean_plan(t.path)
    t.clean(retain_commits=len(t.commits()))
    assert t.validate() == [] or all("orphan" in p for p in t.validate())


def test_partitions_metadata_table(spark, tmp_path):
    """partitions_df: per-partition file/row rollup straight from the
    manifest shards, tracking mutations, with zero data-file I/O."""
    t = _mk(spark, str(tmp_path / "t"))
    got = {
        r.partition: (r.n_files, r.n_rows)
        for r in t.partitions_df(spark).collect()
    }
    assert set(got) == {"day=a", "day=b", "day=c"}
    assert sum(v[1] for v in got.values()) == 12
    t.upsert(_batch(spark, [(50, "b", 50, None)]))
    got2 = {r.partition: r.n_rows for r in t.partitions_df(spark).collect()}
    assert got2["day=b"] == 5 and got2["day=a"] == 4
    # metadata-only: the plan reads shards, not data
    meta = t.partitions_df(spark)
    assert all(f"{os.sep}_manifests{os.sep}" in p for p in meta.inputFiles())


def test_key_blooms_ride_manifest_shards(spark, tmp_path):
    """Key blooms fold into the manifest shards (Hudi footer-bloom
    idiom, §9 item 1): a point lookup probes one columnar metadata
    load — deleting every sidecar must not change the pruned file set
    — and carried-forward files keep their bloom bytes through shard
    recovery on later commits."""
    t = KeyedTable(
        str(tmp_path / "b"), key="id", precombine="ts", partition_by="day",
        stats_cols=["v"], key_bloom=True,
    )
    rows = [(d * 4 + i, day, d * 4 + i, None)
            for d, day in enumerate("abc") for i in range(4)]
    t.bulk_insert(_batch(spark, rows))
    with_sidecars = t.files_with_keys([5])
    assert len(with_sidecars) < len(M.read_manifest(t.path).files)

    # nuke every sidecar: the manifest blooms alone must prune the same
    ddir = M.data_dir(t.path)
    n_side = 0
    for dp, _dn, fs in os.walk(ddir):
        for fn in fs:
            if fn.endswith(".bloom"):
                os.unlink(os.path.join(dp, fn))
                n_side += 1
    assert n_side > 0
    t2 = KeyedTable.load(t.path)  # fresh instance: no sidecar cache
    assert t2.files_with_keys([5]) == with_sidecars
    got = {r.id for r in t2.read_keys(spark, [5]).collect()}
    assert got == {5}

    # an upsert breaks day=a's shard; survivors' blooms recover into
    # the delta shard and still prune
    t2.upsert(_batch(spark, [(0, "a", 100, None)]))
    man = M.read_manifest(t.path)
    fb = man.file_blooms
    carried = [f for f in man.files if M.partition_of(f) != "day=a"]
    assert carried and all(f in fb for f in carried)
    keep = t2.files_with_keys([5])
    assert len(keep) < len(man.files)
    assert {r.id for r in t2.read_keys(spark, [5]).collect()} == {5}


def test_fast_shard_plan_matches_generic(spark, tmp_path, monkeypatch):
    """The O(delta) fast shard plan (producer-declared commit scope)
    must publish snapshots EQUIVALENT to the generic reuse path: same
    live files, same per-file stats/rows, same reads, validate()
    sound — only the shard layout may differ."""
    from pyspark.sql import Row

    from hudi_glue_spark.table import KeyedTable
    from hudi_glue_spark.table import manifest as M

    def build(root, fast: bool):
        if not fast:
            monkeypatch.setattr(M, "_fast_shards", lambda *a, **k: False)
        t = KeyedTable(
            str(root), key="id", precombine="ts", partition_by="grp",
            stats_cols=["ts", "v"],
        )
        import datetime
        ts = lambda d: datetime.datetime(2026, 4, d)  # noqa: E731
        t.bulk_insert(
            spark.createDataFrame(
                [Row(id=i, grp=f"g{i % 5}", v=float(i), ts=ts(1))
                 for i in range(100)]
            )
        )
        t.upsert(
            spark.createDataFrame(
                [Row(id=i, grp=f"g{i % 5}", v=float(i) + 0.5, ts=ts(2))
                 for i in range(0, 100, 10)]
            )
        )
        t.delete(spark.createDataFrame([Row(id=3), Row(id=7)]))
        t.drop_partitions(["grp=g4"])
        monkeypatch.undo()
        return t

    tf = build(tmp_path / "fast", fast=True)
    tg = build(tmp_path / "gen", fast=False)

    mf, mg = M.read_manifest(tf.path), M.read_manifest(tg.path)
    # same file COUNT and same per-file stats multiset (names differ by
    # random writer tokens, so compare stats keyed by partition+stats)
    assert mf.n_files == mg.n_files
    assert len(mf.files) == mf.n_files
    assert len(mg.files) == mg.n_files

    def stat_sig(man):
        out = []
        for f in man.files:
            st = man.file_stats.get(f, {})
            out.append(
                (M.partition_of(f), tuple(sorted(
                    (c, tuple(v)) for c, v in st.items()
                )), man.file_rows.get(f))
            )
        return sorted(out, key=str)

    assert stat_sig(mf) == stat_sig(mg)
    a = {(r.id, r.grp, r.v) for r in tf.read(spark).collect()}
    b = {(r.id, r.grp, r.v) for r in tg.read(spark).collect()}
    assert a == b
    assert tf.validate() == []
    # and pruning agrees between the two layouts
    assert sorted(
        M.partition_of(f) for f in tf.files_in_range("v", 50.0, 60.0)
    ) == sorted(
        M.partition_of(f) for f in tg.files_in_range("v", 50.0, 60.0)
    )


def test_file_bytes_in_shards(spark, tmp_path):
    """Per-file byte sizes ride the manifest shards: recorded at write
    time, carried through partition-scoped commits and shard recovery,
    and equal to the on-disk truth — so optimize()/compaction_report
    size-probe from metadata instead of per-file stat calls."""
    t = _mk(spark, str(tmp_path / "b"))
    man = M.read_manifest(t.path)
    fb = man.file_bytes
    assert set(fb) == set(man.files)
    ddir = M.data_dir(t.path)
    for f, b in fb.items():
        assert b == os.path.getsize(os.path.join(ddir, f)), f
    # survives a partition-scoped upsert (carried files keep bytes,
    # new files record theirs)
    t.upsert(_batch(spark, [(0, "a", 999, None)]))
    man2 = M.read_manifest(t.path)
    fb2 = man2.file_bytes
    assert set(fb2) == set(man2.files)
    for f, b in fb2.items():
        assert b == os.path.getsize(os.path.join(ddir, f)), f
