"""Long-horizon multi-writer soak (VERDICT r10 #6).

The per-round pytest walk (tests/test_lifecycle.py, seeds 7/23) caught
a three-round-old silent lost-update only after an unrelated change
widened the race window — interleaving coverage IS the walk's value.
This tool is the scaled tier: more seeds × more writers × more
batches, a randomized op mix that includes the r11 pinned-read paths
(read_isin / read_range / read_keys / lookup_join / diff_commits /
export / register) racing the writers, and a PER-SEED OP TRACE so the
next finding bisects fast (the r10 forensics had to be reconstructed
from commit stats).

    python tools/soak_walk.py                 # default tier: 5 seeds
    python tools/soak_walk.py --seeds 7 23    # reproduce one finding
    SOAK_TRACE_DIR=/tmp/soak python tools/soak_walk.py

Each seed runs: N writers (upsert_with_retry + randomized
update_where / delete / merge_into on the writer's OWN key range), a
DV writer (upsert_dv / delete_dv, whole-op retry), the composed
maintenance loop (run_maintenance), a CDF stream consumer summing
retraction deltas, and a READER thread hammering the pinned paths
mid-churn (every read must be internally consistent: unique keys,
values from the legal set, metadata count == snapshot count at the
SAME pinned commit). Quiesce asserts the serializable outcome; any
violation dumps the interleaved op trace as JSON and exits 1.

Zero-finding runs are the documented evidence in docs/SCALING.md
("Soak walk" section) — keep the numbers current when the tier grows.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class Trace:
    """Thread-safe append-only op log: (t, thread, op, outcome)."""

    def __init__(self):
        self._rows: list[dict] = []
        self._lock = threading.Lock()
        self._t0 = time.time()

    def add(self, who: str, op: str, outcome: str, **extra):
        with self._lock:
            self._rows.append(
                {
                    "t": round(time.time() - self._t0, 4),
                    "who": who,
                    "op": op,
                    "outcome": outcome,
                    **extra,
                }
            )

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self._rows, f, indent=1)

    def occ_retries(self) -> int:
        """Total lost-OCC-race retries the trace recorded — the direct
        contention measure SCALING.md reports per tier (r15)."""
        with self._lock:
            return sum(r.get("retries", 0) for r in self._rows)


def _assert_interleaved(tr: Trace, violations: list[str]) -> None:
    """The walk's value IS interleaving — a trace whose writer ops are
    perfectly grouped by thread means the threads ran back-to-back
    (the r14 guard bug), and the seed proved nothing. Writers emit
    multiple ops each; the odds of chance perfect grouping across
    3+ writers are negligible, so grouped == harness defect."""
    wrows = [r for r in tr._rows
             if r["who"] not in ("rd", "cdf") and r["op"] != "FATAL"]
    whos = [r["who"] for r in wrows]
    distinct = set(whos)
    if len(distinct) < 2 or len(whos) <= len(distinct):
        return  # too few ops to judge
    if any(r.get("retries") for r in wrows):
        return  # a lost OCC race IS a rival interleaving (a 2-writer
        # tier can group its SUCCESSES while contending hard)
    transitions = sum(1 for a, b in zip(whos, whos[1:]) if a != b)
    if transitions <= len(distinct) - 1:
        violations.append(
            f"no interleaving observed: {len(whos)} writer ops from "
            f"{len(distinct)} threads ran perfectly grouped with zero "
            f"OCC retries — harness concurrency is broken"
        )



def _retry(tr, t, who, op, fn, retries=60, **extra):
    """Run a commit closure through the ENGINE's retry loop
    (KeyedTable.retry_commit: jittered backoff + advisory-lease
    escalation after 8 straight losses — both added r15 after the
    long-horizon tier starved writers under pure immediate-retry
    OCC). The walk exercises the real multi-writer contract instead
    of a private loop; lost-race counts land in the trace."""
    lost = {"n": 0}

    def note(attempt: int) -> None:
        lost["n"] = attempt + 1

    t.retry_commit(fn, retries=retries, on_lost_race=note)
    tr.add(who, op, "ok", retries=lost["n"], **extra)


def run_seed(spark, seed: int, writers: int, batches: int,
             trace_dir: str) -> list[str]:
    """One soak run; returns a list of violations (empty = green)."""
    from pyspark.sql import Row

    from hudi_glue_spark.table import KeyedTable
    from hudi_glue_spark.table import manifest as M
    from hudi_glue_spark.table import record_index as RI

    # pack every registration: sidecar pointers ride every interleaving
    old_spill = RI.REG_SPILL_BYTES
    RI.REG_SPILL_BYTES = 0
    root = f"/tmp/soak_walk_{seed}"
    ck = root + "_ck"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    tr = Trace()
    errors: list[str] = []

    def _ts(day: int, b: int = 0) -> str:
        return f"2024-01-{day:02d}T{b:02d}:00:00"

    # odd seeds run with the write-time change log ON: every CoW op
    # records its delta under OCC rebases, retries, and clean() — and
    # the CDF consumer then drains "chlog" slices mid-churn, so
    # cdf_net == final count proves the recorded deltas exact over
    # whatever interleaving the seed produced. The same odd seeds
    # carry a LIVE MAP COLUMN through every writer (r12): the map
    # canonicalization in the delta job / classifier / precombine
    # hash must hold under multi-writer chaos, not just unit tests.
    # Odd seeds also FOLD change logs mid-walk (r13): retention must
    # degrade every consumer honestly while writers race.
    # EVEN seeds run key_scope='partition' with a SHADOW key family
    # living in TWO partitions (r13): scoped CoW + DV deletes kill one
    # partition's copy mid-churn and quiesce asserts the twin survives
    # untouched — the lost-update class the r10 walk caught, now under
    # the r12/r13 partition-scoped identity paths.
    maps = bool(seed % 2)
    pscope = not maps

    def mk_rows(items):
        """items: (id, grp, v, ts) tuples; attrs (top-level map) and
        meta (struct with a NESTED map — the r12 recursive-canon path)
        derive deterministically from the row so any writer's rewrite
        of a carried row preserves them byte-for-byte."""
        if maps:
            return spark.createDataFrame(
                [Row(id=i, grp=g, v=v, ts=ts,
                     attrs={"g": g, "b": str(v)},
                     meta=Row(m={"k": str(i % 4)}, s=g))
                 for i, g, v, ts in items],
                "id long, grp string, v double, ts string, "
                "attrs map<string,string>, "
                "meta struct<m:map<string,string>,s:string>",
            )
        return spark.createDataFrame(
            [Row(id=i, grp=g, v=v, ts=ts) for i, g, v, ts in items]
        )

    t0 = KeyedTable(
        root, key="id", precombine="ts", partition_by="grp",
        change_log=maps,
        key_scope="partition" if pscope else "global",
    )
    seed_rows = [(i, f"g{i % 3}", 0.0, _ts(1)) for i in range(60)]
    if pscope:
        # shadow family: each id holds an INDEPENDENT row in g0 and g1
        seed_rows += [(40000 + j, g, 123.0, _ts(1))
                      for j in range(5) for g in ("g0", "g1")]
    t0.bulk_insert(mk_rows(seed_rows))
    t0.build_record_index(spark)

    def guard(who, fn):
        # returns a ZERO-ARG thunk for Thread(target=...). The r10-r13
        # shape — guard(who)(fn) — executed fn EAGERLY at Thread
        # construction and handed Thread a None target, so every prior
        # walk of THIS TOOL ran its "concurrent" ops sequentially
        # (found r14 when the new wipe tier's trace showed perfect
        # per-thread ordering; the pytest walk in test_lifecycle.py
        # passes real targets and was never affected). The
        # _assert_interleaved() check on every tier's trace keeps the
        # tool honest against any future regression of this class.
        def wrap():
            try:
                fn()
            except Exception:  # noqa: BLE001
                import traceback

                tr.add(who, "FATAL", traceback.format_exc())
                errors.append(f"{who}: {traceback.format_exc()}")
        return wrap

    def writer(w: int):
        rng = random.Random(1000 * seed + w)
        t = KeyedTable.load(root)
        base_id = 1000 * (w + 1)
        for b in range(batches):
            batch = mk_rows(
                [(base_id + i, f"g{i % 3}", float(b), _ts(2, b))
                 for i in range(15)]
            )
            _retry(tr, t, f"w{w}", "upsert",
                   lambda: t.upsert(batch), retries=60, batch=b)
            # randomized own-range predicate DML between batches —
            # update_where/delete rewrite partitions under OCC and
            # must never disturb other writers' rows
            roll = rng.random()
            if roll < 0.25:
                _retry(tr, t, f"w{w}", "update_where",
                       lambda: t.update_where(
                           spark, {"v": "v + 0.0"},
                           f"id = {base_id}",  # no-op value, real rewrite
                       ), retries=30)
            elif roll < 0.4:
                victim = base_id + 14  # re-upserted next batch
                if pscope and rng.random() < 0.5:
                    # scoped delete: same outcome here (each writer id
                    # lives in ONE partition) but exercises the
                    # (partition, key) identity path under OCC races
                    frame = spark.createDataFrame(
                        [(victim, f"g{14 % 3}")], "id long, grp string"
                    )
                    kw = {"scoped": True}
                    op = "delete_scoped"
                else:
                    frame = spark.createDataFrame(
                        [(victim,)], "id long"
                    )
                    kw = {}
                    op = "delete"
                _retry(tr, t, f"w{w}", op,
                       lambda: t.delete(frame, **kw), retries=30,
                       id=victim)
            if rng.random() < 0.5:
                time.sleep(rng.random() * 0.15)
        # merge_into converges the final state (update-or-insert)
        final = mk_rows(
            [(base_id + i, f"g{i % 3}", float(batches - 1),
              _ts(2, batches - 1)) for i in range(15)]
        )
        _retry(tr, t, f"w{w}", "merge_into",
               lambda: t.merge_into(final), retries=60)

    def dv_writer():
        rng = random.Random(7 * seed)
        t = KeyedTable.load(root)

        def with_retry(op, fn):
            _retry(tr, t, "dv", op, fn, retries=60)

        for b in range(batches):
            batch = mk_rows(
                [(9000 + i, f"g{i % 3}", float(b), _ts(2, b))
                 for i in range(15)]
            )
            with_retry("upsert_dv", lambda: t.upsert_dv(batch))
            if pscope and b == 1:
                # scoped kills of the shadow family's g0 copies
                # mid-churn: CoW twin for 40000/40001, DV twin for 40002
                # — the g1 copies must survive every interleaving
                with_retry(
                    "delete_scoped_shadow",
                    lambda: t.delete(
                        spark.createDataFrame(
                            [(40000, "g0"), (40001, "g0")],
                            "id long, grp string",
                        ),
                        scoped=True,
                    ),
                )
                with_retry(
                    "delete_dv_scoped_shadow",
                    lambda: t.delete_dv(
                        spark.createDataFrame(
                            [(40002, "g0")], "id long, grp string"
                        ),
                        scoped=True,
                    ),
                )
            if rng.random() < 0.5:
                time.sleep(rng.random() * 0.15)
        with_retry("delete_dv",
                   lambda: t.delete_dv([9000, 9001, 9002]))

    def service():
        rng = random.Random(99 * seed)
        t = KeyedTable.load(root)
        for _ in range(2):
            time.sleep(0.5 + rng.random())
            t.run_maintenance(
                spark, retain_commits=8, target_file_mb=64,
                small_file_mb=32, target_rows_per_file=20,
                orphan_grace_s=300.0,
            )
            tr.add("svc", "run_maintenance", "ok")
            if maps:
                # mid-walk retention fold (r13): recorded deltas of
                # all but the newest commits go away WHILE writers
                # commit and the CDF consumer drains — every reader
                # must degrade to the coarse/general contract, and
                # the final cdf_net == count assert proves no delta
                # was lost or double-served
                folded = t.fold_change_logs(
                    keep_last=6, orphan_grace_s=300.0
                )
                tr.add("svc", "fold_change_logs", "ok",
                       n=len(folded))

    def reader():
        """The r11 pinned-read paths, hammered mid-churn. Every call
        must be INTERNALLY consistent — one op, one manifest means a
        racing commit can never make a single read contradict
        itself."""
        rng = random.Random(5 * seed)
        t = KeyedTable.load(root)
        legal_v = {float(b) for b in range(batches)} | {0.0}
        for i in range(12):
            time.sleep(0.15 + rng.random() * 0.3)
            probe = [1000 + j for j in range(5)]
            got = t.read_keys(spark, probe).select("id", "v").collect()
            ids = [r.id for r in got]
            if len(ids) != len(set(ids)):
                raise AssertionError(f"read_keys dup ids {ids}")
            if not all(r.v in legal_v for r in got):
                raise AssertionError(f"read_keys illegal v {got}")
            tr.add("rd", "read_keys", "ok", n=len(ids))
            rr = t.read_range(spark, "id", 1000, 1010).collect()
            if any(not (1000 <= r.id <= 1010) for r in rr):
                raise AssertionError("read_range out-of-range row")
            tr.add("rd", "read_range", "ok", n=len(rr))
            ri = t.read_isin(spark, "id", probe).collect()
            if {r.id for r in ri} - set(probe):
                raise AssertionError("read_isin extra rows")
            tr.add("rd", "read_isin", "ok", n=len(ri))
            # snapshot self-consistency at ONE pinned commit
            man = M.read_manifest(root)
            if man is not None:
                c1 = t.read(spark, at=man.commit_id).count()
                c2 = t.count_rows_metadata(at=man.commit_id)
                if c2 is not None and c1 != c2:
                    raise AssertionError(
                        f"pinned snapshot {man.commit_id}: scan {c1} "
                        f"!= metadata {c2}"
                    )
                tr.add("rd", "pinned_count", "ok", commit=man.commit_id)
            if rng.random() < 0.4:
                t.export_live_files()
                tr.add("rd", "export_live_files", "ok")
            if rng.random() < 0.3:
                try:
                    t.lookup_join(
                        spark,
                        spark.createDataFrame([(1001,)], "id long"),
                        prune=True,
                    ).count()
                    tr.add("rd", "lookup_join_pruned", "ok")
                except ValueError:
                    tr.add("rd", "lookup_join_pruned", "no-index")
            if i % 4 == 0:
                try:
                    first = t.commits()[0]
                    t.diff_commits(spark, first).count()
                    tr.add("rd", "diff_commits", "ok")
                except (ValueError, FileNotFoundError):
                    # a racing clean() aged the oldest commit out
                    # between the listing and the diff — the
                    # documented retention-refusal contract
                    tr.add("rd", "diff_commits", "aged-out")

    # per-batch-id applied deltas: a batch that FAILS mid-apply (e.g.
    # the fold race below) re-runs under the SAME bid on restart, so
    # replace-by-bid keeps the accounting exactly-once
    cdf_net = {"applied": {}}

    def _cdf_total() -> int:
        return sum(cdf_net["applied"].values())

    from hudi_glue_spark.streaming.table_source import stream_changes

    def cdf_drain():
        for _attempt in range(6):
            try:
                t = KeyedTable.load(root)

                def _apply(b, bid):
                    r = b.selectExpr(
                        "sum(case when _change_type='insert' "
                        "then 1 else -1 end) d"
                    ).first()
                    cdf_net["applied"][bid] = r["d"] or 0

                q = (
                    stream_changes(spark, t, mode="cdf")
                    .writeStream.foreachBatch(_apply)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(240)
                tr.add("cdf", "drain", "ok", net=_cdf_total())
                return
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "aged out" in msg:  # retention race
                    shutil.rmtree(ck, ignore_errors=True)
                    cdf_net["applied"] = {}
                    tr.add("cdf", "drain", "restart-from-earliest")
                elif "_changes" in msg or "FileNotFound" in msg:
                    # fold race (r13): a 'chlog' slice planned before a
                    # mid-walk fold_change_logs read after it — SAME
                    # checkpoint replans the uncommitted offsets, which
                    # now see the folded state and take the
                    # coarse/gate path (net-identical by contract)
                    tr.add("cdf", "drain", "fold-race-replan")
                else:
                    raise

    def cdf_consumer():
        for _ in range(2):
            time.sleep(0.8)
            cdf_drain()

    threads = [
        threading.Thread(target=guard(f"w{w}", lambda w=w: writer(w)))
        for w in range(writers)
    ]
    threads += [
        threading.Thread(target=guard("svc", service)),
        threading.Thread(target=guard("dv", dv_writer)),
        threading.Thread(target=guard("rd", reader)),
        threading.Thread(target=guard("cdf", cdf_consumer)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    violations = list(errors)
    _assert_interleaved(tr, violations)
    try:
        if not violations:
            cdf_drain()
            t = KeyedTable.load(root)
            snap = t.read(spark)
            collected = snap.collect()
            rows = {r.id: r.v for r in collected}
            idents = [(r.id, r.grp) for r in collected]
            for w in range(writers):
                for i in range(15):
                    k = 1000 * (w + 1) + i
                    if rows.get(k) != float(batches - 1):
                        violations.append(
                            f"writer {w} key {k}: {rows.get(k)!r} != "
                            f"{float(batches - 1)}"
                        )
            if {9000, 9001, 9002} & set(rows):
                violations.append("dv deletes resurrected")
            for i in range(3, 15):
                if rows.get(9000 + i) != float(batches - 1):
                    violations.append(f"dv survivor 9{i:03d} wrong")
            if pscope:
                # shadow family: g0 copies of 40000-40002 scoped-dead
                # (CoW twins 40000/40001, DV twin 40002), every g1 copy
                # and the untouched ids' BOTH copies alive at 123.0
                shadow = {
                    (r.id, r.grp): r.v
                    for r in collected if 40000 <= r.id < 40010
                }
                for j in range(3):
                    if (40000 + j, "g0") in shadow:
                        violations.append(
                            f"scoped delete leaked: (4000{j}, g0) alive"
                        )
                want = {(40000 + j, "g1") for j in range(5)} | {
                    (40000 + j, "g0") for j in range(3, 5)
                }
                for key in want:
                    if shadow.get(key) != 123.0:
                        violations.append(
                            f"shadow twin {key} lost or drifted: "
                            f"{shadow.get(key)!r}"
                        )
            if maps:
                # r12: the carried map columns — top-level AND
                # struct-nested — must survive every rewrite
                # byte-for-byte (both derive from the row)
                badm = [
                    (r.id, dict(r.attrs or {}))
                    for r in snap.collect()
                    if dict(r.attrs or {}) != {"g": r.grp,
                                               "b": str(r.v)}
                    or r.meta is None
                    or dict(r.meta.m or {}) != {"k": str(r.id % 4)}
                    or r.meta.s != r.grp
                ]
                if badm:
                    violations.append(
                        f"map attrs drifted: {badm[:5]}"
                    )
            n = snap.count()
            if n != len(set(idents)):  # identity = (key, partition)
                violations.append(
                    "duplicate identities in final snapshot"
                )
            if not pscope and n != len(rows):
                violations.append("duplicate keys in final snapshot")
            if n != t.count_rows_metadata():
                violations.append("metadata count != snapshot count")
            if _cdf_total() != n:
                violations.append(
                    f"cdf net {_cdf_total()} != snapshot {n}"
                )
            reg = t.record_index_info()
            if reg is not None:
                probe = [1003, 9007]
                got = {
                    r["id"]
                    for r in t.read_keys(spark, probe)
                    .select("id").collect()
                }
                if got != set(probe):
                    violations.append(f"index probe wrong: {got}")
            t.clean(retain_commits=2)
            bad = t.validate()
            if bad:
                violations.append(f"validate: {bad}")
    except Exception:  # noqa: BLE001
        import traceback

        violations.append(f"quiesce: {traceback.format_exc()}")
    finally:
        RI.REG_SPILL_BYTES = old_spill

    os.makedirs(trace_dir, exist_ok=True)
    tpath = os.path.join(trace_dir, f"soak_seed{seed}.json")
    tr.dump(tpath)
    status = "GREEN" if not violations else "VIOLATIONS"
    print(f"seed {seed}: {status}  ops={len(tr._rows)}  "
          f"occ_retries={tr.occ_retries()}  trace={tpath}")
    for v in violations:
        print(f"  !! {v}")
    return violations


def run_sync_seed(spark, seed: int, batches: int,
                  trace_dir: str) -> list[str]:
    """by-source sync tier (r13, SURVEY §9l#4): the main walk's
    convergence model assumes writers own their key ranges, which a
    WHEN NOT MATCHED BY SOURCE merge violates by design (it deletes
    every row the source doesn't carry). This dedicated shape races
    ONE snapshot-sync writer (merge_into(by_source_delete=True) —
    whole-table scope, rebase proofs disabled, so every OCC conflict
    re-merges) against a DV writer whose rows each sync wipes, a
    consistency reader, and a CDF consumer. Quiesce: one final sync
    makes the table EQUAL the last source snapshot; cdf net == count;
    validate() clean."""
    from pyspark.sql import Row

    from hudi_glue_spark.table import KeyedTable
    from hudi_glue_spark.table import manifest as M

    root = f"/tmp/soak_sync_{seed}"
    ck = root + "_ck"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    tr = Trace()
    errors: list[str] = []
    maps = bool(seed % 2)  # odd: chlog on (table-sized deltas cap →
    # refless commits → the coarse stream contract under sync churn)

    def _ts(day: int, b: int = 0) -> str:
        return f"2024-02-{day:02d}T{b:02d}:00:00"

    def snap(b: int):
        return spark.createDataFrame(
            [Row(id=i, grp=f"g{i % 3}", v=float(b), ts=_ts(2, b))
             for i in range(60)]
        )

    t0 = KeyedTable(root, key="id", precombine="ts",
                    partition_by="grp", change_log=maps)
    t0.bulk_insert(snap(0))

    def guard(who, fn):
        # returns a ZERO-ARG thunk for Thread(target=...). The r10-r13
        # shape — guard(who)(fn) — executed fn EAGERLY at Thread
        # construction and handed Thread a None target, so every prior
        # walk of THIS TOOL ran its "concurrent" ops sequentially
        # (found r14 when the new wipe tier's trace showed perfect
        # per-thread ordering; the pytest walk in test_lifecycle.py
        # passes real targets and was never affected). The
        # _assert_interleaved() check on every tier's trace keeps the
        # tool honest against any future regression of this class.
        def wrap():
            try:
                fn()
            except Exception:  # noqa: BLE001
                import traceback

                tr.add(who, "FATAL", traceback.format_exc())
                errors.append(f"{who}: {traceback.format_exc()}")
        return wrap

    def with_retry(t, who, op, fn):
        # retries recorded: each lost OCC race IS interleaving
        # evidence (_assert_interleaved counts it — a 2-writer
        # tier can group its SUCCESSES while contending hard)
        _retry(tr, t, who, op, fn, retries=80)

    def sync_writer():
        rng = random.Random(11 * seed)
        t = KeyedTable.load(root)
        for b in range(1, batches + 1):
            with_retry(
                t, "sync", f"by_source_sync_b{b}",
                lambda b=b: t.merge_into(
                    snap(b), by_source_delete=True
                ),
            )
            time.sleep(rng.random() * 0.2)

    def dv_writer():
        rng = random.Random(13 * seed)
        t = KeyedTable.load(root)
        for b in range(batches):
            batch = spark.createDataFrame(
                [Row(id=9000 + i, grp=f"g{i % 3}", v=1000.0 + b,
                     ts=_ts(3, b)) for i in range(10)]
            )
            with_retry(t, "dv", "upsert_dv",
                       lambda: t.upsert_dv(batch))
            time.sleep(rng.random() * 0.2)

    def reader():
        rng = random.Random(17 * seed)
        t = KeyedTable.load(root)
        for _ in range(10):
            time.sleep(0.1 + rng.random() * 0.3)
            rows = t.read(spark).select("id", "v").collect()
            ids = [r.id for r in rows]
            if len(ids) != len(set(ids)):
                raise AssertionError(f"dup ids mid-sync: {ids}")
            if not all(
                (0 <= r.id < 60 and 0.0 <= r.v <= batches)
                or (9000 <= r.id < 9010 and r.v >= 1000.0)
                for r in rows
            ):
                raise AssertionError(f"illegal row mid-sync: {rows}")
            tr.add("rd", "read", "ok", n=len(ids))
            man = M.read_manifest(root)
            if man is not None:
                c1 = t.read(spark, at=man.commit_id).count()
                c2 = t.count_rows_metadata(at=man.commit_id)
                if c2 is not None and c1 != c2:
                    raise AssertionError(
                        f"pinned {man.commit_id}: scan {c1} != meta {c2}"
                    )

    applied: dict = {}

    def cdf_drain():
        from hudi_glue_spark.streaming.table_source import (
            stream_changes,
        )

        for _ in range(6):
            try:
                t = KeyedTable.load(root)

                def _apply(b, bid):
                    r = b.selectExpr(
                        "sum(case when _change_type='insert' "
                        "then 1 else -1 end) d"
                    ).first()
                    applied[bid] = r["d"] or 0

                q = (
                    stream_changes(spark, t, mode="cdf")
                    .writeStream.foreachBatch(_apply)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(240)
                tr.add("cdf", "drain", "ok",
                       net=sum(applied.values()))
                return
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "aged out" in msg:
                    shutil.rmtree(ck, ignore_errors=True)
                    applied.clear()
                    tr.add("cdf", "drain", "restart-from-earliest")
                elif "_changes" in msg or "FileNotFound" in msg:
                    tr.add("cdf", "drain", "fold-race-replan")
                else:
                    raise

    def cdf_consumer():
        for _ in range(2):
            time.sleep(0.6)
            cdf_drain()

    threads = [
        threading.Thread(target=guard("sync", sync_writer)),
        threading.Thread(target=guard("dv", dv_writer)),
        threading.Thread(target=guard("rd", reader)),
        threading.Thread(target=guard("cdf", cdf_consumer)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    violations = list(errors)
    _assert_interleaved(tr, violations)
    try:
        if not violations:
            t = KeyedTable.load(root)
            with_retry(
                t, "sync", "final_sync",
                lambda: t.merge_into(
                    snap(batches), by_source_delete=True
                ),
            )
            cdf_drain()
            rows = {r.id: r.v for r in t.read(spark).collect()}
            want = {i: float(batches) for i in range(60)}
            if rows != want:
                bad = {k: v for k, v in rows.items()
                       if want.get(k) != v}
                violations.append(
                    f"post-sync state != source snapshot: {bad} "
                    f"(missing: {sorted(set(want) - set(rows))[:5]})"
                )
            n = t.read(spark).count()
            if sum(applied.values()) != n:
                violations.append(
                    f"cdf net {sum(applied.values())} != snapshot {n}"
                )
            t.clean(retain_commits=2, orphan_grace_s=0.0)
            bad_v = t.validate()
            if bad_v:
                violations.append(f"validate: {bad_v}")
    except Exception:  # noqa: BLE001
        import traceback

        violations.append(f"quiesce: {traceback.format_exc()}")

    os.makedirs(trace_dir, exist_ok=True)
    tpath = os.path.join(trace_dir, f"soak_sync_seed{seed}.json")
    tr.dump(tpath)
    status = "GREEN" if not violations else "VIOLATIONS"
    print(f"sync seed {seed}: {status}  ops={len(tr._rows)}  "
          f"occ_retries={tr.occ_retries()}  trace={tpath}")
    for v in violations:
        print(f"  !! {v}")
    return violations


def run_wipe_seed(spark, seed: int, batches: int,
                  trace_dir: str) -> list[str]:
    """TRUNCATE / INSERT OVERWRITE tier (r14, VERDICT r13 #5): the two
    r13 SQL write surfaces are property-tested but were never in the
    randomized multi-writer mix — both are commit types a CDF consumer
    and an OCC rival must survive. Every write in this tier goes
    through the SQL FRONT-END (sql_dml strings), so the soak covers
    the parser→engine routing too, not just the API:

    - an overwrite writer repeatedly ``INSERT OVERWRITE``-s partition
      g0 (whole-partition replace commits),
    - an upsert writer ``INSERT INTO``-s the g1/g2 rows (keyed upsert),
    - a DV writer races positional marks on its own g1/g2 family,
    - a WIPER lands one mid-walk ``TRUNCATE TABLE`` (metadata-only
      rewrite of <all> — conflicts with EVERY rival under OCC) and
      immediately reloads the base snapshot,
    - a reader asserts internal consistency mid-churn, and a CDF
      consumer drains across the truncate (restart-from-earliest on
      retention races, per the documented contract).

    Phase 2 (after the chaos joins) issues one final op per writer, so
    the end state is DETERMINISTIC regardless of whether the truncate
    landed before or after any given chaos op. Quiesce: exact final
    state, cdf net == snapshot count, validate() clean."""
    from pyspark.sql import Row

    from hudi_glue_spark.sql_dml import sql_dml
    from hudi_glue_spark.table import KeyedTable
    from hudi_glue_spark.table import manifest as M

    root = f"/tmp/soak_wipe_{seed}"
    ck = root + "_ck"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    tr = Trace()
    errors: list[str] = []
    maps = bool(seed % 2)  # odd: write-time change log on

    def _ts(day: int, b: int = 0) -> str:
        return f"2024-03-{day:02d}T{b:02d}:00:00"

    def g0_rows(b: int):
        # ids ≡ 0 (mod 3) live in g0 — the overwrite writer's scope
        return spark.createDataFrame(
            [Row(id=i, grp="g0", v=float(b), ts=_ts(2, b))
             for i in range(0, 60, 3)]
        )

    def g12_rows(b: int):
        return spark.createDataFrame(
            [Row(id=i, grp=f"g{i % 3}", v=float(b), ts=_ts(2, b))
             for i in range(60) if i % 3],
        )

    def base_rows():
        return spark.createDataFrame(
            [Row(id=i, grp=f"g{i % 3}", v=0.0, ts=_ts(1))
             for i in range(60)]
        )

    t0 = KeyedTable(root, key="id", precombine="ts",
                    partition_by="grp", change_log=maps)
    t0.bulk_insert(base_rows())
    tables = {"wt": t0}

    def guard(who, fn):
        # returns a ZERO-ARG thunk for Thread(target=...). The r10-r13
        # shape — guard(who)(fn) — executed fn EAGERLY at Thread
        # construction and handed Thread a None target, so every prior
        # walk of THIS TOOL ran its "concurrent" ops sequentially
        # (found r14 when the new wipe tier's trace showed perfect
        # per-thread ordering; the pytest walk in test_lifecycle.py
        # passes real targets and was never affected). The
        # _assert_interleaved() check on every tier's trace keeps the
        # tool honest against any future regression of this class.
        def wrap():
            try:
                fn()
            except Exception:  # noqa: BLE001
                import traceback

                tr.add(who, "FATAL", traceback.format_exc())
                errors.append(f"{who}: {traceback.format_exc()}")
        return wrap

    def with_retry(who, op, fn):
        # the wipe tier writes through the SQL front-end; the engine
        # retry loop still keys its lease off the one managed table
        _retry(tr, tables["wt"], who, op, fn, retries=80)

    vlock = threading.Lock()

    def _sql_write(who, op, stmt_fmt, df):
        # per-call unique view name: temp views are session-global
        vname = f"wipe_{seed}_{who}_{abs(hash(stmt_fmt)) % 997}_{time.monotonic_ns()}"
        with vlock:
            df.createOrReplaceTempView(vname)
        with_retry(
            who, op,
            lambda: sql_dml(spark, stmt_fmt.format(v=vname),
                            tables=tables),
        )

    def ow_writer():
        rng = random.Random(11 * seed)
        for b in range(1, batches + 1):
            _sql_write("ow", f"insert_overwrite_b{b}",
                       "INSERT OVERWRITE wt SELECT * FROM {v}",
                       g0_rows(b))
            time.sleep(rng.random() * 0.2)

    def up_writer():
        rng = random.Random(13 * seed)
        for b in range(1, batches + 1):
            _sql_write("up", f"insert_into_b{b}",
                       "INSERT INTO wt SELECT * FROM {v}",
                       g12_rows(b))
            time.sleep(rng.random() * 0.2)

    def dv_writer():
        rng = random.Random(17 * seed)
        t = KeyedTable.load(root)
        for b in range(batches):
            batch = spark.createDataFrame(
                [Row(id=9000 + i, grp=f"g{1 + i % 2}",
                     v=1000.0 + b, ts=_ts(3, b)) for i in range(10)]
            )
            with_retry("dv", "upsert_dv",
                       lambda: t.upsert_dv(batch))
            time.sleep(rng.random() * 0.2)

    def wiper():
        rng = random.Random(19 * seed)
        time.sleep(0.4 + rng.random() * 0.5)
        with_retry(
            "wipe", "truncate",
            lambda: sql_dml(spark, "TRUNCATE TABLE wt",
                            tables=tables),
        )
        _sql_write("wipe", "reload",
                   "INSERT INTO wt SELECT * FROM {v}", base_rows())

    def reader():
        rng = random.Random(23 * seed)
        t = KeyedTable.load(root)
        for _ in range(10):
            time.sleep(0.1 + rng.random() * 0.3)
            rows = t.read(spark).select("id", "grp").collect()
            idents = [(r.id, r.grp) for r in rows]
            ids = [r.id for r in rows]
            if len(ids) != len(set(ids)):
                raise AssertionError(f"dup ids mid-wipe: {sorted(ids)}")
            tr.add("rd", "read", "ok", n=len(idents))
            man = M.read_manifest(root)
            if man is not None:
                c1 = t.read(spark, at=man.commit_id).count()
                c2 = t.count_rows_metadata(at=man.commit_id)
                if c2 is not None and c1 != c2:
                    raise AssertionError(
                        f"pinned {man.commit_id}: scan {c1} != meta {c2}"
                    )

    applied: dict = {}

    def cdf_drain():
        from hudi_glue_spark.streaming.table_source import (
            stream_changes,
        )

        for _ in range(6):
            try:
                t = KeyedTable.load(root)

                def _apply(b, bid):
                    r = b.selectExpr(
                        "sum(case when _change_type='insert' "
                        "then 1 else -1 end) d"
                    ).first()
                    applied[bid] = r["d"] or 0

                q = (
                    stream_changes(spark, t, mode="cdf")
                    .writeStream.foreachBatch(_apply)
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                assert q.awaitTermination(240)
                tr.add("cdf", "drain", "ok",
                       net=sum(applied.values()))
                return
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "aged out" in msg:
                    shutil.rmtree(ck, ignore_errors=True)
                    applied.clear()
                    tr.add("cdf", "drain", "restart-from-earliest")
                elif "_changes" in msg or "FileNotFound" in msg:
                    tr.add("cdf", "drain", "fold-race-replan")
                else:
                    raise

    def cdf_consumer():
        for _ in range(2):
            time.sleep(0.6)
            cdf_drain()

    threads = [
        threading.Thread(target=guard("ow", ow_writer)),
        threading.Thread(target=guard("up", up_writer)),
        threading.Thread(target=guard("dv", dv_writer)),
        threading.Thread(target=guard("wipe", wiper)),
        threading.Thread(target=guard("rd", reader)),
        threading.Thread(target=guard("cdf", cdf_consumer)),
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    violations = list(errors)
    _assert_interleaved(tr, violations)
    try:
        if not violations:
            # phase 2: one final op per writer — deterministic end
            # state no matter where the truncate landed in phase 1
            fb = batches + 1
            _sql_write("ow", "final_overwrite",
                       "INSERT OVERWRITE wt SELECT * FROM {v}",
                       g0_rows(fb))
            _sql_write("up", "final_upsert",
                       "INSERT INTO wt SELECT * FROM {v}",
                       g12_rows(fb))
            t = KeyedTable.load(root)
            final_dv = spark.createDataFrame(
                [Row(id=9000 + i, grp=f"g{1 + i % 2}",
                     v=1000.0 + fb, ts=_ts(3, fb))
                 for i in range(10)]
            )
            with_retry("dv", "final_upsert_dv",
                       lambda: t.upsert_dv(final_dv))
            cdf_drain()
            rows = {r.id: r.v for r in t.read(spark).collect()}
            want = {i: float(fb) for i in range(60)}
            want.update({9000 + i: 1000.0 + fb for i in range(10)})
            if rows != want:
                bad = {k: v for k, v in rows.items()
                       if want.get(k) != v}
                violations.append(
                    f"post-wipe state wrong: {bad} (missing: "
                    f"{sorted(set(want) - set(rows))[:5]})"
                )
            n = t.read(spark).count()
            if sum(applied.values()) != n:
                violations.append(
                    f"cdf net {sum(applied.values())} != snapshot {n}"
                )
            if n != t.count_rows_metadata():
                violations.append("metadata count != snapshot count")
            # OCC losers' staged files and truncated-away versions are
            # EXPECTED cleanable orphans under real contention — sweep
            # them (grace 0: the walk is quiesced) before validate,
            # the same order run_seed uses
            t.clean(retain_commits=2, orphan_grace_s=0.0)
            bad_v = t.validate()
            if bad_v:
                violations.append(f"validate: {bad_v}")
    except Exception:  # noqa: BLE001
        import traceback

        violations.append(f"quiesce: {traceback.format_exc()}")

    os.makedirs(trace_dir, exist_ok=True)
    tpath = os.path.join(trace_dir, f"soak_wipe_seed{seed}.json")
    tr.dump(tpath)
    status = "GREEN" if not violations else "VIOLATIONS"
    print(f"wipe seed {seed}: {status}  ops={len(tr._rows)}  "
          f"occ_retries={tr.occ_retries()}  trace={tpath}")
    for v in violations:
        print(f"  !! {v}")
    return violations


def main() -> int:
    ap = argparse.ArgumentParser()
    # default tier mixes parities DELIBERATELY: odd seeds = chlog +
    # live map columns + mid-walk retention folds; even seeds =
    # key_scope='partition' + shadow-family scoped deletes (r13)
    ap.add_argument("--seeds", type=int, nargs="*",
                    default=[7, 22, 23, 58, 101])
    ap.add_argument("--writers", type=int, default=5)
    ap.add_argument("--batches", type=int, default=4)
    # by-source sync tier (r13): one odd (chlog) + one even seed
    ap.add_argument("--sync-seeds", type=int, nargs="*",
                    default=[5, 8])
    # truncate/insert-overwrite tier (r14): one odd + one even seed
    ap.add_argument("--wipe-seeds", type=int, nargs="*",
                    default=[3, 12])
    args = ap.parse_args()
    trace_dir = os.environ.get("SOAK_TRACE_DIR", "/tmp/soak_traces")

    from hudi_glue_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    bad = 0
    for seed in args.seeds:
        bad += len(run_seed(spark, seed, args.writers, args.batches,
                            trace_dir))
    for seed in args.sync_seeds:
        bad += len(run_sync_seed(spark, seed, args.batches, trace_dir))
    for seed in args.wipe_seeds:
        bad += len(run_wipe_seed(spark, seed, args.batches, trace_dir))
    wall = time.time() - t0
    print(f"\n{len(args.seeds)} seeds × {args.writers} writers × "
          f"{args.batches} batches + {len(args.sync_seeds)} sync "
          f"+ {len(args.wipe_seeds)} wipe seeds in {wall:.0f}s — "
          f"{'ALL GREEN' if not bad else f'{bad} violations'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
