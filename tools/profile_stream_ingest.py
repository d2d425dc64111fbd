"""Attribute stream_keyed_ingest wall time (VERDICT r7 'What's wrong' #1).

Times three layers at sf0.1, printing a JSON breakdown:
  1. batch-mode ``ingest()`` of the same 3 scenario batches (no
     Structured Streaming) — the pure commit-path cost;
  2. the streaming run itself (stage files + stream_ingest + drain);
  3. per-commit phase timers inside upsert (via monotonic wrappers).

Usage: python tools/profile_stream_ingest.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from hudi_glue_spark.session import get_spark
from hudi_glue_spark.scenario_queries import _batches
from hudi_glue_spark.streaming.ingest import stream_ingest
from hudi_glue_spark.streaming.sources import stream_parquet
from hudi_glue_spark.table import KeyedTable, ingest
from hudi_glue_spark.table.keyed_table import EVENT_TIME_WINS


def _mk_table(root: str) -> KeyedTable:
    return KeyedTable(
        f"{root}/table",
        key="event_id",
        precombine="ts",
        partition_by="event_type",
        policy=EVENT_TIME_WINS,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict = {"sf_dir": sf_dir}

    t0 = time.monotonic()
    batches = [b.localCheckpoint() for b in _batches(spark, sf_dir)]
    out["prepare_batches_s"] = round(time.monotonic() - t0, 3)

    # --- layer 1: batch-mode commits, per-commit timing -------------
    root = "/tmp/profile_ingest_batch"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    tbl = _mk_table(root)
    per_commit = []
    for b in batches:
        t = time.monotonic()
        ingest(tbl, b)
        per_commit.append(round(time.monotonic() - t, 3))
    out["batch_mode_commits_s"] = per_commit
    out["batch_mode_total_s"] = round(sum(per_commit), 3)

    # --- layer 2: the streaming run (same shape as the query) -------
    root = "/tmp/profile_ingest_stream"
    shutil.rmtree(root, ignore_errors=True)
    staging = f"{root}/staging"
    os.makedirs(staging)
    t0 = time.monotonic()
    for i, b in enumerate(batches):
        tmp = f"{root}/b{i}_tmp"
        b.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{staging}/batch_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp)
    out["stage_files_s"] = round(time.monotonic() - t0, 3)

    tbl2 = _mk_table(root)
    commit_times: list = []
    orig_upsert = KeyedTable.upsert
    orig_bulk = KeyedTable.bulk_insert

    def timed_upsert(self, *a, **k):
        t = time.monotonic()
        r = orig_upsert(self, *a, **k)
        commit_times.append(("upsert", round(time.monotonic() - t, 3)))
        return r

    def timed_bulk(self, *a, **k):
        t = time.monotonic()
        r = orig_bulk(self, *a, **k)
        commit_times.append(("bulk_insert", round(time.monotonic() - t, 3)))
        return r

    KeyedTable.upsert = timed_upsert  # type: ignore[method-assign]
    KeyedTable.bulk_insert = timed_bulk  # type: ignore[method-assign]
    try:
        t0 = time.monotonic()
        stream = stream_parquet(spark, staging, max_files_per_trigger=1)
        q = stream_ingest(tbl2, stream, f"{root}/ckpt")
        assert q.awaitTermination(300)
        out["stream_drain_s"] = round(time.monotonic() - t0, 3)
    finally:
        KeyedTable.upsert = orig_upsert  # type: ignore[method-assign]
        KeyedTable.bulk_insert = orig_bulk  # type: ignore[method-assign]
    out["stream_commits"] = commit_times
    out["stream_commit_total_s"] = round(sum(t for _, t in commit_times), 3)
    out["stream_overhead_s"] = round(
        out["stream_drain_s"] - out["stream_commit_total_s"], 3
    )

    t0 = time.monotonic()
    tbl2.read(spark).count()
    out["final_read_s"] = round(time.monotonic() - t0, 3)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
