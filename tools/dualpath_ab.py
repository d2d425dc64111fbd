"""A/B attribution for dual_path_read_agreement (VERDICT r14 "What's
wrong" #1): the one >1.25× normalized mover in the r14 bench is also
the one query whose path r14 changed (``register()`` live by
default). Interleave the FULL query body with ``live=True`` vs
``live=False`` on a quiet rig — the two differ ONLY in the owner-map
insert and live-refresh bookkeeping (no commit lands during the
query, so the refresh never even fires) — and print medians. A
same-within-noise result attributes the r14 number to rig variance;
a real gap means the live path costs per-read and needs a lazy
re-point.

    python tools/dualpath_ab.py [reps]   # default 7 each, interleaved
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def body(spark, tbl, live: bool) -> None:
    """The exact q_dual_path_read_agreement body minus the fixture."""
    tbl.register(spark, "kt_dual_path_ab", live=live)
    sql_side = spark.sql(
        "SELECT event_id, user_id, event_type, value, ts "
        "FROM kt_dual_path_ab"
    )
    path_side = tbl.read(spark).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    agree = sql_side.intersect(path_side)
    n = (sql_side.count(), path_side.count(), agree.count())
    assert n[0] == n[1] == n[2], n


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from hudi_glue_spark.scenario_queries import _two_batch_table
    from hudi_glue_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    tbl = _two_batch_table(spark, SF_DIR)  # build + warm once
    body(spark, tbl, live=True)  # JIT/codegen warm, uncounted
    samples: dict[str, list[float]] = {"live": [], "pinned": []}
    for _ in range(reps):
        for label, live in (("live", True), ("pinned", False)):
            t0 = time.time()
            body(spark, tbl, live=live)
            samples[label].append(round(time.time() - t0, 3))
    out = {
        "sf_dir": SF_DIR,
        "reps": reps,
        "live_median_s": statistics.median(samples["live"]),
        "pinned_median_s": statistics.median(samples["pinned"]),
        "samples": samples,
    }
    out["ratio_live_over_pinned"] = round(
        out["live_median_s"] / out["pinned_median_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
