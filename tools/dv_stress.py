"""Deletion-vector DML vs copy-on-write rewrites: write amplification.

Builds a moderately wide keyed table (rows × ~220-byte payload), then
applies the same k-row update through (a) the rewrite upsert and
(b) upsert_dv, and the same k-row delete through (c) rewrite delete
and (d) delete_dv — measuring wall time, bytes written to storage, and
files touched. This is the number that justifies the MoR write path at
100 TB: a point update's cost should track the POINTS, not the
partitions that host them.

Usage: python tools/dv_stress.py [rows] [k]
       python tools/dv_stress.py chain [cycles] [retain] [rows]
       python tools/dv_stress.py diffrange [rows]

``diffrange`` is the DELETE-HEAVY-RANGE tier (VERDICT r12 #1): DV-mark
a small then a ~100× larger row volume and run ``diff_commits`` over
each range, measuring the PYTHON DRIVER's peak allocations during
planning + execution (tracemalloc — the count() sink keeps result
rows executor-side). Before r13 the driver synthesized every dead
(file, position) as Python tuples, so peak memory tracked deleted
rows; with executor-side expansion (_dv_dead_marks) it must stay
flat. The tier asserts the large range's driver peak is bounded and
does not scale with the ~100× delete volume.

``chain`` is the BLOB-CHAIN tier (VERDICT r8 ask #6): a hot file
re-masked every commit accumulates one superseded union blob per
generation — harmless for reads (each snapshot references exactly one
blob per masked file) but real ``_dv/`` inode pressure under streaming
DV ingest. The tier proves the bound: after N re-mask cycles the blob
count is N(+masked files), and one clean(retain_commits=R) collapses
it to the R retained generations — superseded blobs fold as soon as
their referencing commits pass the retention horizon, inside the
existing two-phase clean. validate() must stay sound throughout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hudi_glue_spark.session import get_spark
from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table.keyed_table import EVENT_TIME_WINS


def _du(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def _mk(spark, root: str, rows: int) -> KeyedTable:
    shutil.rmtree(root, ignore_errors=True)
    tbl = KeyedTable(
        root,
        key="pk",
        precombine="ts",
        partition_by="part",
        policy=EVENT_TIME_WINS,
        stats_cols=["pk", "ts"],
        key_bloom=True,
    )
    df = spark.range(0, rows).select(
        F.col("id").alias("pk"),
        (F.col("id") % 8).cast("string").alias("part"),
        F.col("id").alias("ts"),
        F.sha2(F.col("id").cast("string"), 512).alias("payload1"),
        F.sha2((F.col("id") + 1).cast("string"), 512).alias("payload2"),
        F.col("id").cast("double").alias("val"),
    )
    tbl.bulk_insert(df)
    return tbl


def blob_chain(cycles: int, retain: int, rows: int) -> None:
    from hudi_glue_spark.table import dv as DVB
    from hudi_glue_spark.table import manifest as M

    spark = get_spark()
    root = "/tmp/dv_stress_chain"
    tbl = _mk(spark, root, rows)
    t0 = time.monotonic()
    for i in range(cycles):
        # a fresh key each cycle, all ≡ 0 (mod 8) → the same hot
        # partition, so every commit re-unions that file's mask into
        # one NEW superseding blob — the chain shape under test
        tbl.delete_dv([8 * i])
    mask_wall = time.monotonic() - t0
    blobs_before = len(DVB.list_blobs(root))
    t0 = time.monotonic()
    tbl.clean(retain_commits=retain)
    clean_wall = time.monotonic() - t0
    blobs_after = DVB.list_blobs(root)
    # every surviving blob must be referenced by a retained commit
    refs: set[str] = set()
    for cid in tbl.commits():
        m = M.read_manifest(root, cid)
        if m is not None:
            refs |= {v[0] for v in (m.dvs or {}).values()}
    problems = tbl.validate()
    out = {
        "tier": "blob_chain",
        "rows": rows,
        "cycles": cycles,
        "retain_commits": retain,
        "mask_wall_s": round(mask_wall, 2),
        "blobs_before_clean": blobs_before,
        "blobs_after_clean": len(blobs_after),
        "clean_wall_s": round(clean_wall, 2),
        "all_survivors_referenced": set(blobs_after) == refs,
        "validate_problems": problems,
        "final_rows": tbl.read(spark).count(),
    }
    man_now = M.read_manifest(root)
    n_masked_files = max(len(man_now.dvs or {}) if man_now else 0, 1)
    out["masked_files"] = n_masked_files
    assert blobs_before >= cycles
    # bound: one blob per (retained generation, masked file)
    assert len(blobs_after) <= retain * n_masked_files + 1
    assert out["all_survivors_referenced"] and not problems
    print(json.dumps(out, indent=2))


def diff_range(rows: int) -> None:
    import tracemalloc

    spark = get_spark()
    out: dict = {"tier": "diffrange", "rows": rows, "ranges": []}
    for frac in (0.002, 0.2):
        root = f"/tmp/dv_stress_diffrange_{frac}"
        tbl = _mk(spark, root, rows)
        c0 = tbl.commits()[-1]
        n_del = int(rows * frac)
        # two commits so the range exercises both triple shapes
        # (fresh mask + re-mask setdiff) in _dv_dead_marks
        tbl.delete_where_dv(
            spark, f"pk < {n_del // 2}", on_large="force"
        )
        tbl.delete_where_dv(
            spark, f"pk < {n_del}", on_large="force"
        )
        tracemalloc.start()
        t0 = time.monotonic()
        n = tbl.diff_commits(spark, c0).count()
        wall = time.monotonic() - t0
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert n == n_del, (n, n_del)
        out["ranges"].append(
            {
                "deleted_rows": n_del,
                "diff_rows": n,
                "diff_wall_s": round(wall, 2),
                "driver_py_peak_mb": round(peak / 1e6, 2),
            }
        )
    small, large = out["ranges"]
    ratio = large["driver_py_peak_mb"] / max(
        small["driver_py_peak_mb"], 0.01
    )
    out["peak_ratio_large_over_small"] = round(ratio, 2)
    # 100× the deleted rows must NOT mean 100× the driver allocations;
    # flat-ish (well under 10×) proves the positions never land driver-side
    assert ratio < 10, out
    print(json.dumps(out, indent=2))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "diffrange":
        diff_range(int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "chain":
        blob_chain(
            cycles=int(sys.argv[2]) if len(sys.argv) > 2 else 200,
            retain=int(sys.argv[3]) if len(sys.argv) > 3 else 10,
            rows=int(sys.argv[4]) if len(sys.argv) > 4 else 500_000,
        )
        return
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    spark = get_spark()
    out: dict = {"rows": rows, "k": k}

    batch = spark.range(0, k).select(
        (F.col("id") * (rows // k)).alias("pk"),
        ((F.col("id") * (rows // k)) % 8).cast("string").alias("part"),
        F.lit(10 * rows).alias("ts"),
        F.lit("x" * 128).alias("payload1"),
        F.lit("y" * 128).alias("payload2"),
        F.lit(-1.0).alias("val"),
    ).localCheckpoint()
    keys = [r[0] for r in batch.select("pk").collect()]

    for mode in ("rewrite", "dv"):
        root = f"/tmp/dv_stress_{mode}"
        tbl = _mk(spark, root, rows)
        base_bytes = _du(root)

        t0 = time.monotonic()
        if mode == "rewrite":
            tbl.upsert(batch)
        else:
            tbl.upsert_dv(batch)
        up_wall = time.monotonic() - t0
        up_bytes = _du(root) - base_bytes

        t0 = time.monotonic()
        if mode == "rewrite":
            tbl.delete(spark.createDataFrame([(x,) for x in keys[:200]], "pk long"))
        else:
            tbl.delete_dv(keys[:200])
        del_wall = time.monotonic() - t0
        del_bytes = _du(root) - base_bytes - up_bytes

        n = tbl.read(spark).count()
        out[mode] = {
            "upsert_wall_s": round(up_wall, 2),
            "upsert_bytes_written_mb": round(up_bytes / 1e6, 1),
            "delete_wall_s": round(del_wall, 2),
            "delete_bytes_written_mb": round(del_bytes / 1e6, 1),
            "final_rows": n,
        }

    assert out["rewrite"]["final_rows"] == out["dv"]["final_rows"]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
