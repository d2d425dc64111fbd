"""Record-level-index stress: point-lookup and upsert-tagging cost,
bloom probe vs RLI, as the live-file count grows.

Usage: PYTHONPATH=/root/repo python tools/rli_stress.py [rows] [rows_per_file]

Builds a table of `rows` rows fragmented into ~rows/rows_per_file
files (the many-small-files regime where driver-side bloom decoding
is the bottleneck), then times:

- files_with_keys (bloom sidecar probe, O(live files) driver work)
- files_hosting_keys (RLI span-pruned probe)
- read_keys end to end through each path
- build_record_index, per-commit delta cost, compaction
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hudi_glue_spark.session import get_spark
from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table import manifest as M


def best3(fn):
    vals = []
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        vals.append(time.monotonic() - t0)
    return round(min(vals), 3)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"rows": rows, "rows_per_file": per_file}

    root = "/tmp/rli_stress"
    shutil.rmtree(root, ignore_errors=True)
    t = KeyedTable(
        root,
        key="pk",
        precombine="ts",
        partition_by="part",
        stats_cols=["pk", "ts"],
        key_bloom=True,
    )
    df = spark.range(0, rows).select(
        F.col("id").alias("pk"),
        (F.col("id") % 8).cast("string").alias("part"),
        F.col("id").alias("ts"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    spark.conf.set(
        "spark.sql.files.maxRecordsPerFile", str(per_file)
    )
    t.bulk_insert(df)
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    man = M.read_manifest(root)
    out["n_files"] = man.n_files

    t0 = time.monotonic()
    t.build_record_index(spark)
    out["build_s"] = round(time.monotonic() - t0, 2)
    reg = t.record_index_info()
    out["base_segments"] = len(reg["base"])

    probes = [i * (rows // 16) + 1 for i in range(16)]
    out["bloom_probe_s"] = best3(lambda: t.files_with_keys(probes))
    out["rli_probe_s"] = best3(lambda: t.files_hosting_keys(spark, probes))
    out["rli_hosts"] = len(t.files_hosting_keys(spark, probes))
    out["bloom_hosts"] = len(t.files_with_keys(probes))

    # end-to-end point lookup (RLI path is the default when registered)
    out["read_keys_rli_s"] = best3(
        lambda: t.read_keys(spark, probes).count()
    )

    # per-commit delta cost: a 1k-row DV upsert on the indexed table
    batch = spark.range(0, 1_000).select(
        (F.col("id") * (rows // 1_000)).alias("pk"),
        ((F.col("id") * (rows // 1_000)) % 8).cast("string").alias("part"),
        F.lit(10 * rows).alias("ts"),
        F.lit("x" * 64).alias("payload"),
    )
    t0 = time.monotonic()
    t.upsert_dv(batch)
    out["upsert_dv_with_index_s"] = round(time.monotonic() - t0, 2)
    reg = t.record_index_info()
    out["delta_segments"] = len(reg["deltas"])

    # moved keys resolve through the delta
    moved = [0, rows // 1_000 * 7]
    got = t.read_keys(spark, moved)
    assert got.count() == len(moved)
    out["compact_s"] = None
    t0 = time.monotonic()
    assert t.compact_record_index(spark) is not None
    out["compact_s"] = round(time.monotonic() - t0, 2)
    out["post_compact_probe_s"] = best3(
        lambda: t.files_hosting_keys(spark, probes)
    )

    # secondary-index tier: ts is pk (scattered across every file's
    # span after hive partitioning by pk%8 — min/max pruning keeps ~all
    # files for a narrow ts probe); the column index resolves hosts
    sec_probe = [i * (rows // 16) + 3 for i in range(16)]
    out["sec_stats_only_files"] = len(t.files_isin("ts", sec_probe))
    out["sec_read_isin_no_index_s"] = best3(
        lambda: t.read_isin(spark, "ts", sec_probe).count()
    )
    t0 = time.monotonic()
    t.build_column_index(spark, "ts")
    out["sec_build_s"] = round(time.monotonic() - t0, 2)
    out["sec_index_files"] = len(
        t.files_hosting_values(spark, "ts", sec_probe)
    )
    out["sec_read_isin_indexed_s"] = best3(
        lambda: t.read_isin(spark, "ts", sec_probe).count()
    )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
