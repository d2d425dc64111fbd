"""Corpus growth stress: time the data-proportional operator family at
1x/4x/16x (optionally 64x: ``--deep``) the sf0.1 documents table
(doc_ids shifted per replica so the corpus is genuinely larger, with
planted cross-replica duplicates).

This is the harness that caught the broadcast scale bug fixed in
operators/dedup.py: at 16x the planner's post-explode size estimates
broadcast corpus-sized join sides and OOM'd — a failure mode invisible
at the gate scale factors. Run it after touching any pair-generating
operator:

    python tools/growth_stress.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from hudi_glue_spark.operators import dedup as D
    from hudi_glue_spark.queries import table
    from hudi_glue_spark.session import get_spark

    spark = get_spark("growth", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()
    print(f"base corpus: {n0} docs")

    rows = []
    mults = (1, 4, 16, 64) if "--deep" in sys.argv else (1, 4, 16)
    for mult in mults:
        path = f"/tmp/hudi_glue_spark_growth_{mult}x.parquet"
        if not os.path.isdir(path):
            big = docs
            for i in range(1, mult):
                big = big.unionByName(
                    docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                )
            big.write.mode("overwrite").parquet(path)
        bdf = spark.read.parquet(path)

        t0 = time.perf_counter()
        bdf.select(
            F.size(D.winnowing_fingerprints("text")).alias("n")
        ).agg(F.sum("n")).collect()
        tw = time.perf_counter() - t0

        t0 = time.perf_counter()
        nm = D.minhash_lsh_pairs(bdf, "doc_id", "text").count()
        tm = time.perf_counter() - t0

        t0 = time.perf_counter()
        ns = D.simhash_pairs(bdf, "doc_id", "text").count()
        ts = time.perf_counter() - t0

        t0 = time.perf_counter()
        D.exact_dedup(bdf, "doc_id", "text").count()
        te = time.perf_counter() - t0

        t0 = time.perf_counter()
        ng = D.segment_dedup(bdf, "doc_id", "text").count()
        tg = time.perf_counter() - t0

        # persisted-band-index incremental dedup (r6): ONE index build
        # per corpus size, then a 2% batch probes it — build cost is
        # the amortized pass, probe cost is what continuous ingest pays
        # per micro-batch (and must NOT grow like the corpus×corpus
        # pair family above).
        import shutil

        from hudi_glue_spark.table import KeyedTable

        idx_root = f"/tmp/hudi_glue_spark_growth_mhidx_{mult}x"
        shutil.rmtree(idx_root, ignore_errors=True)
        t0 = time.perf_counter()
        tbl = KeyedTable(
            idx_root, key=["bk", "doc_id"], precombine="doc_id",
            stats_cols=["bk"],
        )
        band = (
            D.minhash_band_rows(bdf, "doc_id", "text", num_hashes=16, bands=4)
            .withColumn(
                "bk", F.concat_ws(":", F.col("band").cast("string"), F.col("bh"))
            )
            .persist()  # range-sampling would re-run the minhash fold
        )
        tbl.bulk_insert(
            band.repartitionByRange(32, "bk").sortWithinPartitions("bk", "doc_id")
        )
        band.unpersist()
        tib = time.perf_counter() - t0

        batch = bdf.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(900_000_000)
        )
        t0 = time.perf_counter()
        bb = (
            D.minhash_band_rows(batch, "doc_id", "text", num_hashes=16, bands=4)
            .withColumn(
                "bk", F.concat_ws(":", F.col("band").cast("string"), F.col("bh"))
            )
        )
        cand = (
            tbl.read(spark)
            .join(bb.select(F.col("doc_id").alias("new_id"), "bk"), "bk")
            .select(F.col("doc_id").alias("dup_of"), "new_id")
            .dropDuplicates()
        )
        npairs = cand.count()
        tip = time.perf_counter() - t0

        rows.append((mult, n0 * mult, tw, tm, nm, ts, ns, te, tg, ng))
        print(
            f"mult={mult:>2} rows={n0 * mult:>7}  winnow={tw:6.2f}s  "
            f"minhash={tm:6.2f}s ({nm} pairs)  simhash={ts:6.2f}s "
            f"({ns} pairs)  exact_dedup={te:5.2f}s  "
            f"segment_dedup={tg:5.2f}s ({ng} survivors)  "
            f"idx_build={tib:6.2f}s  idx_probe={tip:5.2f}s ({npairs} cands)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
