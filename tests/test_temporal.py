"""Temporal operator tests: as-of join semantics, interval join
bucketed-vs-broadcast agreement, IVF recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_glue_spark.operators.similarity import knn_bruteforce, knn_ivf
from hudi_glue_spark.operators.temporal import asof_join, point_in_interval_join


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "p1"),
         (1, "2024-01-01 12:00:00", "p2"),
         (2, "2024-01-01 10:00:00", "p3")],
        "uid long, ts_s string, tag string",
    ).select("uid", F.to_timestamp("ts_s").alias("ts"), "tag")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 10.0),
         (1, "2024-01-01 10:00:00", 20.0),   # equal ts → inclusive match
         (1, "2024-01-01 11:59:00", 30.0)],
        "uid long, ts_s string, px double",
    ).select("uid", F.to_timestamp("ts_s").alias("ts"), "px")
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["tag"]: r["asof_px"]
        for r in asof_join(left, right, "ts", ["uid"], ["px"]).collect()
    }
    # p1: right row at exactly 10:00 matches (inclusive); p2: latest
    # earlier row 11:59; p3: user 2 has no right rows → NULL.
    assert out == {"p1": 20.0, "p2": 30.0, "p3": None}


def test_asof_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["tag"]: r["asof_px"]
        for r in asof_join(
            left, right, "ts", ["uid"], ["px"], tolerance="5 MINUTES"
        ).collect()
    }
    # p2's match at 11:59 is within 5 min of 12:00; p1's 10:00 match is
    # at distance zero; nothing else qualifies.
    assert out == {"p1": 20.0, "p2": 30.0, "p3": None}
    out_tight = {
        r["tag"]: r["asof_px"]
        for r in asof_join(
            left, right, "ts", ["uid"], ["px"], tolerance="0 SECONDS"
        ).collect()
    }
    assert out_tight == {"p1": 20.0, "p2": None, "p3": None}


def test_interval_join_bucketed_matches_broadcast(spark, sf_dir):
    from hudi_glue_spark.queries import table

    ev = table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.range(16).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25.0).alias("lo"),
        ((F.col("id") + 1) * 25.0).alias("hi"),
    )
    bc = point_in_interval_join(ev, bands, "value", "lo", "hi")
    bucketed = point_in_interval_join(
        ev, bands, "value", "lo", "hi", bucket_width=10.0
    )
    cols = ["event_id", "band_id"]
    assert bc.select(cols).exceptAll(bucketed.select(cols)).isEmpty()
    assert bucketed.select(cols).exceptAll(bc.select(cols)).isEmpty()


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from hudi_glue_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(queries, emb, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(
            queries, emb, "vec_id", "embedding", k=5, n_centroids=16, nprobe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_interval_join_integer_domain_exclusive_edges(spark):
    """Bucket edges must come from integer bucket arithmetic, not a
    float epsilon: an integer hi landing exactly on a bucket edge is
    exclusive, and points equal to hi must not match."""
    pts = spark.createDataFrame(
        [(i, i) for i in range(0, 40)], "pid long, v long"
    )
    iv = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 20), (3, 5, 5), (4, 20, 21)],
        "band long, lo long, hi long",
    )
    got = {
        (r.pid, r.band)
        for r in point_in_interval_join(
            pts, iv, "v", "lo", "hi", bucket_width=10.0
        ).collect()
    }
    want = {(v, 1) for v in range(0, 10)} | {(v, 2) for v in range(10, 20)} | {(20, 4)}
    assert got == want
