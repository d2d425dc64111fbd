"""Distributed Lloyd k-means over an embedding column (§2b).

Unlike :func:`similarity.ivf_centroids` (which trains a coarse
quantizer driver-side on a bounded sample), this is the full iterative
algorithm with the UPDATE STEP distributed: every iteration assigns the
whole corpus to its nearest centroid (Arrow-batched matmul), then
computes per-cluster mean vectors with a Spark aggregation
(posexplode → groupBy(cluster, dim) → avg). Only the k×dim centroid
matrix ever reaches the driver — the corpus never does, which is what
makes the loop valid at 100 TB. The shuffle per iteration is keyed on
(cluster, dimension): k×dim groups, far finer than k, so one giant
cluster cannot straggler the update.

Deterministic: init = the k lowest-id vectors, assignment ties resolve
to the higher centroid id, and the per-dimension mean is a decimal-cast
sum (order-independent) divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_glue_spark.operators.similarity import ivf_assign, ivf_assign_expr


def _update_centroids(
    assigned: DataFrame, vec_col: str, centroids: list[list[float]]
) -> list[list[float]]:
    """Distributed mean per (cluster, dimension); empty clusters keep
    their previous centroid.

    posexplode → groupBy(cluster, dim) rather than one agg with dim
    decimal sum columns: decimal(28,10) buffers exceed the mutable
    UnsafeRow width, so the wide form falls back to sort-based
    aggregation (measured 2× slower end-to-end). The exploded rows are
    (int, int, double) triples and the map-side partial agg collapses
    each partition to k×dim rows before the exchange, so the shuffle
    moves k×dim×partitions tiny rows regardless of corpus size."""
    means = (
        assigned.select("__cid", F.posexplode(F.col(vec_col)).alias("__pos", "__v"))
        .groupBy("__cid", "__pos")
        .agg(
            (
                # float → DOUBLE → decimal: casting float straight to
                # decimal rounds via the float's short string repr,
                # which diverges from an engine that widens to double
                # first (DuckDB) — the double hop makes both identical.
                F.sum(F.col("__v").cast("double").cast("decimal(28,10)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("__m")
        )
        .collect()
    )
    new = [list(c) for c in centroids]
    for r in means:
        new[r["__cid"]][r["__pos"]] = r["__m"]
    return new


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 5,
    assigner: str = "pandas",
) -> tuple[DataFrame, list[list[float]]]:
    """Full-corpus Lloyd k-means: returns (assignments, centroids) where
    assignments carries ``id_col`` and ``cluster`` (the final nearest-
    centroid id under cosine). ``n_iter`` fixed iterations — the classic
    bounded-cost form for pipeline use.

    With ``assigner='expr'`` every step of the loop is bit-deterministic
    AND SQL-reproducible: ordered-fold cosine assignment over centroid
    literals + the decimal-cast mean — so a DuckDB oracle can replay the
    identical iterations (see pipeline_queries kmeans oracle). The
    default 'pandas' assigner is the vectorized throughput path.

    The loop input is persisted (memory-then-disk — the standard
    iterative-ML posture; at 100 TB it spills to executor-local disk)
    so the n_iter+1 assignment passes re-read cached columns instead of
    re-scanning parquet. For the expr path the cache also carries the
    float→double widened vector (exact, so per-fold element casts
    become no-ops the optimizer elides) and the l2 norm computed once —
    bit-identical to recomputing both per pass, k+1× cheaper."""
    from pyspark import StorageLevel

    if assigner == "expr":
        from hudi_glue_spark.functions.vector import l2_norm

        base = (
            df.select(
                F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
            )
            .withColumn("__nv", l2_norm(vec_col))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        def assign(d: DataFrame, v: str, c: list[list[float]]) -> DataFrame:
            return ivf_assign_expr(d, v, c, norm_col="__nv")

    else:
        base = df.select(F.col(id_col), F.col(vec_col)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        assign = ivf_assign
    try:
        init = base.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
        centroids: list[list[float]] = [list(r[1]) for r in init]
        for _ in range(n_iter):
            assigned = assign(base, vec_col, centroids)
            centroids = _update_centroids(assigned, vec_col, centroids)
        out = assign(base, vec_col, centroids).select(
            F.col(id_col), F.col("__cid").alias("cluster")
        )
        # Materialize the (id, cluster) result — tiny next to the vector
        # cache — so the loop input can be unpersisted before returning.
        out = out.localCheckpoint(eager=True)
    finally:
        base.unpersist()
    return out, centroids
