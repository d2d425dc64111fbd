"""Similarity search over embedding columns (§2b).

Baseline: brute-force cosine top-k — a broadcast cross join + ordered
window, exactly the plan you want at scale when the QUERY side is small
(queries broadcast; the corpus scan stays partition-parallel and never
shuffles). Scale path: random-hyperplane LSH bucketing cuts the scanned
candidates per query; recall is tested against the brute-force oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from hudi_glue_spark.functions.vector import cosine_similarity, dot_product
from hudi_glue_spark.plans.parallelism import ensure_parallelism


def _rows_to_matrix(vecs: pd.Series) -> np.ndarray:
    return np.array([list(v) for v in vecs], dtype=np.float64)


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rnk) with rnk 1..k, deterministic
    tie-break on neighbor_id. The queries side is broadcast — the corpus
    is scanned once, in place, with no shuffle before the per-query
    top-k (which AQE keeps as a partial top-k under the window)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__cos"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("__cos", cosine_similarity("__qv", "__cv"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for LSH (fixed seed → stable
    buckets across runs and executors)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    infer_dim: bool = False,
) -> DataFrame:
    """Attach a random-hyperplane LSH bucket id (0..2^n_planes-1):
    bit i = sign(vec · plane_i). JVM-side dot products against literal
    plane arrays — no Python, no shuffle.

    ``dim`` is REQUIRED (callers know their embedding width): bucketing
    must be a pure plan transformation — plan construction running a
    Spark job is exactly the hidden extra scan stage that hurts at
    scale. ``infer_dim=True`` opts into the one-row probe job for
    interactive use where the width genuinely isn't known."""
    if dim is None:
        if not infer_dim:
            raise ValueError(
                "lsh_bucket requires dim= (embedding width); pass "
                "infer_dim=True to explicitly allow a one-row probe job"
            )
        first = df.select(F.first(vec_col)).first()
        dim = len(first[0]) if first else 0
    planes = _hyperplanes(dim, n_planes, seed)
    return df.withColumn("__bucket", F.expr(_bucket_sql(vec_col, planes)))


def _multi_table_buckets(
    df: DataFrame, vec_col: str, n_planes: int, n_tables: int, dim: int, seed: int = 42
) -> DataFrame:
    """Explode each vector into (table_id, bucket_id) rows — one row per
    LSH table, so ALL tables join in a single shuffle-join on
    (table, bucket) instead of n_tables separate joins.

    Buckets for all tables are computed in ONE Arrow-batched pandas UDF
    (a (batch × dim) @ (dim × tables·planes) matmul): the equivalent
    pure-expression form is tables × planes × dim literal terms, whose
    codegen compile time alone dwarfs the arithmetic."""
    # (T, P, D) stacked plane tensor, deterministic per (seed, table)
    planes = np.stack(
        [np.array(_hyperplanes(dim, n_planes, seed + t)) for t in range(n_tables)]
    )
    bit_weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<int>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        x = _rows_to_matrix(vecs)  # (N, D)
        # (T, N, P) sign bits → (N, T) bucket ids
        bits = np.einsum("nd,tpd->tnp", x, planes) > 0
        ids = (bits @ bit_weights).T.astype("int32")
        return pd.Series(list(ids))

    return df.withColumn("__tb", _buckets(F.col(vec_col))).select(
        *df.columns,
        F.posexplode("__tb").alias("__table", "__bucket"),
    )


def _dbl_sql(x: float) -> str:
    """A Python float as a Spark SQL DOUBLE literal. ``repr`` emits the
    shortest round-tripping decimal and Spark's parse is correctly
    rounded, so the JVM double is bit-identical to the Python one."""
    return f"{float(x)!r}D"


def _dot_sql(vec_col: str, c: list[float]) -> str:
    """SQL text parsing to the exact expression tree of
    ``dot_product(col, lit(c))``: zip_with product, ordered double fold.

    Text form matters: building these literal-heavy folds Column-by-
    Column costs hundreds of Py4J round trips per centroid/plane set
    (measured ~0.7-1.5 s of driver time PER ASSIGNMENT PASS at k=8,
    dim=64); one ``F.expr`` parse is a single call and milliseconds."""
    arr = "array(" + ",".join(_dbl_sql(x) for x in c) + ")"
    return (
        f"aggregate(zip_with(`{vec_col}`, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )


def _bucket_sql(vec_col: str, planes: list[list[float]]) -> str:
    """One LSH table's bucket id as SQL: bit i = sign(vec · plane_i)
    via the ordered fold DuckDB's ``list_dot_product`` reproduces
    bit-for-bit, so an oracle can recompute identical buckets from
    plane literals."""
    return " + ".join(
        f"shiftleft(CAST(({_dot_sql(vec_col, plane)}) > 0 AS INT), {i})"
        for i, plane in enumerate(planes)
    )


def multi_table_buckets_expr(
    df: DataFrame, vec_col: str, n_planes: int, n_tables: int, dim: int, seed: int = 42
) -> DataFrame:
    """Expression twin of :func:`_multi_table_buckets`: same plane
    family, same (table, bucket) fan-out, but each dot product is the
    ordered JVM fold instead of a numpy matmul — bit-reproducible by
    the DuckDB oracle (numpy's BLAS/FMA association is not). Use for
    correctness gates; the pandas variant is the throughput path."""
    arr = F.expr(
        "array("
        + ",".join(
            _bucket_sql(vec_col, _hyperplanes(dim, n_planes, seed + t))
            for t in range(n_tables)
        )
        + ")"
    )
    return df.withColumn("__tb", arr).select(
        *df.columns, F.posexplode("__tb").alias("__table", "__bucket")
    )


def py_l2_norm(xs) -> float:
    """l2 norm with the exact sequential fold the JVM/SQL sides use —
    Python doubles ARE IEEE doubles, so this bit-matches l2_norm()."""
    import math

    acc = 0.0
    for v in xs:
        acc += float(v) * float(v)
    return math.sqrt(acc)


def _centroid_structs(vec_col: str, centroids: list[list[float]], norm_col: str):
    """array<struct<c: cosine, i: cid>> over literal centroids, ordered
    folds throughout — struct comparison then gives (cos, cid) ordering
    with ties to the HIGHER cid, matching the pandas variants.

    The vector norm comes from ``norm_col`` (computed ONCE in its own
    projection — higher-order folds run interpreted, and Spark's
    CollapseProject keeps non-cheap multi-referenced aliases
    materialized) and centroid norms are precomputed Python literals
    via :func:`py_l2_norm` — same bits, k+1× fewer fold evaluations.
    The whole array is ONE ``F.expr`` parse (see :func:`_dot_sql`)."""
    structs = ",".join(
        f"named_struct('c', ({_dot_sql(vec_col, c)})"
        f" / (`{norm_col}` * {_dbl_sql(py_l2_norm(c))}), 'i', {i})"
        for i, c in enumerate(centroids)
    )
    return F.expr(f"array({structs})")


def ivf_assign_expr(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    norm_col: str | None = None,
) -> DataFrame:
    """Expression twin of :func:`ivf_assign`: nearest-centroid id via
    array_max over (cosine, cid) structs — bit-reproducible in SQL.

    ``norm_col`` names a precomputed l2-norm column: iterative callers
    (k-means) stage it once in a persisted projection instead of paying
    the norm fold on every assignment pass."""
    from hudi_glue_spark.functions.vector import l2_norm

    if norm_col is not None:
        return df.withColumn(
            "__cid", F.array_max(_centroid_structs(vec_col, centroids, norm_col))["i"]
        )
    staged = df.withColumn("__nv", l2_norm(vec_col))
    return staged.withColumn(
        "__cid", F.array_max(_centroid_structs(vec_col, centroids, "__nv"))["i"]
    ).drop("__nv")


def ivf_probes_expr(
    df: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    """Expression twin of :func:`ivf_probes`: explode the ``nprobe``
    nearest centroid ids (cosine desc, cid desc)."""
    from hudi_glue_spark.functions.vector import l2_norm

    staged = df.withColumn("__nv", l2_norm(vec_col))
    ranked = F.reverse(F.array_sort(_centroid_structs(vec_col, centroids, "__nv")))
    return staged.withColumn(
        "__cid",
        F.explode(F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])),
    ).drop("__nv")


def ivf_centroids_from_matrix(
    x: np.ndarray, n_centroids: int = 16, n_iter: int = 5
) -> list[list[float]]:
    """The numpy core of IVF training (fixed-iteration Lloyd k-means,
    init = first ``n_centroids`` rows). Deterministic: same matrix →
    same centroids, no RNG — which lets the DuckDB oracle reproduce the
    exact centroid literals from the same sample rows."""
    cents = x[:n_centroids].copy()
    for _ in range(n_iter):
        # cosine assignment on normalized vectors
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents.tolist()


def ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    n_iter: int = 5,
    sample_n: int = 2048,
) -> list[list[float]]:
    """Train an IVF coarse quantizer: fixed-iteration Lloyd k-means on a
    deterministic sample (first ``sample_n`` rows by id; init = first
    ``n_centroids`` of the sample). Runs driver-side on numpy — training
    touches only the sample; the 100 TB corpus is never collected. Fully
    deterministic: same data → same centroids, no RNG."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    x = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ivf_centroids_from_matrix(x, n_centroids, n_iter)


def _centroid_cosines(vecs: pd.Series, centroids: np.ndarray) -> np.ndarray:
    """(N, C) cosine matrix, one Arrow batch at a time."""
    x = _rows_to_matrix(vecs)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    return xn @ cn.T


def ivf_assign(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Attach the nearest-centroid id (``__cid``) — argmax cosine, ties
    to the higher centroid id, deterministic. One vectorized matmul per
    Arrow batch (see ``_multi_table_buckets`` for why not literal
    expressions)."""
    cents = np.array(centroids, dtype=np.float64)

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        sims = _centroid_cosines(vecs, cents)
        # argmax returns the FIRST max; reverse columns so ties resolve
        # to the HIGHER cid (matches struct-max semantics).
        cid = cents.shape[0] - 1 - np.argmax(sims[:, ::-1], axis=1)
        return pd.Series(cid.astype("int32"))

    return df.withColumn("__cid", _assign(F.col(vec_col)))


def ivf_probes(df: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int) -> DataFrame:
    """Explode each row into its ``nprobe`` nearest centroid ids
    (``__cid``) — the query-side fan-out of IVF search."""
    cents = np.array(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def _probes(vecs: pd.Series) -> pd.Series:
        sims = _centroid_cosines(vecs, cents)
        n, c = sims.shape
        # order by cosine desc, then cid desc (lexsort: last key primary)
        order = np.lexsort((-np.arange(c)[None, :].repeat(n, 0), -sims), axis=1)
        return pd.Series(list(order[:, :nprobe].astype("int32")))

    return df.withColumn(
        "__cid", F.explode(_probes(F.col(vec_col)))
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    assigner: str = "pandas",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search: corpus vectors
    are bucketed by nearest centroid; each query probes its ``nprobe``
    nearest centroid buckets and ranks exactly within them.

    vs LSH: IVF adapts to the data distribution (centroids follow
    density), giving better candidate quality at the same fan-out. At
    100 TB the corpus side is written partitioned by ``__cid`` so a
    probe prunes partitions instead of scanning.

    ``assigner='expr'`` computes assignments/probes with ordered JVM
    folds over centroid literals (bit-reproducible by the SQL oracle);
    the default ``'pandas'`` is the vectorized throughput path."""
    cents = centroids or ivf_centroids(corpus, id_col, vec_col, n_centroids)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    )
    if assigner == "expr":
        qp = ivf_probes_expr(q, "__qv", cents, nprobe)
        cb = ivf_assign_expr(c, "__cv", cents)
    else:
        qp = ivf_probes(q, "__qv", cents, nprobe)
        cb = ivf_assign(c, "__cv", cents)
    pairs = F.broadcast(qp).join(cb, "__cid").select(
        "query_id", "__qv", "neighbor_id", "__cv"
    )
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("__cos", cosine_similarity("__qv", "__cv"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 8,
    exclude_self: bool = True,
    bucketer: str = "pandas",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Candidates = corpus vectors sharing the query's bucket in ANY of the
    ``n_tables`` tables (single join on (table, bucket), distinct), then
    exact cosine ranking within candidates. At 100 TB each query scans
    ~n_tables × corpus / 2^n_planes candidates instead of the full
    corpus; recall improves geometrically with n_tables.

    ``bucketer='expr'`` hashes with ordered JVM folds over plane
    literals (bit-reproducible by the SQL oracle); the default
    ``'pandas'`` batches all tables into one numpy matmul."""
    if dim is None:
        first = corpus.select(F.first(vec_col)).first()
        dim = len(first[0]) if first else 0
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    )
    bucket_fn = multi_table_buckets_expr if bucketer == "expr" else _multi_table_buckets
    qb = bucket_fn(q, "__qv", n_planes, n_tables, dim)
    cb = bucket_fn(c, "__cv", n_planes, n_tables, dim)
    pairs = (
        F.broadcast(qb)
        .join(cb, ["__table", "__bucket"])
        .select("query_id", "__qv", "neighbor_id", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("__cos", cosine_similarity("__qv", "__cv"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def ivf_search_indexed(
    spark,
    tbl,
    queries: DataFrame,
    id_col: str,
    k: int = 5,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF search over a PERSISTED index (`KeyedTable.build_ivf_index`):
    the corpus side reads its cell ids (``__cid``) straight from the
    table files — no assignment pass, no UDF, no fold — and the probe
    set prunes at THREE levels before any vector math runs:

    1. manifest file skipping (``read_isin``: files whose __cid min/max
       miss every probe are never opened — the index write range-
       clusters by __cid precisely so these stats are tight),
    2. parquet row-group skipping (the IN filter is pushed to the scan),
    3. the broadcast hash join on __cid.

    The probe-cell list collected driver-side is metadata-scale
    (≤ n_queries × nprobe ints). Output schema and ranking semantics are
    identical to :func:`knn_ivf` with the same centroids — which is the
    differential test: index + search must equal assign-per-query."""
    idx = tbl.vector_index()
    if idx is None or idx.get("kind") != "ivf":
        raise ValueError(
            f"no IVF index on the latest commit at {tbl.path}; "
            "run build_ivf_index() (again, after any ingest)"
        )
    cents = idx["centroids"]
    cell = idx["cell_col"]
    vec_col = idx["vec_col"]

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    qp = ivf_probes_expr(q, "__qv", cents, nprobe).withColumnRenamed("__cid", cell)
    probe_cells = sorted(
        r[0] for r in qp.select(cell).distinct().collect()
    )  # metadata-scale: bounded by n_centroids
    corpus = tbl.read_isin(spark, cell, probe_cells)
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.col(cell),
        )
    )
    pairs = F.broadcast(qp).join(c, cell).select(
        "query_id", "__qv", "neighbor_id", "__cv"
    )
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    return _rank_topk(pairs, k)


def _rank_topk(pairs: DataFrame, k: int) -> DataFrame:
    """Shared exact-cosine top-k tail: rank candidate pairs per query,
    ties to the lower neighbor id."""
    w = Window.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("__cos", cosine_similarity("__qv", "__cv"))
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def lsh_search_indexed(
    spark,
    tbl,
    queries: DataFrame,
    id_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Multi-table LSH search over a PERSISTED index
    (`KeyedTable.build_lsh_index`): the corpus side reads its bucket
    ids straight from the table files — the n_tables × n_planes
    dot-product folds per corpus row that dominate
    :func:`knn_lsh`'s per-query cost ran once at index-build time.
    Only the (tiny) query side hashes at search time, with the same
    seeded plane family, so candidates — and therefore results — are
    identical to bucket-per-query ``knn_lsh``, which is the
    differential test.

    No file skipping here, deliberately: a candidate may match in ANY
    table, so pruning by one table's bucket range would drop
    cross-table matches (unlike IVF, where ``__cid`` is the single
    authority)."""
    idx = tbl.vector_index()
    if idx is None or idx.get("kind") != "lsh":
        raise ValueError(
            f"no LSH index on the latest commit at {tbl.path}; "
            "run build_lsh_index() (again, after any ingest)"
        )
    vec_col = idx["vec_col"]
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    qb = multi_table_buckets_expr(
        q, "__qv", idx["n_planes"], idx["n_tables"], idx["dim"], idx["seed"]
    )
    corpus = tbl.read(spark)
    cb = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            F.posexplode(F.array(*[F.col(c) for c in idx["bucket_cols"]])).alias(
                "__table", "__bucket"
            ),
        )
    )
    pairs = (
        F.broadcast(qb.select("query_id", "__qv", "__table", "__bucket"))
        .join(cb, ["__table", "__bucket"])
        .select("query_id", "__qv", "neighbor_id", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    return _rank_topk(pairs, k)
