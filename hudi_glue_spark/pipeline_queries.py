"""Training-data-pipeline queries (§2b, second wave): repetition-based
quality signals, PII redaction, benchmark decontamination, deterministic
global shuffle, and sequence packing.

Fixture notes: the documents table carries no native PII, so the PII
queries plant synthetic emails/phones on the ``src0`` slice — built by
the IDENTICAL expression on both engines (the llm_queries pattern).
Decontamination treats ``src19`` as the held-out benchmark and the rest
as the training corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_glue_spark.operators import decontam as DC
from hudi_glue_spark.operators import packing as P
from hudi_glue_spark.operators import text as T
from hudi_glue_spark.operators.export import shard_id_sql
from hudi_glue_spark.plans.parallelism import ensure_parallelism
from hudi_glue_spark.queries import query, sf_tag, table


@query(
    "docs_repetition_signals",
    f"""
    SELECT doc_id,
           {T.max_word_freq_ratio_sql("text")} AS top_word_ratio,
           CAST({T.quality_score_sql("text")} >= 0.5
                AND {T.max_word_freq_ratio_sql("text")} <= 0.2
                AS BOOLEAN) AS keep
    FROM documents
    """,
)
def q_docs_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: most-repeated-word ratio plus a
    combined keep/drop verdict with the composite quality score. One
    narrow projection — the filter decision for 100 TB costs one scan."""
    # r15: widen the narrow scan (guide §2.5) — 1.01 → 0.42 s at sf0.1.
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        T.max_word_freq_ratio("text").alias("top_word_ratio"),
        ((T.quality_score("text") >= 0.5) & (T.max_word_freq_ratio("text") <= 0.2)).alias(
            "keep"
        ),
    )


_PII_DOCS_SQL = """
  SELECT doc_id,
         text || ' reach me at user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1 555-123-4567' AS text
  FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT doc_id, text FROM documents WHERE source <> 'src0'
"""


def _pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    planted = docs.filter(F.col("source") == "src0").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555-123-4567"),
        ).alias("text"),
    )
    rest = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    return planted.unionByName(rest)


@query(
    "pii_redaction",
    f"""
    SELECT doc_id,
           {T.pii_count_sql("text")} AS n_pii,
           {T.redact_pii_sql("text")} AS redacted
    FROM ({_PII_DOCS_SQL})
    """,
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus: audit count + typed-placeholder
    redaction (emails, phone-like digit runs), planted on the src0
    slice. Pure JVM regexp — no Python in the 100 TB path."""
    docs = _pii_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        T.pii_count("text").alias("n_pii"),
        T.redact_pii("text").alias("redacted"),
    )


# Real pipelines use 8-13-gram collision; the synthetic fixture draws
# from a ~30-word vocabulary, so 8-grams never collide across docs and
# 4-grams give a meaningful non-empty contamination report. The operator
# itself takes any n.
_DECONTAM_N = 4


@query(
    "benchmark_decontamination",
    f"""
    WITH bench_grams AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM documents WHERE source = 'src19')
    ),
    train_grams AS (
      SELECT doc_id, unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
      FROM documents WHERE source <> 'src19'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_grams
    FROM train_grams JOIN bench_grams USING (gram)
    GROUP BY doc_id
    """,
)
def q_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: training docs (sources ≠ src19) sharing
    any word n-gram with the benchmark slice (src19), with the distinct
    hit count. Benchmark gram set is broadcast — no shuffle of the
    corpus side except the final per-doc count."""
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    return DC.ngram_overlap(train, bench, "text", "doc_id", n=_DECONTAM_N)


@query(
    "decontaminated_corpus",
    f"""
    WITH bench_grams AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM documents WHERE source = 'src19')
    ),
    hits AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM documents WHERE source <> 'src19') tg
      JOIN bench_grams USING (gram)
    )
    SELECT doc_id, source FROM documents
    WHERE source <> 'src19' AND doc_id NOT IN (SELECT doc_id FROM hits)
    """,
)
def q_decontaminated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus AFTER decontamination (decontaminate() = left-anti
    join against the overlap report) — the companion to
    benchmark_decontamination, which returns the report itself."""
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    return DC.decontaminate(train, bench, n=_DECONTAM_N).select("doc_id", "source")


@query(
    "global_shuffle_order",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('seed42:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def q_global_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: sort by a seeded
    hash of the key. Materializing an explicit rank is the oracle-
    checkable form; at 100 TB the engine instead range-partitions on the
    hash itself at write time (same order, no global window) — the sort
    here IS Spark's distributed range-partition sort, the single-point
    window only ranks within already-sorted partitions."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    w = Window.orderBy(h, "doc_id")
    return docs.select(
        "doc_id", F.row_number().over(w).cast("long").alias("shuffle_pos")
    )


_PACK_BUDGET = 256


@query(
    "sequence_pack_chunks",
    f"""
    SELECT doc_id, source, n_tokens,
           CAST(floor(CAST(cum_before AS DOUBLE) / {_PACK_BUDGET}) AS INTEGER)
             AS chunk_id
    FROM (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS cum_before
      FROM (SELECT doc_id, source,
                   CAST(len({T.words_sql("text")}) AS BIGINT) AS n_tokens
            FROM documents)
    )
    """,
)
def q_sequence_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the pretraining norm): which
    256-token context window each document starts in, packed per source
    shard in doc_id order. Window running-sum per shard — one hash
    shuffle on the shard key, no global funnel."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count("text").cast("long").alias("n_tokens")
    )
    packed = P.chunk_pack(
        docs, "n_tokens", "source", "doc_id", _PACK_BUDGET
    )
    return packed.select("doc_id", "source", "n_tokens", "chunk_id")


@query(
    "stream_text_pipeline",
    f"""
    SELECT doc_id,
           {T.pii_count_sql("text")} AS n_pii,
           {T.quality_score_sql("text")} AS quality,
           {T.lang_id_sql("text")} AS lang_pred
    FROM documents
    """,
)
def q_stream_text_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-ingest text pipeline run as a STREAM: documents arrive
    through a file stream (availableNow), the stateless JVM projection
    (PII audit, quality score, language ID) rides each micro-batch in
    append mode — the continuous-ingest form of the batch text queries,
    checked against the identical batch oracle."""
    import os as _os
    import shutil as _shutil

    from hudi_glue_spark.streaming.ingest import run_to_memory
    from hudi_glue_spark.streaming.sources import stream_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = f"/tmp/hudi_glue_spark_stream_textpipe_{sf_tag(sf_dir)}"
    _shutil.rmtree(wd, ignore_errors=True)
    _os.makedirs(wd)
    docs = stream_table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        T.pii_count("text").alias("n_pii"),
        T.quality_score("text").alias("quality"),
        T.lang_id("text").alias("lang_pred"),
    )
    return run_to_memory(spark, out, f"{wd}/ckpt", output_mode="append")


@query(
    "source_median_tokens_udaf",
    f"""
    SELECT source,
           quantile_cont(n_tokens, 0.5) AS median_tokens,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM (SELECT source, CAST(len({T.words_sql("text")}) AS BIGINT) AS n_tokens
          FROM documents)
    GROUP BY source
    """,
)
def q_source_median_tokens_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF surface, §2a #32): exact
    median token count per source via an Arrow-batched Series→scalar
    aggregate. Median is an order statistic — no float summation order
    to diverge — so the UDAF is EXACT against the SQL oracle. One hash
    shuffle on the group key, Arrow both ways."""
    from hudi_glue_spark.functions.udaf import count_udaf, median_udaf

    docs = table(spark, sf_dir, "documents").select(
        "source", T.token_count("text").cast("long").alias("n_tokens")
    )
    return docs.groupBy("source").agg(
        median_udaf("n_tokens").alias("median_tokens"),
        count_udaf("n_tokens").alias("n_docs"),
    )


_WIN_SIZE, _WIN_STRIDE = 32, 16


@query(
    "sliding_token_windows",
    f"""
    SELECT doc_id, CAST(s - 1 AS INTEGER) AS win_start,
           array_to_string(w[s : s + {_WIN_SIZE - 1}], ' ') AS win_text
    FROM (
      SELECT doc_id, w,
             unnest(range(1, greatest(len(w) - {_WIN_SIZE - 1}, 1) + 1,
                          {_WIN_STRIDE})) AS s
      FROM (SELECT doc_id, {T.words_sql("text")} AS w FROM documents)
    )
    """,
)
def q_sliding_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context windows over each document (size 32, stride 16)
    — the long-document chunker for embedding/training pipelines. Pure
    JVM: sequence → slice → explode, no shuffle, no Python; an
    equivalent Python arrow-UDTF lives in operators/windows.py for the
    row-generating-UDF surface and is equality-tested against this
    plan."""
    from hudi_glue_spark.operators.windows import sliding_token_windows

    docs = table(spark, sf_dir, "documents")
    return sliding_token_windows(
        docs, "doc_id", "text", size=_WIN_SIZE, stride=_WIN_STRIDE
    )


@query(
    "vocab_top_terms",
    f"""
    SELECT term, n_occurrences, n_docs FROM (
      SELECT term,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             row_number() OVER (ORDER BY count(*) DESC, term) AS rnk
      FROM (SELECT doc_id, unnest({T.words_sql("text")}) AS term FROM documents)
      GROUP BY term
    ) WHERE rnk <= 50
    """,
)
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: top-50 terms by collection frequency
    with document frequency — the tokenizer/BPE-prep pass. Pure integer
    counts (no tf-idf logs, which are not bit-portable across engines);
    explode is map-side, the term agg is the only shuffle, and the
    top-50 is a tiny sorted tail."""
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(T.words("text")).alias("term")
    )
    counts = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 50)
        .select("term", "n_occurrences", "n_docs")
    )


@query(
    "fixed_size_eval_sample",
    """
    SELECT doc_id, source FROM documents
    ORDER BY md5('eval1:' || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
)
def q_fixed_size_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-N deterministic sample (eval-set drawing): global order by
    seeded key hash, take N — same 100 docs on every engine, every run,
    any partitioning. The sort is Spark's distributed range sort with an
    early LIMIT pushdown (TakeOrderedAndProject), so only N rows ever
    reach the driver side of the plan."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("eval1:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "source")
        .orderBy(h, "doc_id")
        .limit(100)
    )


_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}


def _mix_where() -> str:
    from hudi_glue_spark.operators.sampling import resample_by_weights_sql

    return resample_by_weights_sql(
        "doc_id", "source", _MIX_WEIGHTS, default=0.75, salt="mix1"
    )


@query(
    "domain_mix_resample",
    f"""
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents WHERE {_mix_where()}
    GROUP BY source
    """,
)
def q_domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining domain mixing: per-source keep probabilities applied
    via the deterministic key hash (re-weighting a domain upward only
    adds rows — membership is stable). The check counts survivors per
    source; the filter itself is shuffle-free at any corpus size."""
    from hudi_glue_spark.operators.sampling import resample_by_weights

    docs = table(spark, sf_dir, "documents")
    kept = resample_by_weights(
        docs, "doc_id", "source", _MIX_WEIGHTS, default=0.75, salt="mix1"
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


_KM_K, _KM_ITER = 8, 3

#: cosine of a vector column against a centroid-list column, ordered
#: folds — the association cosine_similarity uses (dot / (|a| * |b|)).
_KM_COS = (
    "list_dot_product(e.v, c.cv)"
    " / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv)))"
)


def _kmeans_assign_sql(k: int = _KM_K, n_iter: int = _KM_ITER) -> str:
    """The WITH-chain replaying kmeans_lloyd(assigner='expr') in SQL up
    to ``afinal(vec_id, cid)`` (+ ``e(vec_id, v)``): every iteration is
    assignment (ordered-fold cosine, ties to the higher cid) + a
    decimal-cast per-(cluster, dim) mean — both bit-deterministic, so
    the unrolled CTE chain lands on the identical final clustering.
    Callers append their own final SELECT (cluster counts; the
    semantic-dedup survivor filter)."""
    steps = []
    prev = "c0"
    for i in range(1, n_iter + 1):
        steps.append(
            f"""
    a{i} AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_COS} DESC, c.cid DESC) AS rn
        FROM e CROSS JOIN {prev} c
      ) WHERE rn = 1
    ),
    m{i} AS (
      SELECT cid, pos,
             CAST(sum(CAST(val AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS m
      FROM (SELECT cid, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM a{i})
      GROUP BY cid, pos
    ),
    c{i} AS (
      SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
      FROM {prev} p LEFT JOIN (
        SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid
      ) u ON u.cid = p.cid
    )"""
        )
        prev = f"c{i}"
    chain = ",".join(steps)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             v AS cv
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
    ),{chain},
    afinal AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_KM_COS} DESC, c.cid DESC) AS rn
        FROM e CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""


def _kmeans_oracle_sql(k: int = _KM_K, n_iter: int = _KM_ITER) -> str:
    return (
        _kmeans_assign_sql(k, n_iter)
        + """
    SELECT CAST(cid AS INTEGER) AS cluster,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM afinal GROUP BY cid
    """
    )


@query("kmeans_embedding_clusters", _kmeans_oracle_sql())
def q_kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embeddings table: per-cluster
    sizes after 3 full-corpus iterations. The update step shuffles on
    (cluster, dimension) and never collects the corpus; with the
    ordered-fold assigner the whole loop is bit-deterministic, so the
    oracle replays the identical iterations as unrolled SQL CTEs —
    a value-EXACT check of an iterative distributed algorithm."""
    from hudi_glue_spark.operators.clustering import kmeans_lloyd

    emb = table(spark, sf_dir, "embeddings")
    assigned, _cents = kmeans_lloyd(
        emb, "vec_id", "embedding", k=_KM_K, n_iter=_KM_ITER, assigner="expr"
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )


_SEMDEDUP_TH = 0.4


@query(
    "semantic_dedup_survivors",
    _kmeans_assign_sql()
    + f""",
    av AS (
      SELECT f.vec_id, f.cid, e.v FROM afinal f JOIN e USING (vec_id)
    ),
    rem AS (
      SELECT DISTINCT b.vec_id
      FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= {_SEMDEDUP_TH}
    )
    SELECT f.vec_id, CAST(f.cid AS INTEGER) AS cluster
    FROM afinal f
    WHERE f.vec_id NOT IN (SELECT vec_id FROM rem)
    """,
)
def q_semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    remove near-duplicates WITHIN each cluster only — the scale path
    for semantic dedup, replacing the all-pairs cosine join with
    k-means cells so the pairwise step is bounded by the largest cell,
    not the corpus. Pure composition of certified pieces: the
    bit-deterministic expr-assigner k-means (the kmeans row's oracle
    CTEs replay it exactly) + the within-block cosine pair operator
    (embedding_near_dup's ordered-fold cosine, bit-identical to
    DuckDB's list_dot_product). Survivor rule: a vector is removed
    when a SMALLER-id vector in its cell is >= threshold cosine —
    deterministic, no transitive chaining."""
    from hudi_glue_spark.operators import dedup as D
    from hudi_glue_spark.operators.clustering import kmeans_lloyd

    emb = table(spark, sf_dir, "embeddings")
    assigned, _cents = kmeans_lloyd(
        emb, "vec_id", "embedding", k=_KM_K, n_iter=_KM_ITER, assigner="expr"
    )
    with_vec = assigned.join(emb.select("vec_id", "embedding"), "vec_id")
    pairs = D.embedding_near_dup_pairs(
        with_vec, "vec_id", "embedding", "cluster", threshold=_SEMDEDUP_TH
    )
    removed = pairs.select(F.col("b_id").alias("vec_id")).distinct()
    return assigned.join(removed, "vec_id", "left_anti").select(
        "vec_id", F.col("cluster").cast("int").alias("cluster")
    )


@query(
    "sequence_pack_greedy",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, source,
             CAST(len({T.words_sql("text")}) AS BIGINT) AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ),
    -- replay the first-fit state machine breadth-first: step i advances
    -- every source shard to its i-th document (sequential within a
    -- shard, parallel across shards — exactly what applyInPandas does)
    rec AS (
      SELECT source, rn, doc_id, n_tokens,
             0 AS bin_id, n_tokens AS bin_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN r.bin_tokens > 0
                       AND r.bin_tokens + d.n_tokens > {_PACK_BUDGET}
                  THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.bin_tokens > 0
                       AND r.bin_tokens + d.n_tokens > {_PACK_BUDGET}
                  THEN d.n_tokens ELSE r.bin_tokens + d.n_tokens END
      FROM rec r JOIN d ON d.source = r.source AND d.rn = r.rn + 1
    )
    SELECT doc_id, source, n_tokens, CAST(bin_id AS INTEGER) AS bin_id
    FROM rec
    """,
)
def q_sequence_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit greedy whole-document packing (the SFT norm) per source
    shard — sequential bin state, so applyInPandas per shard. The
    oracle replays the same state machine as a recursive CTE (one
    recursion step per document position, all shards in parallel), so
    even this inherently-sequential operator is value-EXACT; capacity/
    tightness invariants stay asserted in tests/test_pipeline_ops.py."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count("text").cast("long").alias("n_tokens")
    )
    packed = P.greedy_pack(docs, "n_tokens", "source", "doc_id", _PACK_BUDGET)
    return packed.select("doc_id", "source", "n_tokens", "bin_id")


@query(
    "incremental_dedup_vs_corpus",
    f"""
    WITH corpus_fp AS (
      SELECT {T.doc_fingerprint_sql("text")} AS fingerprint FROM documents
    ),
    batch AS (
      SELECT doc_id + 1000000 AS doc_id, source,
             CASE WHEN doc_id % 40 = 0 THEN text
                  ELSE text || ' fresh suffix xyz' END AS text
      FROM documents WHERE source = 'src0'
    ),
    batch_fp AS (
      SELECT doc_id, source, {T.doc_fingerprint_sql("text")} AS fingerprint
      FROM batch
    )
    SELECT doc_id, source, fingerprint FROM batch_fp
    WHERE fingerprint NOT IN (SELECT fingerprint FROM corpus_fp)
    """,
)
def q_incremental_dedup_vs_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a NEW batch is deduped against the
    EXISTING corpus by content fingerprint (anti-join), without ever
    re-deduping the corpus against itself — the shape every growing
    training corpus needs. Here ~half the batch duplicates corpus
    docs (doc_id % 40 == 0 — src0 ids are all multiples of 20, so a
    %2 split would be degenerate) and the rest carries fresh text.

    At 100 TB the corpus side of the anti-join should come from a
    stored fingerprint column/index (one narrow column scan, one
    fingerprint-keyed shuffle) rather than recomputing from text — the
    join shape is identical; this query recomputes because the fixture
    stores no fingerprint column."""
    docs = table(spark, sf_dir, "documents")
    corpus_fp = docs.select(T.doc_fingerprint("text").alias("fingerprint"))
    batch = (
        docs.filter(F.col("source") == "src0")
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "source",
            F.when(F.col("doc_id") % 40 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" fresh suffix xyz")))
            .alias("text"),
        )
    )
    batch_fp = batch.select(
        "doc_id", "source", T.doc_fingerprint("text").alias("fingerprint")
    )
    return batch_fp.join(corpus_fp, "fingerprint", "left_anti").select(
        "doc_id", "source", "fingerprint"
    )


@query(
    "quality_quantile_filter",
    f"""
    SELECT doc_id, source, quality,
           CAST(pr AS DOUBLE) AS quality_pctl
    FROM (
      SELECT doc_id, source, quality,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY quality, doc_id) AS pr
      FROM (SELECT doc_id, source,
                   {T.quality_score_sql("text")} AS quality
            FROM documents)
    ) WHERE pr >= 0.5
    """,
)
def q_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-quantile curation: keep each source's top
    half by quality score (percent_rank with a doc_id tie-break so the
    cut is a total order). Quantile-relative filtering is how real
    pipelines set per-domain quality bars — an absolute threshold
    over-prunes clean domains and under-prunes noisy ones. One window
    over one source-keyed shuffle; the score itself is JVM expressions."""
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", T.quality_score("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        scored.withColumn("quality_pctl", F.percent_rank().over(w).cast("double"))
        .filter(F.col("quality_pctl") >= 0.5)
    )


_CURATE_QUALITY_MIN = 0.45


@query(
    "curation_pipeline_end_to_end",
    f"""
    WITH fp AS (
      SELECT doc_id, source, text, {T.doc_fingerprint_sql("text")} AS fp
      FROM documents WHERE source <> 'src19'
    ),
    dedup AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               min(doc_id) OVER (PARTITION BY fp) AS keep_id
        FROM fp
      ) WHERE doc_id = keep_id
    ),
    qual AS (
      SELECT * FROM dedup WHERE {T.quality_score_sql("text")} >= {_CURATE_QUALITY_MIN}
    ),
    bench_grams AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM documents WHERE source = 'src19')
    ),
    hits AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM qual) tg
      JOIN bench_grams USING (gram)
    ),
    clean AS (
      SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    )
    SELECT {shard_id_sql("doc_id", 8)} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(len({T.words_sql("text")})) AS BIGINT) AS n_tokens
    FROM clean GROUP BY 1
    """,
)
def q_curation_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE composed dataflow — exact dedup
    (fingerprint, min-id survivor) → quality gate (composite score ≥
    0.45) → benchmark decontamination (src19 n-gram anti-join) → shard
    assignment for the training export — with per-shard doc/key/token
    audits value-exact against an oracle replaying every stage. Each
    stage is the registered operator other queries check in isolation;
    this query proves they COMPOSE: one plan, no driver round-trips
    between stages, and the CORPUS crosses only three shuffles
    (fingerprint window, gram-hit count, final shard agg) regardless of
    size — the benchmark side is small-side aggregation plus broadcasts
    (gram set into the join, hit list into the anti-join)."""
    from hudi_glue_spark.operators import dedup as D
    from hudi_glue_spark.operators.export import shard_id

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    deduped = D.exact_dedup(train, "doc_id", "text")
    qual = deduped.filter(T.quality_score("text") >= _CURATE_QUALITY_MIN)
    clean = DC.decontaminate(qual, bench, n=_DECONTAM_N)
    return clean.withColumn("shard", shard_id("doc_id", 8)).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.sum(T.token_count("text").cast("long")).alias("n_tokens"),
    )


# -- range-clustered curated output + pruned scans ---------------------------

#: fixed slice literals for the pruned-scan demo (source src3 and a
#: mid-range quality band, both present at every SF)
_CURATED_SRC = 3
_CURATED_Q_LO, _CURATED_Q_HI = 0.60, 0.68

_CURATED_CACHE: dict = {}


def _curated_table(spark: SparkSession, sf_dir: str):
    """The curation pipeline's CLEAN output (dedup → quality ≥ 0.45 →
    decontam) persisted as a KeyedTable and z-order clustered on
    (src_num, quality) with both columns in stats_cols — the layout a
    training-export table needs so downstream per-source and
    per-quality-band reads skip files instead of scanning the corpus.
    ``src_num`` is the numeric rank of the source label (zorder
    quantizes numerically; the string column rides along for output)."""
    import os
    import shutil

    from hudi_glue_spark.operators import dedup as D
    from hudi_glue_spark.table import KeyedTable

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = f"/tmp/hudi_glue_spark_scn_curated_{sf_tag(sf_dir)}"
    cached = _CURATED_CACHE.get(root)
    if cached is not None and cached.exists():
        return cached
    shutil.rmtree(root, ignore_errors=True)
    tbl = KeyedTable(
        root,
        key="doc_id",
        precombine="doc_id",
        stats_cols=["src_num", "quality"],
    )
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    train = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    deduped = D.exact_dedup(train, "doc_id", "text")
    qual = deduped.withColumn("quality", T.quality_score("text")).filter(
        F.col("quality") >= _CURATE_QUALITY_MIN
    )
    clean = DC.decontaminate(qual, bench, n=_DECONTAM_N)
    out = clean.select(
        "doc_id",
        "source",
        F.regexp_extract("source", r"(\d+)$", 1).cast("int").alias("src_num"),
        "quality",
        T.token_count("text").cast("long").alias("n_tokens"),
    )
    # scatter first (every file spans both dimensions), then let
    # optimize(zorder_by=...) produce the clustered layout — the same
    # two-step a live table goes through (ingest happens unclustered;
    # clustering is a maintenance commit)
    tbl.bulk_insert(out.repartition(8))
    cid = tbl.optimize(
        spark,
        target_file_mb=0.002,
        small_file_mb=10,
        zorder_by=["src_num", "quality"],
    )
    assert cid is not None, "curated table must compact+cluster"
    _CURATED_CACHE[root] = tbl
    return tbl


@query(
    "curated_pruned_scan",
    f"""
    WITH fp AS (
      SELECT doc_id, source, text, {T.doc_fingerprint_sql("text")} AS fp
      FROM documents WHERE source <> 'src19'
    ),
    dedup AS (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               min(doc_id) OVER (PARTITION BY fp) AS keep_id
        FROM fp
      ) WHERE doc_id = keep_id
    ),
    qual AS (
      SELECT * FROM (
        SELECT doc_id, source, text,
               {T.quality_score_sql("text")} AS quality
        FROM dedup
      ) WHERE quality >= {_CURATE_QUALITY_MIN}
    ),
    bench_grams AS (
      SELECT DISTINCT gram
      FROM (SELECT unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM documents WHERE source = 'src19')
    ),
    hits AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, unnest({DC.shingles_sql("text", _DECONTAM_N)}) AS gram
            FROM qual) tg
      JOIN bench_grams USING (gram)
    ),
    clean AS (
      SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM hits)
    )
    SELECT
      CAST((SELECT count(*) FROM clean
            WHERE source = 'src{_CURATED_SRC}') AS BIGINT) AS n_src,
      CAST((SELECT coalesce(sum(doc_id), 0) FROM clean
            WHERE source = 'src{_CURATED_SRC}') AS BIGINT) AS sum_src,
      CAST((SELECT count(*) FROM clean
            WHERE quality BETWEEN {_CURATED_Q_LO} AND {_CURATED_Q_HI})
        AS BIGINT) AS n_qslice,
      CAST((SELECT coalesce(sum(doc_id), 0) FROM clean
            WHERE quality BETWEEN {_CURATED_Q_LO} AND {_CURATED_Q_HI})
        AS BIGINT) AS sum_qslice,
      TRUE AS src_scan_pruned,
      TRUE AS q_scan_pruned
    """,
)
def q_curated_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scans over the PIPELINE'S OWN OUTPUT (not a synthetic
    fixture): the curated corpus is persisted z-order clustered on
    (src_num, quality), and this query reads a single source and a
    narrow quality band through the manifest-pruning APIs — counts and
    key-sums must match the oracle's replay of the whole pipeline, and
    the booleans assert each slice physically opened FEWER FILES than
    the table holds (computed from the real pruned file sets). This is
    the 100 TB access pattern for a training-export table: per-domain
    and per-quality-band reads are file-skipping scans, not corpus
    scans, because z-ordering keeps per-file min/max tight in BOTH
    dimensions."""
    tbl = _curated_table(spark, sf_dir)

    from hudi_glue_spark.table import manifest as M

    n_files = len(M.read_manifest(tbl.path).files)
    src = tbl.read_isin(spark, "src_num", [_CURATED_SRC])
    qsl = tbl.read_range(spark, "quality", _CURATED_Q_LO, _CURATED_Q_HI)
    src_row = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("s"),
    ).first()
    q_row = qsl.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("s"),
    ).first()
    return spark.createDataFrame(
        [
            (
                src_row["n"],
                src_row["s"],
                q_row["n"],
                q_row["s"],
                len(tbl.files_isin("src_num", [_CURATED_SRC])) < n_files,
                len(tbl.files_in_range("quality", _CURATED_Q_LO, _CURATED_Q_HI))
                < n_files,
            )
        ],
        "n_src long, sum_src long, n_qslice long, sum_qslice long, "
        "src_scan_pruned boolean, q_scan_pruned boolean",
    )


# -- C4-style rule filters ---------------------------------------------------

#: rule thresholds (C4/Gopher-style document filters, tuned to be
#: discriminative on the fixture: each rule fails a real slice)
_C4_MIN_WORDS, _C4_MAX_WORDS = 15, 1000
_C4_MWL_LO, _C4_MWL_HI = 3.0, 10.0
_C4_MIN_STOPWORD = 0.02
_C4_MAX_REPETITION = 0.12
_C4_MAX_DIGIT = 0.2


@query(
    "c4_rule_filters",
    f"""
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           keep_len, keep_mean_wl, keep_stopword, keep_repetition,
           keep_digits,
           (keep_len AND keep_mean_wl AND keep_stopword
            AND keep_repetition AND keep_digits) AS keep
    FROM (
      SELECT doc_id,
             len({T.words_sql("text")}) AS n_words,
             len({T.words_sql("text")})
               BETWEEN {_C4_MIN_WORDS} AND {_C4_MAX_WORDS} AS keep_len,
             {T.mean_word_len_sql("text")}
               BETWEEN {_C4_MWL_LO} AND {_C4_MWL_HI} AS keep_mean_wl,
             {T.stopword_ratio_sql("text")} >= {_C4_MIN_STOPWORD}
               AS keep_stopword,
             {T.max_word_freq_ratio_sql("text")} <= {_C4_MAX_REPETITION}
               AS keep_repetition,
             {T.digit_ratio_sql("text")} <= {_C4_MAX_DIGIT} AS keep_digits
      FROM documents
    )
    """,
)
def q_c4_rule_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style rule-based document filtering as an auditable
    rule MATRIX, not just a verdict: per document, one boolean per rule
    (length band, mean word length band, stopword floor, repetition
    ceiling, digit ceiling) plus the conjunction — the shape real
    curation pipelines ship, because per-rule booleans let you measure
    each rule's kill rate and ablate rules without recomputing. All
    signals are single-pass JVM expressions over the scan (no shuffle,
    no Python); at 100 TB this is a map-only pass that rides whatever
    scan comes next."""
    # r15: widen the narrow scan so the per-row rule expressions spread
    # over the cores — no-op at real scale (guide §2.5). 1.00 → 0.25 s.
    docs = ensure_parallelism(table(spark, sf_dir, "documents"))
    n = T.token_count("text")
    keep_len = (n >= _C4_MIN_WORDS) & (n <= _C4_MAX_WORDS)
    mwl = T.mean_word_len("text")
    keep_mwl = (mwl >= _C4_MWL_LO) & (mwl <= _C4_MWL_HI)
    keep_stop = T.stopword_ratio("text") >= _C4_MIN_STOPWORD
    keep_rep = T.max_word_freq_ratio("text") <= _C4_MAX_REPETITION
    keep_dig = T.digit_ratio("text") <= _C4_MAX_DIGIT
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        keep_len.alias("keep_len"),
        keep_mwl.alias("keep_mean_wl"),
        keep_stop.alias("keep_stopword"),
        keep_rep.alias("keep_repetition"),
        keep_dig.alias("keep_digits"),
        (keep_len & keep_mwl & keep_stop & keep_rep & keep_dig).alias("keep"),
    )


# -- segment-level (paragraph) dedup with reassembly -------------------------

#: words per segment — the "paragraph" unit of the fixture's
#: unpunctuated text (real corpora would split on blank lines instead)
_SEG_W = 10


@query(
    "segment_dedup_reassembled",
    f"""
    WITH w AS (
      SELECT doc_id, {T.words_sql("text")} AS ws FROM documents
    ),
    segs AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(ws[(i*{_SEG_W}+1):((i+1)*{_SEG_W})], ' ') AS seg
      FROM w, unnest(range(0, CAST(ceil(len(ws) / {_SEG_W}.0) AS BIGINT)))
             AS t(i)
    ),
    ranked AS (
      SELECT doc_id, pos, seg,
             row_number() OVER (PARTITION BY seg
                                ORDER BY doc_id, pos) AS rn
      FROM segs
    ),
    kept AS (SELECT doc_id, pos, seg FROM ranked WHERE rn = 1)
    SELECT k.doc_id,
           CAST(t.n_segs AS BIGINT) AS n_segs,
           CAST(count(*) AS BIGINT) AS n_kept,
           md5(string_agg(k.seg, ' ' ORDER BY k.pos)) AS new_fp
    FROM kept k
    JOIN (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id) t
      USING (doc_id)
    GROUP BY k.doc_id, t.n_segs
    """,
)
def q_segment_dedup_reassembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide SEGMENT-level dedup with document reassembly — the
    RefinedWeb/Gopher "remove repeated paragraphs across the corpus"
    operation (exact-substring dedup at paragraph granularity): every
    {_SEG_W}-word segment keeps only its first global occurrence
    (ordered by doc_id, then position); each document is rebuilt from
    its surviving segments and fingerprinted. Documents whose every
    segment is a duplicate vanish — that IS the dedup.

    100 TB shape (see :func:`operators.dedup.segment_dedup`): the dedup
    decision shuffles only (md5(seg), doc_id, pos) — never segment
    text; the winning positions shuffle back by doc_id and the text is
    RE-SLICED from the original document at reassembly, so full text
    crosses the wire zero times. One explode, two narrow shuffles, one
    doc-keyed shuffled-hash join (no-broadcast contract)."""
    from hudi_glue_spark.operators.dedup import segment_dedup

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return segment_dedup(docs, "doc_id", "text", w=_SEG_W)
