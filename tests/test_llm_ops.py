"""Unit tests for the §2b LLM-pipeline operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hudi_glue_spark.operators import dedup as D
from hudi_glue_spark.operators import multimodal as MM
from hudi_glue_spark.operators import similarity as S
from hudi_glue_spark.operators import text as T


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [Row(t="one two  three"), Row(t=""), Row(t="   "), Row(t="x")]
    )
    got = [r[0] for r in df.select(T.token_count("t")).collect()]
    assert got == [3, 0, 0, 1]


def test_quality_score_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select(T.quality_score("text").alias("q")).agg(
        F.min("q"), F.max("q")
    ).first()
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat and the dog is here"),
            Row(t="der hund und die katze ist"),
            Row(t="le chien et la maison est"),
            Row(t="zzz yyy xxx"),
        ]
    )
    got = [r[0] for r in df.select(T.lang_id("t")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [Row(t="Hello   World"), Row(t="  hello world "), Row(t="other")]
    )
    fps = [r[0] for r in df.select(T.doc_fingerprint("t")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_exact_dedup_keeps_min(spark):
    df = spark.createDataFrame(
        [Row(id=3, text="same doc"), Row(id=1, text="same  DOC"), Row(id=2, text="diff")]
    )
    kept = {r.id for r in D.exact_dedup(df, "id", "text").collect()}
    assert kept == {1, 2}


def test_shingles(spark):
    df = spark.createDataFrame([Row(t="a b c d")])
    got = df.select(D.shingles("t", 3).alias("s")).first().s
    assert sorted(got) == ["a b c", "b c d"]


def test_minhash_lsh_finds_planted_dups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("source = 'src0'")
    near = docs.withColumn("doc_id", F.col("doc_id") + 1000000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" qq1 qq2"))
    )
    u = docs.unionByName(near)
    pairs = D.minhash_lsh_pairs(u, "doc_id", "text", num_hashes=16, bands=4, threshold=0.7)
    found = {(r.a_id, r.b_id) for r in pairs.collect()}
    planted = {(r.doc_id, r.doc_id + 1000000) for r in docs.select("doc_id").collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, f"LSH recall {recall} on planted near-dups"


def test_dedup_keep_list_transitive(spark):
    df = spark.createDataFrame([Row(id=i, v="x") for i in [1, 2, 3, 9]])
    pairs = spark.createDataFrame(
        [Row(a_id=1, b_id=2, jaccard=0.9), Row(a_id=2, b_id=3, jaccard=0.9)]
    )
    kept = {r.id for r in D.dedup_keep_list(pairs, df, "id").collect()}
    assert kept == {1, 9}


def test_dedup_keep_list_fixpoint_vs_one_hop(spark):
    """The star 1–3, 2–3 through the highest id: one-hop keeps the
    spurious 2 (its only neighbor is larger); the fixpoint keeps only
    the component min. Unpaired rows survive in both."""
    df = spark.createDataFrame([Row(id=i, v="x") for i in [1, 2, 3, 9]])
    pairs = spark.createDataFrame(
        [Row(a_id=1, b_id=3, jaccard=0.9), Row(a_id=2, b_id=3, jaccard=0.9)]
    )
    one_hop = {r.id for r in D.dedup_keep_list(pairs, df, "id").collect()}
    fix = {
        r.id for r in D.dedup_keep_list(pairs, df, "id", iterations=None).collect()
    }
    assert one_hop == {1, 2, 9}
    assert fix == {1, 9}


def test_chain_fixpoint_query_differs_from_one_hop(spark, sf_dir):
    """The registered dedup_chain_fixpoint fixture must actually
    exercise the gap: one-hop collapse keeps strictly more survivors
    than the fixpoint on the planted orig–B, A–B stars."""
    from hudi_glue_spark.llm_queries import q_dedup_chain_fixpoint, _chain_suffix
    from hudi_glue_spark.queries import table

    fix_ids = {r.doc_id for r in q_dedup_chain_fixpoint(spark, sf_dir).collect()}

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("source") == "src0")
        .select("doc_id", "text", "source")
    )
    base = docs.withColumn(
        "__j",
        F.expr(
            "size(array_distinct(filter(split(text, '\\\\s+'), x -> x != ''))) div 4 + 1"
        ),
    ).withColumn("__j2", F.expr("__j div 2"))
    a = base.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", _chain_suffix(F.col("__j"))).alias("text"),
        "source",
    )
    b = base.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", _chain_suffix(F.col("__j2"))).alias("text"),
        "source",
    )
    corpus = docs.unionByName(a).unionByName(b)
    w = corpus.select(
        "doc_id", "source", F.array_distinct(T.words("text")).alias("ws")
    )
    pairs = D.jaccard_pairs(w, "doc_id", "ws", "source", threshold=0.8)
    one_hop_ids = {
        r.doc_id
        for r in D.dedup_keep_list(pairs, corpus, "doc_id").select("doc_id").collect()
    }
    assert fix_ids < one_hop_ids  # strictly fewer survivors at fixpoint


def test_simhash_near_dup_small_hamming(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, t="alpha beta gamma delta epsilon zeta eta theta"),
            Row(id=2, t="alpha beta gamma delta epsilon zeta eta iota"),
            Row(id=3, t="totally different words entirely unrelated content here now"),
        ]
    )
    sh = df.select("id", D.simhash("t").alias("s")).collect()
    by_id = {r.id: r.s for r in sh}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(by_id[1], by_id[2]) < ham(by_id[1], by_id[3])


def test_knn_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id < 20")
    exact = S.knn_bruteforce(queries, emb, "vec_id", "embedding", k=5)
    approx = S.knn_lsh(queries, emb, "vec_id", "embedding", k=5, n_planes=4, n_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # near-uniform random embeddings are LSH's worst case; multi-table
    # (8 tables × 4 planes) still must beat random candidate sampling
    # (≈50% of the corpus → would give ~0.5 expected recall) clearly.
    assert recall >= 0.6, f"LSH knn recall {recall}"


def test_knn_excludes_self(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = S.knn_bruteforce(emb.filter("vec_id < 3"), emb, "vec_id", "embedding", k=3)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_media_meta_extract_schema_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payload = MM.text_as_payload(docs, "doc_id", "text")
    out = MM.extract_media_meta(payload)
    rows = out.collect()
    assert out.columns == ["doc_id", "byte_len", "checksum", "fake_width", "fake_height"]
    assert all(1 <= r.fake_width <= 512 and 1 <= r.fake_height <= 512 for r in rows)
    # deterministic across runs
    rows2 = MM.extract_media_meta(payload).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_decode_image_parses_real_headers(spark, sf_dir):
    """decode_image parses genuine PNG bytes (zlib IDAT, CRC chunks),
    minimal JFIF streams, GIF — and yields NULLs for junk."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    payload = MM.encode_test_images(docs, "doc_id")
    out = {r.doc_id: r for r in MM.decode_image(payload).collect()}
    for i, r in out.items():
        assert r.format == ("png" if i % 2 == 0 else "jpeg")
        assert r.width == 1 + i % 64 and r.height == 1 + (i * 7) % 64
        assert r.channels == (1 if i % 2 == 0 else 3)

    # direct parser edges: GIF + junk + truncation
    assert MM.parse_image_header(
        b"GIF89a" + (37).to_bytes(2, "little") + (21).to_bytes(2, "little")
    ) == ("gif", 37, 21, 3)
    assert MM.parse_image_header(b"not an image") == (None, None, None, None)
    assert MM.parse_image_header(MM.png_bytes(5, 7)[:10]) == (None, None, None, None)

    # a PNG produced by a real encoder decodes identically (round-trip
    # through any external tool is equivalent; here: byte-level spec)
    fmt, w, h, ch = MM.parse_image_header(MM.png_bytes(640, 480))
    assert (fmt, w, h, ch) == ("png", 640, 480, 1)


def test_quantize_int8_roundtrip_error(spark, sf_dir):
    """Dequantized vectors stay within half-step (scale/2) of the
    original elementwise, and cosine vs the original stays ~1."""
    import pyspark.sql.functions as F
    from hudi_glue_spark.functions.vector import (
        cosine_similarity, dequantize_int8, quantize_int8,
    )
    from hudi_glue_spark.queries import table

    emb = table(spark, sf_dir, "embeddings").limit(50)
    qs = emb.select("vec_id", "embedding", quantize_int8("embedding").alias("qs"))
    checked = qs.select(
        "vec_id",
        F.col("qs.scale").alias("scale"),
        F.aggregate(
            F.zip_with(
                F.col("embedding"), dequantize_int8("qs"),
                lambda a, b: F.abs(a.cast("double") - b),
            ),
            F.lit(0.0), lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        cosine_similarity(F.col("embedding"), dequantize_int8("qs")).alias("cos"),
    ).collect()
    for r in checked:
        assert r["max_err"] <= r["scale"] / 2 + 1e-9
        assert r["cos"] > 0.999


def test_deterministic_sample_stable_and_joinable(spark, sf_dir):
    """Same key → same sample membership regardless of partitioning or
    salt-free rerun; different salts draw (near-)independent samples."""
    import pyspark.sql.functions as F
    from hudi_glue_spark.operators.sampling import deterministic_sample
    from hudi_glue_spark.queries import table

    docs = table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b  # partitioning-independent
    assert 0.2 < len(a) / docs.count() < 0.4
    c = {
        r["doc_id"]
        for r in deterministic_sample(docs, "doc_id", 0.3, salt="exp2").collect()
    }
    assert c != a  # a different salt draws a different sample


def test_connected_components_long_chain(spark):
    # chain 1-2-3-4-5 plus isolated pair 10-11: two components,
    # labels must propagate the full 4-hop chain (beyond one hop).
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5), (3, 4), (10, 11)], ["a_id", "b_id"]
    )
    got = {
        (r["node"], r["comp"]) for r in D.connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_shingles_short_docs_yield_empty(spark):
    """Docs shorter than n words must yield [] (like the SQL oracle),
    not abort the job via sequence(1, 0) → [1, 0] → slice(ws, 0, n)."""
    df = spark.createDataFrame(
        [Row(id=1, t=""), Row(id=2, t="one two"), Row(id=3, t="a b c d")]
    )
    out = {
        r.id: (r.s, r.w)
        for r in df.select(
            "id",
            D.shingles("t", 4).alias("s"),
            D.winnowing_fingerprints("t", n=4, window=4).alias("w"),
        ).collect()
    }
    assert out[1] == ([], [])
    assert out[2] == ([], [])
    assert len(out[3][0]) == 1 and len(out[3][1]) == 1


def test_tf_idf_and_bm25_semantics(spark):
    from hudi_glue_spark.operators import relevance as R

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple apple banana common common common"),
            Row(doc_id=2, text="banana cherry common common"),
            Row(doc_id=3, text="cherry cherry cherry common"),
        ]
    )
    top = {
        (r.doc_id, r.rank): r.term
        for r in R.tf_idf_top_terms(df, "doc_id", "text", k=1).collect()
    }
    # the rare repeated term wins over the everywhere-term
    assert top[(1, 1)] == "apple"
    assert top[(3, 1)] == "cherry"

    scores = {
        r.doc_id: r.score
        for r in R.bm25_scores(df, "doc_id", "text", ["cherry"]).collect()
    }
    assert set(scores) == {2, 3}  # only docs containing a query term
    assert scores[3] > scores[2]  # higher tf, shorter doc → higher score


def test_expr_bucketers_recall_and_determinism(spark, sf_dir):
    """The ordered-fold (oracle-reproducible) LSH/IVF variants must
    behave like ANN: decent recall vs brute force, and identical output
    across invocations."""
    from hudi_glue_spark.operators.similarity import (
        ivf_centroids,
        knn_bruteforce,
        knn_ivf,
        knn_lsh,
    )
    from hudi_glue_spark.queries import table

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_bruteforce(queries, emb, "vec_id", "embedding", k=5).collect()
    }
    lsh = knn_lsh(
        queries, emb, "vec_id", "embedding", k=5,
        n_planes=4, n_tables=8, bucketer="expr", dim=64,
    )
    got1 = {(r.query_id, r.neighbor_id) for r in lsh.collect()}
    assert len(got1 & exact) / len(exact) >= 0.5
    assert got1 == {(r.query_id, r.neighbor_id) for r in lsh.collect()}

    cents = ivf_centroids(emb, "vec_id", "embedding", n_centroids=16)
    ivf = knn_ivf(
        queries, emb, "vec_id", "embedding", k=5,
        nprobe=4, assigner="expr", centroids=cents,
    )
    got2 = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert len(got2 & exact) / len(exact) >= 0.5


def test_parse_image_header_never_raises():
    """Fuzz: arbitrary/truncated bytes must yield NULL metadata, never
    an exception — a decode crash at 100 TB aborts the whole job."""
    import random

    from hudi_glue_spark.operators import multimodal as MM2

    rng = random.Random(42)
    samples = [bytes()]
    for _ in range(300):
        n = rng.randrange(0, 64)
        samples.append(bytes(rng.randrange(256) for _ in range(n)))
    png, jpg = MM2.png_bytes(9, 4), MM2.jpeg_bytes(9, 4)
    samples += [png[:i] for i in range(0, len(png), 7)]
    samples += [jpg[:i] for i in range(0, len(jpg), 5)]
    samples += [b"\xff\xd8" + bytes(rng.randrange(256) for _ in range(20)) for _ in range(50)]
    for s in samples:
        out = MM2.parse_image_header(s)
        assert isinstance(out, tuple) and len(out) == 4


def test_stratified_exact_split_proportions(spark):
    """Every group lands within one row of its target fractions, and
    assignment is deterministic across invocations."""
    from hudi_glue_spark.operators.sampling import stratified_exact_split

    rows = [(i, f"g{i % 3}") for i in range(100)] + [(1000 + i, "tiny") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_exact_split(df, "doc_id", "source", fr)
    counts = {
        (r.source, r.split): r.n
        for r in out.groupBy("source", "split").agg(F.count("*").alias("n")).collect()
    }
    # g0/g1 have 34/33 rows, g2 33, tiny 5
    sizes = {"g0": 34, "g1": 33, "g2": 33, "tiny": 5}
    import math
    for g, n in sizes.items():
        tr = counts.get((g, "train"), 0)
        va = counts.get((g, "val"), 0)
        te = counts.get((g, "test"), 0)
        assert tr + va + te == n
        assert tr == math.floor(0.8 * n)
        assert va == math.floor(0.9 * n) - math.floor(0.8 * n)
    # tiny group: 5 rows -> 4/0/1, never an empty train
    assert counts.get(("tiny", "train"), 0) == 4
    # determinism: second run assigns identically
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {
        (r.doc_id, r.split)
        for r in stratified_exact_split(df, "doc_id", "source", fr)
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_hashed_feature_logit_contract(spark):
    """Empty text scores exactly 0; identical tokens accumulate the
    same weight; the logit is reproducible across plans/partitionings."""
    from hudi_glue_spark.operators.text import hashed_feature_logit_milli

    df = spark.createDataFrame(
        [("", 0), ("hello hello", 1), ("hello", 2)], "text string, i int"
    ).select("i", hashed_feature_logit_milli("text").alias("lm"))
    got = {r["i"]: r["lm"] for r in df.collect()}
    assert got[0] == 0
    assert got[1] == 2 * got[2]
    got2 = {
        r["i"]: r["lm"]
        for r in spark.createDataFrame(
            [("hello hello", 1)], "text string, i int"
        )
        .repartition(4)
        .select("i", hashed_feature_logit_milli("text").alias("lm"))
        .collect()
    }
    assert got2[1] == got[1]


def test_minhash_band_index_incremental_maintenance(spark, tmp_path):
    """The persisted band index supports CONTINUOUS ingest: appending a
    batch = upsert of the batch's own band rows (keyed (bk, doc_id), so
    re-ingesting a doc replaces its bands, never duplicates them). A
    later batch's probe then finds near-dups of BOTH the original
    corpus and the previously appended batch — without either ever
    being re-shingled."""
    from hudi_glue_spark.table import KeyedTable

    def bands(df):
        return D.minhash_band_rows(
            df, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3
        ).withColumn(
            "bk", F.concat_ws(":", F.col("band").cast("string"), F.col("bh"))
        )

    base = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="pack my box with five dozen liquor jugs now"),
        ]
    )
    idx = KeyedTable(
        str(tmp_path / "mhidx"), key=["bk", "doc_id"], precombine="doc_id",
        stats_cols=["bk"],
    )
    idx.bulk_insert(bands(base))

    # day-1 batch: a fresh doc — appended to the index incrementally
    day1 = spark.createDataFrame(
        [Row(doc_id=10, text="she sells sea shells by the sea shore daily")]
    )
    idx.upsert(bands(day1))

    # re-ingesting the same doc must not duplicate its band rows
    idx.upsert(bands(day1))
    n_bands = idx.read(spark).filter(F.col("doc_id") == 10).count()
    assert n_bands == 4

    # day-2 batch: near-dups of doc 1 (corpus) AND doc 10 (day-1 batch)
    day2 = spark.createDataFrame(
        [
            Row(doc_id=21, text="the quick brown fox jumps over the lazy dog yy"),
            Row(doc_id=22, text="she sells sea shells by the sea shore daily zz"),
        ]
    )
    probe = bands(day2)
    hits = (
        idx.read(spark)
        .join(probe.select(F.col("doc_id").alias("new_id"), "bk"), "bk")
        .select("new_id", F.col("doc_id").alias("dup_of"))
        .distinct()
    )
    got = {(r.new_id, r.dup_of) for r in hits.collect()}
    assert (21, 1) in got and (22, 10) in got


def test_incremental_dedup_join_path_matches_inlist(spark, monkeypatch):
    """Candidate-file selection for the incremental near-dup probe has
    two paths — driver IN-list (micro-batch) and Spark-side range join
    against the shard-stats metadata (backfill-scale, no O(batch)
    collect). They must select the same survivors."""
    import hudi_glue_spark.llm_queries as L

    sf = "/root/testdata/sf0.001"
    a = sorted(
        (r.new_id, r.dup_of, round(r.jaccard, 9))
        for r in L.q_incremental_near_dup_vs_index(spark, sf).collect()
    )
    monkeypatch.setattr(L, "_INC_BK_INLIST_CAP", 0)
    b = sorted(
        (r.new_id, r.dup_of, round(r.jaccard, 9))
        for r in L.q_incremental_near_dup_vs_index(spark, sf).collect()
    )
    assert a == b


def test_lsh_bucket_dim_required_and_plan_only(spark):
    """lsh_bucket is a pure plan transformation (VERDICT r7 #7): no
    Spark job may run during bucketing plan construction, and omitting
    dim without the explicit infer_dim opt-in is an error rather than
    a silent extra scan stage."""
    df = spark.range(8).select(
        F.array(F.lit(1.0), F.lit(-2.0)).alias("emb")
    )
    with pytest.raises(ValueError, match="dim"):
        S.lsh_bucket(df, "emb")

    sc = spark.sparkContext
    sc.setJobGroup("lsh_plan_only", "bucketing plan construction")
    try:
        out = S.lsh_bucket(df, "emb", dim=2)
        assert (
            list(sc.statusTracker().getJobIdsForGroup("lsh_plan_only")) == []
        ), "plan construction ran a Spark job"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert out.select("__bucket").distinct().count() >= 1

    # the opt-in probe still works for interactive use
    probed = S.lsh_bucket(df, "emb", infer_dim=True)
    assert probed.count() == 8
