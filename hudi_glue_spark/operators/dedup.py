"""Deduplication operators (§2b): exact, n-gram Jaccard, MinHash+LSH,
SimHash, embedding-cosine near-dup.

Design for 100 TB:
- Exact dedup is a hash-groupBy on a normalized fingerprint — one
  shuffle on a high-entropy key, map-side combinable.
- Brute-force pairwise comparison is never global: candidate pairs come
  from a *blocking* key (LSH band buckets, simhash prefixes, or an
  explicit block column), so the self-join shuffles only within small
  buckets. Skewed buckets are AQE-handled; pathological ones should be
  capped upstream (``max_bucket`` guard here).
- All hashing is deterministic (md5 / xxhash64 of content), so results
  are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_glue_spark.functions.scalar import let_
from hudi_glue_spark.functions.vector import cosine_similarity
from hudi_glue_spark.operators.text import doc_fingerprint, words


# -- exact ------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", keep: str = "min"
) -> DataFrame:
    """Exact dedup on the normalized content fingerprint, keeping the
    min (or max) id per duplicate group. One window over one shuffle."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    w = Window.partitionBy(doc_fingerprint(text_col))
    return (
        df.withColumn("__keep", agg.over(w))
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )


# -- shingles & Jaccard -----------------------------------------------------


def _gram_starts(count: Column) -> Column:
    """1..count start indices, or [] when count < 1. The guard matters:
    sequence(1, 0) infers step -1 and yields [1, 0], and slice(ws, 0, n)
    then raises — so an unguarded sequence aborts the whole job on any
    doc shorter than n words, where the SQL oracle yields []."""
    return F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (JVM-side).

    The word array is let-bound (:func:`~hudi_glue_spark.functions.
    scalar.let_`) so the per-gram ``slice`` reads a lambda variable:
    referencing ``words(text)`` directly inside the lambda re-splits
    the document once per gram — O(len²), measured 8× this stage's
    cost at sf0.1 (r15)."""

    def grams_of(ws: Column) -> Column:
        return F.transform(
            _gram_starts(F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        )

    return F.array_distinct(let_(words(text), grams_of))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two DISTINCT-element arrays: |∩| / (|a|+|b|-|∩|)."""
    i = F.size(F.array_intersect(a, b)).cast("double")
    return i / (F.size(a) + F.size(b) - i)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    set_col: str,
    block_col: str,
    threshold: float,
    n_salts: int = 8,
) -> DataFrame:
    """All pairs within a block whose set-Jaccard ≥ threshold.

    Output: (a_id, b_id, jaccard), a_id < b_id. The block column is the
    scalability contract: the self-join is per-block, never global.

    Parallelism within a block comes from salting: the left side hashes
    each id into one of ``n_salts`` sub-keys and the right side is
    replicated across all of them, so a block's quadratic intersect work
    spreads over ``n_salts`` tasks instead of one — the standard
    skew-salt, needed whenever blocks are few or uneven (here: 20
    sources would otherwise cap the join at 20 tasks).
    """
    from hudi_glue_spark.plans.parallelism import ensure_parallelism

    left = ensure_parallelism(
        df.select(
            F.col(block_col).alias("__blk"),
            F.col(id_col).alias("a_id"),
            F.col(set_col).alias("__sa"),
        )
    ).withColumn("__salt", F.pmod(F.hash("a_id"), F.lit(n_salts)))
    right = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("b_id"),
        F.col(set_col).alias("__sb"),
    ).withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    # merge hint: BOTH sides are corpus-sized, so neither may ever be
    # BROADCAST — small-SF size estimates once let the planner build a
    # driver-side hash relation of the replicated side, which OOMs the
    # moment the corpus outgrows the driver (measured at 16x sf0.1) and
    # is impossible at 100 TB. And it can't be shuffle_hash either: the
    # join key space is only (blocks × n_salts) partitions — 160 here —
    # so per-task hash BUILDS grow linearly with the corpus no matter
    # how many shuffle partitions the session sets, and a hash-relation
    # build cannot spill (the sibling minhash re-attach join measured
    # exactly that death at 64x corpus). Sort-merge spills both sides;
    # the sort keys are the slim (block, salt) pair and the wide set
    # arrays are payload.
    #
    # Explicit-width repartition on the join keys (r15): the verify
    # join is CPU-dense but byte-light (compressed shingle arrays), so
    # AQE's byte-based coalescing (minPartitionSize 1 MB) was merging
    # its reduce side down to ~7 tasks while 25 cores idled — measured
    # 2.24 → 1.41 s at sf0.1. A user-specified repartition is exempt
    # from AQE coalescing; the width rides the configured
    # spark.sql.shuffle.partitions (scale-parameterised, not a local
    # constant). Skew inside a block is already handled by the salt —
    # that, not AQE skew-split, is this operator's skew story.
    try:
        width = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        # platforms that set a non-integer conf (e.g. "auto"): fall back
        # to the cluster's default parallelism (ADVICE r15)
        width = df.sparkSession.sparkContext.defaultParallelism
    left = left.repartition(width, "__blk", "__salt")
    right = right.repartition(width, "__blk", "__salt")
    pairs = left.hint("merge").join(right, ["__blk", "__salt"]).filter(
        F.col("a_id") < F.col("b_id")
    )
    return (
        pairs.withColumn("jaccard", jaccard(F.col("__sa"), F.col("__sb")))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", "jaccard")
    )


# -- MinHash + LSH ----------------------------------------------------------


#: Prime > 2^32 for the linear minhash family (h1 + i·h2) mod P.
_MINHASH_P = 4294967311


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature via the standard two-base-hash linear family:
    each shingle is md5-hashed ONCE into (h1, h2) = two 32-bit halves,
    and hash_i = (h1 + i·h2) mod P.

    Implemented as a single fold over the shingle array (the md5 pairs
    are the aggregate INPUT, so they're evaluated once per row — putting
    them inside a per-i lambda would recompute every md5 ``num_hashes``
    times), maintaining ``num_hashes`` running minima via zip_with.
    Entirely JVM-side and bit-reproducible in DuckDB for the oracle."""
    pairs = F.transform(
        shingle_col,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long").alias("h2"),
        ),
    )
    return F.aggregate(
        pairs,
        F.array_repeat(F.lit(_MINHASH_P).cast("long"), num_hashes),
        lambda acc, p: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda m, i: F.least(m, (p["h1"] + i * p["h2"]) % F.lit(_MINHASH_P)),
        ),
    )


def minhash_band_rows(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """The PERSISTABLE half of MinHash+LSH: one (id, band, band_hash)
    row per document per band — the band signature a corpus index
    stores so that INCREMENTAL batches join against it instead of
    re-shingling the corpus (VERDICT r5 "What's missing" #2).

    Identical hash family/banding as :func:`minhash_lsh_pairs` (same
    md5 two-base linear family, same band md5), so rows computed today
    collide with rows computed over next month's batch. Map-only: no
    shuffle, no join — the caller decides how to cluster/persist."""
    from hudi_glue_spark.plans.parallelism import ensure_parallelism

    rows_per_band = num_hashes // bands
    # r15: widen a narrow scan before the shingle+minhash folds — the
    # index build ran its whole fold on ONE task (4.4 s of the 11 s
    # mh_index_build fixture at sf0.1); no-op when the scan is already
    # wide (guide §2.5).
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        shingles(text_col, shingle_n).alias("__sh"),
    ).filter(F.size("__sh") > 0)
    sig = base.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
    return sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band),
                    )
                ),
            )
        ).alias("band", "bh"),
    ).select(F.col("__id").alias(id_col), "band", "bh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact verify.

    shingle → minhash(k=``num_hashes``) → split into ``bands`` bands,
    hash each band → bucket-join on (band, band_hash) → candidate pairs
    → verify with exact shingle Jaccard ≥ ``threshold``.

    Buckets larger than ``max_bucket`` are dropped (degenerate content —
    e.g. empty docs all hashing identically — would otherwise produce a
    quadratic blowup at scale).
    """
    from hudi_glue_spark.plans.parallelism import ensure_parallelism

    rows_per_band = num_hashes // bands
    # base is referenced three times downstream (signature + both sides
    # of the verify join) and banded twice (bucket sizing + self-join);
    # persist both so shingling/md5-minhashing runs ONCE per row instead
    # of being recomputed along every lineage branch.
    from hudi_glue_spark.plans.persist_registry import register

    base = register("minhash_base", ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        shingles(text_col, shingle_n).alias("__sh"),
    ).filter(F.size("__sh") > 0).persist())
    sig = base.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
    # banded rows carry ONLY (id, band, band_hash): the bucket self-join
    # shuffles 3 narrow columns, never the shingle arrays
    banded = sig.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band))
                ),
            )
        ).alias("__band", "__bh"),
    )
    banded = register("minhash_banded", banded.persist())
    # Every join below pairs two CORPUS-SIZED sides (bucket counts grow
    # with rows; the banded table is rows x bands; the shingle re-attach
    # sides are the corpus itself). shuffle_hash hints keep them
    # shuffled, per-partition-built, spillable hash joins — small-SF
    # size estimates otherwise let the planner BROADCAST them, which
    # OOMs once the corpus outgrows the driver (measured at 16x sf0.1)
    # and is impossible at 100 TB. The shuffle keys are the ones the
    # LSH design already buckets by, and unlike a merge join nothing
    # sorts the wide shingle arrays.
    bucket_sizes = banded.groupBy("__band", "__bh").count()
    banded = banded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket).drop("count").hint("shuffle_hash"),
        ["__band", "__bh"],
    )
    cand = (
        banded.alias("l")
        .join(banded.alias("r").hint("shuffle_hash"), ["__band", "__bh"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("a_id"), F.col("r.__id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    # Shingle sets re-attached only for the (much smaller) candidate
    # set — but "smaller" is duplicate-density-dependent: candidates
    # grow with the square of per-bucket duplicate counts, and a
    # shuffled-hash-join BUILD cannot spill (only the probe streams),
    # so hinting shuffle_hash here dies with "can't acquire memory to
    # build hash relation" once candidates outgrow per-task memory
    # (measured: 64x sf0.1 corpus, ~10M candidate pairs). merge hints
    # instead: sort-merge spills BOTH sides to disk, the sort keys are
    # the narrow ids (rows sort by key; the wide arrays are payload),
    # and the hint still forbids broadcasting a corpus-sized side. The
    # narrow banded self-join above keeps shuffle_hash: its build rows
    # are 3 slim columns and per-partition slices shrink as shuffle
    # partitions scale with the corpus.
    half = cand.hint("merge").join(
        base.select(F.col("__id").alias("a_id"), F.col("__sh").alias("__sa")), "a_id"
    )
    # a strategy hint is consumed by the nearest enclosing join, so the
    # second join needs its own
    verified = half.hint("merge").join(
        base.select(F.col("__id").alias("b_id"), F.col("__sh").alias("__sb")), "b_id"
    )
    return (
        verified.withColumn("jaccard", jaccard(F.col("__sa"), F.col("__sb")))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", "jaccard")
    )


def dedup_keep_list(
    pairs: DataFrame, df: DataFrame, id_col: str, iterations: int | None = 1
) -> DataFrame:
    """Collapse duplicate pairs to survivors.

    ``iterations=1`` (default): every id maps to the min id among itself
    and its direct neighbors — connected-components-lite, one
    aggregation, no loop. Monotone id chains (A<B<C, pairs A-B, B-C)
    collapse fully, but a node whose neighbors all have LARGER ids
    survives even when a smaller id is reachable transitively (edges
    1-3, 2-3 keep both 1 and 2).

    ``iterations=None`` (or >1): survivors = exactly one per connected
    component — the component's min id — via
    :func:`connected_components` min-label propagation capped at that
    many rounds (None → until fixpoint). Use for aggressive curation
    where duplicate chains run long (crawl dumps sharing boilerplate).
    Each extra round costs one edges⋈labels shuffle over the PAIRED
    nodes only — a tiny fraction of the corpus."""
    if iterations is not None and iterations <= 1:
        edges = pairs.select(
            F.col("a_id").alias("__rid"), F.col("b_id").alias("__nb")
        ).unionByName(
            pairs.select(F.col("b_id").alias("__rid"), F.col("a_id").alias("__nb"))
        )
        rep = edges.groupBy("__rid").agg(F.min("__nb").alias("__min_nb"))
        return (
            df.join(rep, df[id_col] == rep["__rid"], "left")
            .filter(F.col("__min_nb").isNull() | (F.col("__min_nb") > df[id_col]))
            .drop("__rid", "__min_nb")
        )
    comps = connected_components(
        pairs, max_iter=50 if iterations is None else iterations
    )
    return (
        df.join(comps, df[id_col] == comps["node"], "left")
        .filter(F.col("comp").isNull() | (F.col("comp") == df[id_col]))
        .drop("node", "comp")
    )


def winnowing_fingerprints(
    text: Column | str, n: int = 3, window: int = 4
) -> Column:
    """Winnowing document fingerprints (the MOSS scheme): hash every
    word ``n``-gram, slide a ``window`` over the hash sequence, keep
    each window's minimum — a deterministic, alignment-robust subset of
    the k-gram hashes (local edits perturb only nearby fingerprints).
    Selection over k-gram hashes is exactly what a Rabin-Karp rolling
    hash computes incrementally; expression-wise the gram hashes are
    materialized once and the mins are windowed reads.

    Returns the DISTINCT fingerprint array (sorted) — join/explode it
    for overlap detection. md5-based hash so DuckDB reproduces values.
    """
    # Both levels are let-bound (r15): the word array and the gram-hash
    # array are each evaluated ONCE and read as lambda variables. The
    # naive transform(j -> array_min(slice(grams, j, w))) over an
    # UNBOUND grams expression re-evaluates every md5 per window —
    # O(len²) md5s (measured 100s+ at sf0.01 on the oracle side, and a
    # 150× blowup when prototyped unbound on the Spark side); the
    # previous ring-buffer aggregate avoided that but paid two array
    # allocations per element in the interpreted fold (5× this row's
    # cost at sf0.1). With grams bound, each window min is ``window``
    # O(1) lambda-variable reads.
    def over_ws(ws: Column) -> Column:
        grams = F.transform(
            _gram_starts(F.size(ws) - (n - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(ws, i, n))), 1, 15),
                16,
                10,
            ).cast("long"),
        )

        def over_grams(g: Column) -> Column:
            # Unrolled least(element_at…) reads are the fast form, but
            # their plan size grows linearly per window element and the
            # window-min list is O(window²) expression nodes overall — a
            # caller-supplied window in the hundreds would inflate the
            # plan quadratically (ADVICE r15). Past a small bound, use
            # array_min(slice(...)): O(1) plan size, one bounded slice
            # allocation per window, identical minima. Declared queries
            # use the default window=4, so their plans are unchanged.
            if window <= 16:
                win_min = lambda j: F.least(  # noqa: E731
                    *[F.element_at(g, j + k) for k in range(window)]
                )
            else:
                win_min = lambda j: F.array_min(  # noqa: E731
                    F.slice(g, j, window)
                )
            mins = F.transform(
                _gram_starts(F.size(g) - (window - 1)),
                win_min,
            )
            # short docs (fewer grams than one window): keep all gram
            # hashes
            return F.when(F.size(g) >= window, mins).otherwise(g)

        return let_(grams, over_grams)

    picked = let_(words(text), over_ws)
    return F.array_sort(F.array_distinct(picked))


def winnowing_grams_sql(col: str = "text", n: int = 3) -> str:
    """DuckDB k-gram hash array (n=3 only). Materialize this as a CTE
    column BEFORE windowing: referencing the expression inside the
    window lambda re-evaluates every md5 per window (O(len²))."""
    from hudi_glue_spark.operators.text import words_sql

    assert n == 3, "SQL twin is generated for 3-grams"
    ws = words_sql(col)
    return (
        f"list_transform(range(1, greatest(len({ws}) - {n - 1}, 0) + 1), "
        f"i -> CAST(('0x' || substr(md5(({ws})[i] || ' ' || ({ws})[i+1] || ' ' || ({ws})[i+2]), 1, 15)) AS BIGINT))"
    )


def winnowing_from_grams_sql(g: str = "g", window: int = 4) -> str:
    """DuckDB windowed-min selection over a materialized gram column."""
    mins = (
        f"list_transform(range(1, greatest(len({g}) - {window - 1}, 0) + 1), "
        f"j -> list_min({g}[j:j+{window - 1}]))"
    )
    return (
        f"list_sort(list_distinct(CASE WHEN len({g}) >= {window} "
        f"THEN {mins} ELSE {g} END))"
    )


# -- SimHash ----------------------------------------------------------------

#: Single pass over the word list: each word is hashed ONCE (the
#: transform input), then votes into an array of {bits} counters via
#: zip_with (cheap long ops); the finish lambda packs signs into bits.
_SIMHASH_EXPR = """
aggregate(
  transform({words}, w -> {whash}),
  array_repeat(0L, {bits}),
  (acc, h) -> zip_with(acc, sequence(0, {maxbit}),
                       (c, b) -> c + (CAST(shiftright(h, b) & 1 AS LONG) * 2 - 1)),
  acc -> aggregate(zip_with(acc, sequence(0, {maxbit}),
                            (c, b) -> IF(c > 0, shiftleft(1L, b), 0L)),
                   0L, (s, x) -> s + x))
"""

#: md5-based 60-bit word hash (engine-portable: DuckDB computes the
#: identical value, enabling SQL oracles); xxhash64 is the faster
#: JVM-native default.
_WORD_HASH = {
    "xxhash64": ("xxhash64(w)", 64),
    "md5_60": ("CAST(conv(substr(md5(w), 1, 15), 16, 10) AS LONG)", 60),
}


def simhash(text_col: str = "text", hash_fn: str = "xxhash64") -> Column:
    """SimHash over whitespace tokens: each word's hash votes ±1 per
    bit position; the sign forms the output bit. Pure SQL expression —
    runs in whole-stage codegen. ``hash_fn='md5_60'`` gives a 60-bit
    engine-portable variant (same value computable in DuckDB)."""
    whash, bits = _WORD_HASH[hash_fn]
    w = f"filter(split({text_col}, '\\\\s+'), x -> x != '')"
    return F.expr(_SIMHASH_EXPR.format(words=w, whash=whash, bits=bits, maxbit=bits - 1))


def hamming64(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``prefix_bits`` of
    the simhash (near-dups almost always share the prefix), then filter
    pairs by Hamming distance ≤ ``max_hamming``. The prefix blocking is
    what keeps the self-join sub-quadratic at scale."""
    from hudi_glue_spark.plans.parallelism import ensure_parallelism

    from pyspark import StorageLevel

    from hudi_glue_spark.plans.persist_registry import register

    bits = _WORD_HASH[hash_fn][1]
    # The slim (id, simhash, block) base is PERSISTED before the
    # self-join (r15): Spark plans each join side independently (no
    # exchange reuse fires for this shape), so an unpersisted base
    # recomputes the full text scan + per-word hash vote once PER SIDE
    # — measured 3.55 → 0.79 s at sf0.1. Three fixed-width columns per
    # document (~24 B/doc), memory-then-disk — negligible next to the
    # corpus at any scale.
    base = register("simhash_base", ensure_parallelism(df).select(
        F.col(id_col).alias("__id"), simhash(text_col, hash_fn).alias("__sh")
    ).withColumn(
        "__blk", F.shiftright(F.col("__sh"), bits - prefix_bits)
    ).persist(StorageLevel.MEMORY_AND_DISK))
    # merge hint: both self-join sides are the corpus — never broadcast
    # (see jaccard_pairs) — and the prefix block key space is at most
    # 2^prefix_bits values, so per-task hash builds would grow linearly
    # with the corpus regardless of shuffle-partition count (the
    # unspillable-build failure measured on the minhash re-attach at
    # 64x). Sort-merge spills; the rows are 3 slim columns, so the sort
    # is cheap.
    pairs = (
        base.alias("l")
        .join(base.alias("r").hint("merge"), "__blk")
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(
            F.col("l.__id").alias("a_id"),
            F.col("r.__id").alias("b_id"),
            hamming64(F.col("l.__sh"), F.col("r.__sh")).alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# -- embedding near-dup -----------------------------------------------------


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    n_salts: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine within a block (the
    block column is the IVF-style coarse bucket — at scale, a cluster
    assignment; never a global cross join).

    r16 shape (before/after plans in plans/r16/):

    - The slim (block, id, vec, ‖vec‖) base is computed ONCE and
      persisted before the self-join — Spark plans each join side
      independently (no exchange reuse fires for this shape, same
      finding as simhash_pairs r15), so an unpersisted base re-ran the
      whole upstream lineage (for semantic_dedup_survivors that lineage
      is the k-means assignment JOIN the embeddings table) once PER
      SIDE.
    - The l2 norm is computed per ROW in the base instead of per PAIR
      in the quadratic verify: cosine(a,b) = dot(a,b)/(‖a‖·‖b‖) with
      ‖·‖ the identical sqrt-of-fold expression — the same doubles
      the fused cosine_similarity computes, so results are
      bit-identical, but the pair stage runs ONE O(dim) fold instead
      of three.
    - The block join is salted like jaccard_pairs: block counts can be
      small (k-means cells: 8), which caps an unsalted join at
      n_blocks tasks while the rest of the cluster idles — and the
      verify is CPU-dense but byte-light, so AQE's byte-based
      coalescing under-parallelizes it further (r15 §E). Explicit
      width rides spark.sql.shuffle.partitions (scale-parameterised).
    """
    from pyspark import StorageLevel

    from hudi_glue_spark.functions.vector import dot_product, l2_norm
    from hudi_glue_spark.plans.parallelism import ensure_parallelism
    from hudi_glue_spark.plans.persist_registry import register

    base = register(
        "embnd_base",
        ensure_parallelism(
            df.select(
                F.col(block_col).alias("__blk"),
                F.col(id_col).alias("__id"),
                F.col(vec_col).alias("__v"),
            )
        )
        .withColumn("__n", l2_norm("__v"))
        .persist(StorageLevel.MEMORY_AND_DISK),
    )
    left = base.select(
        "__blk",
        F.col("__id").alias("a_id"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    ).withColumn("__salt", F.pmod(F.hash("a_id"), F.lit(n_salts)))
    right = base.select(
        "__blk",
        F.col("__id").alias("b_id"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    ).withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    try:
        width = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        width = df.sparkSession.sparkContext.defaultParallelism
    left = left.repartition(width, "__blk", "__salt")
    right = right.repartition(width, "__blk", "__salt")
    # merge hint: both sides are the corpus — never broadcast (see
    # jaccard_pairs) — and the build payload is the VECTOR column, so a
    # shuffled-hash build would hold a bucket's full vector slice in
    # memory with no spill path; sort-merge spills, sorting only the
    # slim bucket key.
    return (
        left.hint("merge").join(right, ["__blk", "__salt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cosine",
            dot_product("__va", "__vb") / (F.col("__na") * F.col("__nb")),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("a_id", "b_id", "cosine")
    )


# -- connected components ----------------------------------------------------


def connected_components(
    pairs: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """Transitive duplicate clusters from a near-dup pair list:
    ``(node, component)`` where component = min node id reachable
    through any chain of pairs (A~B, B~C → one cluster {A,B,C}).

    The full version of :func:`dedup_keep_list`'s one-hop collapse —
    needed when duplicate chains are longer than one hop (crawl dumps
    where A~B~C~D all share boilerplate).

    Scale design: iterative min-label propagation. Each round is one
    shuffle (edges ⋈ labels on node id, then min-agg); rounds needed =
    graph diameter, which for near-dup clusters is small (pairs within
    a cluster are dense). State between rounds is ``localCheckpoint``ed
    so the lineage (and scheduler DAG) stays O(1) per round instead of
    growing geometrically — the standard Spark-iterative pattern. Edges
    live only on near-dup nodes (a tiny fraction of the corpus), so the
    working set is orders of magnitude below the input table.
    """
    edges = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = (
        edges.unionByName(edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint()
    )

    def label_sum(lbl: DataFrame):
        # decimal(38,0) so a planet-scale id sum can never wrap: the
        # convergence test below relies on sum equality being exact
        return lbl.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    # Initial label: min of self and direct neighbors. Checkpoints are
    # LAZY (eager=False): the label-sum job below materializes the
    # checkpoint AND reads the convergence signal in the same action —
    # one job per round instead of r14's two (eager checkpoint + a
    # changed-count join). r15 measurement at sf0.1: 0.36 s/round vs
    # 0.76 s/round.
    labels = edges.groupBy("s").agg(
        F.least(F.min("d"), F.col("s")).alias("comp")
    ).select(F.col("s").alias("node"), "comp").localCheckpoint(eager=False)
    prev_sum = label_sum(labels)

    for _ in range(max_iter):
        # comp'(v) = min(comp(v), min over neighbors u of comp(u)) —
        # as ONE union + min-agg (2 exchanges/round) instead of r14's
        # join + agg + left-join (3 exchanges/round): each edge (s, d)
        # contributes comp(d) to node s, and the node's own (node,
        # comp) row keeps unconnected/greater-neighbor nodes stable.
        new_labels = (
            edges.join(labels, edges["d"] == labels["node"])
            .select(F.col("s").alias("node"), "comp")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        # Labels only ever DECREASE, so an unchanged (exact, decimal)
        # sum ⇔ no label changed — the fixpoint test without the
        # new⋈old diff join.
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def segment_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", w: int = 10
) -> DataFrame:
    """Corpus-wide segment (paragraph) dedup with document reassembly —
    RefinedWeb-style exact-substring dedup at ``w``-word granularity:
    every segment keeps only its first global occurrence (ordered by
    id, then position); each document is rebuilt from its surviving
    segments. Documents with no surviving segment are dropped.

    Returns one row per surviving document: (id, n_segs, n_kept,
    new_fp) where ``new_fp`` is the md5 of the reassembled text.

    100 TB shape: the dedup decision shuffles only (md5(segment), id,
    pos) — never text; winning positions shuffle back by id and the
    text is RE-SLICED from the original document at reassembly, so
    full text crosses the wire zero times. The reassembly join hints
    shuffle_hash: its aggregated side is corpus-sized, and the
    planner's post-agg estimate would otherwise broadcast it (the
    no-broadcast contract, same as the pair-generating family)."""
    ws = df.select(F.col(id_col).alias("__id"), words(text_col).alias("ws"))
    n_seg = F.ceil(F.size("ws") / F.lit(float(w))).cast("long")
    segs = ws.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_seg - 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice("ws", i * w + 1, w))),
            )
        ).alias("pos", "h"),
    ).select("__id", F.col("pos").cast("long").alias("pos"), "h")
    win = Window.partitionBy("h").orderBy("__id", "pos")
    kept = (
        segs.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("__id", "pos")
    )
    kept_pos = kept.groupBy("__id").agg(
        F.sort_array(F.collect_list("pos")).alias("keep_ps"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        ws.join(kept_pos.hint("shuffle_hash"), "__id")
        .select(
            F.col("__id").alias(id_col),
            F.ceil(F.size("ws") / F.lit(float(w))).cast("long").alias("n_segs"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.flatten(
                        F.transform(
                            "keep_ps",
                            lambda p: F.slice("ws", (p * w + 1).cast("int"), w),
                        )
                    ),
                )
            ).alias("new_fp"),
        )
    )
