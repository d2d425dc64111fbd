"""Benchmark decontamination (§2b training-pipeline op).

Training corpora must not contain evaluation-set text; the standard
detector flags any training document sharing a word n-gram (n≈8-13)
with a benchmark document. Shape: explode training docs to distinct
n-grams (map-side, narrow), broadcast the benchmark gram set (eval
suites are tiny relative to a 100 TB corpus), hash-join, count hits per
document — the only shuffle is the final per-doc aggregation, keyed by
doc id, which AQE sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_glue_spark.operators.dedup import shingles
from hudi_glue_spark.operators.text import words_sql


def ngram_overlap(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-training-doc count of distinct word ``n``-grams that also
    appear anywhere in ``bench``. Rows with zero overlap are dropped —
    the result is the contamination report (join it back anti-wise to
    filter the corpus)."""
    t = train.select(id_col, F.explode(shingles(text_col, n)).alias("gram"))
    b = bench.select(F.explode(shingles(text_col, n)).alias("gram")).distinct()
    if broadcast_bench:
        b = F.broadcast(b)
    # shingles() emits distinct grams per doc, so count(*) == distinct hits
    return (
        t.join(b, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """``train`` minus documents contaminated by ``bench`` (left-anti
    join against the overlap report)."""
    hits = ngram_overlap(train, bench, text_col, id_col, n).select(id_col)
    return train.join(hits, id_col, "left_anti")


def shingles_sql(col: str = "text", n: int = 3) -> str:
    """DuckDB expression mirroring :func:`dedup.shingles` for any n."""
    ws = words_sql(col)
    gram = " || ' ' || ".join(f"({ws})[i+{j}]" if j else f"({ws})[i]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({ws}) - {n - 1}, 0) + 1), i -> {gram}))"
    )
