"""Relevance scoring over the document corpus: TF-IDF and BM25.

Extension operators (SURVEY §2b, text-analysis family) — corpus
statistics a training-data pipeline needs for quality weighting,
query-based subset selection, and retrieval-style eval sets.

Design for 100 TB:
- The term-doc table is one explode + groupBy (map-side combinable,
  shuffle keyed on high-entropy (doc, term)).
- Document frequencies aggregate to ~vocabulary size — tiny next to
  the corpus — and broadcast back, so scoring is shuffle-free after
  the tf aggregation.
- BM25 scores only the query's terms: the term-doc table is first
  semi-filtered on the (broadcast) query term list, so a 3-term query
  touches 3 posting lists, never the whole matrix.
- Score sums are decimal-cast before aggregation: IEEE double addition
  is order-dependent, and at cluster scale partial-sum order is
  nondeterministic; fixed-scale decimals make the result bit-stable
  (the engine-wide determinism rule, see queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_glue_spark.operators.text import words


def term_doc_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — one row per distinct term per document."""
    return (
        docs.select(F.col(id_col).alias("doc"), F.explode(words(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf_top_terms(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn-style idf = ln((1+N)/(1+df)) + 1).

    Output: (doc_id, term, tf, score, rank), rank 1..k per doc, ties
    broken by term so the result is a total order.
    """
    # N rides the plan as a broadcast 1-row aggregate instead of a
    # separate count() action (r16, guide §5 "the driver") — one job,
    # not two; same double arithmetic. A one-exchange reshape
    # (repartition tokens by doc so the tf agg and the window both
    # reuse the partitioning) was prototyped and measured NEUTRAL at
    # sf0.1 (med 1.24 vs 1.32 s, within noise) because no exchange
    # reuse fires between the dfreq broadcast branch and the main
    # stream — the raw-token explode would run twice either way — so
    # the r15-audited two-exchange shape stays.
    terms = term_doc_counts(docs, id_col, text_col)
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        terms.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs), F.lit(True))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log(
                    (F.col("__n") + F.lit(1)) / (F.col("df") + F.lit(1))
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias("doc_id"), "term", "tf", "score", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every matching document against a bag of query
    terms (Robertson idf, the Okapi/Lucene formula).

    Output: (doc_id, score), one row per document containing ≥1 query
    term. Per-term contributions are decimal-cast before the per-doc
    sum so the score is independent of partial-aggregation order.
    """
    terms = term_doc_counts(docs, id_col, text_col)
    qlist = [str(t) for t in query_terms]
    qterms = terms.filter(F.col("term").isin(qlist))
    dfreq = qterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dl = (
        docs.select(
            F.col(id_col).alias("doc"), F.size(words(text_col)).alias("dl")
        )
    )
    # N and avgdl ride the plan as ONE broadcast 1-row aggregate (r16,
    # guide §5 "the driver"): the previous count()/first() pair cost two
    # extra full-scan ACTIONS per call just to fetch scalars the plan
    # can join in — same double arithmetic, one job instead of three.
    # dl has exactly one row per document, so count(dl) == count(docs).
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"),
        (F.sum("dl") / F.count(F.lit(1))).alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
        )
    )
    contrib = (
        qterms.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .join(F.broadcast(stats), F.lit(True))
        .withColumn("s", idf * tf_part)
    )
    return (
        contrib.groupBy("doc")
        .agg(
            F.sum(F.col("s").cast("decimal(28,12)")).cast("double").alias("score")
        )
        .select(F.col("doc").alias("doc_id"), "score")
    )


def bm25_sql(
    id_col: str,
    table: str,
    words_sql: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle for :func:`bm25_scores` — the same Okapi formula
    over the same term-doc counts, with the identical decimal-cast
    per-doc sum so scores are bit-stable on both engines."""
    inlist = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
    WITH t AS (
      SELECT {id_col} AS doc, unnest({words_sql}) AS term FROM {table}
    ),
    tf AS (SELECT doc, term, count(*) AS tf FROM t GROUP BY doc, term),
    qtf AS (SELECT * FROM tf WHERE term IN ({inlist})),
    dfq AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM {table}),
    dl AS (SELECT {id_col} AS doc, len({words_sql}) AS dl FROM {table}),
    avgdl AS (
      SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    contrib AS (
      -- parenthesized exactly as the Spark expression tree associates,
      -- idf * (num / denom), so IEEE rounding matches bit-for-bit
      SELECT doc,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * ((tf * {k1 + 1.0}) / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl)))
               AS s
      FROM qtf JOIN dfq USING (term) JOIN dl USING (doc), n, avgdl
    )
    SELECT doc AS doc_id,
           CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE) AS score
    FROM contrib GROUP BY doc
    """


def tf_idf_sql(col: str, id_col: str, table: str, words_sql: str, k: int = 3) -> str:
    """DuckDB oracle for :func:`tf_idf_top_terms` (same formula)."""
    return f"""
    WITH t AS (
      SELECT {id_col} AS doc, unnest({words_sql}) AS term FROM {table}
    ),
    tf AS (SELECT doc, term, count(*) AS tf FROM t GROUP BY doc, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM {table}),
    scored AS (
      SELECT doc, term, tf,
             tf * (ln((1 + n_docs) / (df + 1)) + 1.0) AS score
      FROM tf JOIN dfq USING (term), n
    ),
    ranked AS (
      SELECT doc AS doc_id, term, tf, score,
             CAST(row_number() OVER (
               PARTITION BY doc ORDER BY score DESC, term ASC) AS INTEGER) AS rank
      FROM scored
    )
    SELECT * FROM ranked WHERE rank <= {k}
    """


def inverted_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id) inverted-index postings, one row per distinct
    term-document pair.

    Row-per-posting (not array-per-term) deliberately: a stopword's
    posting list is corpus-sized, and materializing it as one array row
    recreates the giant-row problem bucketed designs exist to avoid.
    Rows range-cluster by term into files with tight term min/max, so a
    keyword lookup prunes to the files covering its terms — the layout
    :func:`hudi_glue_spark.llm_queries.q_keyword_search_indexed`
    persists through a KeyedTable."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(words(text_col))).alias("term"),
    ).select("term", "doc_id")
