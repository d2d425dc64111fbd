"""Sequence packing (§2b training-pipeline op): fill fixed-size context
windows from variable-length documents.

Two strategies, matching the two real-world pipelines:

- :func:`chunk_pack` — the pretraining norm: concatenate documents in a
  deterministic order and slice into ``budget``-token chunks; documents
  straddle chunk boundaries. Pure window arithmetic (running sum →
  floor-divide), fully SQL-expressible, EXACT-oracle-checkable.
- :func:`greedy_pack` — the SFT norm: whole documents only, greedy
  first-fit-in-order into bins of ``budget`` tokens (oversized docs get
  a bin alone). Sequential state per group → ``applyInPandas``.

Both pack WITHIN a partition key (``group_col``, e.g. the source shard):
a global pack would funnel 100 TB through one task, while per-shard
packing keeps every group independent — the shuffle is one hash
partition by shard, each executor packs its shards in isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def chunk_pack(
    df: DataFrame,
    token_col: str,
    group_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """Concat-then-chunk assignment: adds ``chunk_id`` = which
    ``budget``-token window this document STARTS in, per ``group_col``,
    ordered by ``order_col`` (must be a total order within the group).

    The explicit ROWS frame matters: Spark's default frame for an
    ordered window is RANGE, which sums across all peer rows on tied
    ``order_col`` values — silently diverging from the concat-then-chunk
    semantics (and the ROWS UNBOUNDED PRECEDING oracle) on ties."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "chunk_id", F.floor(cum_before / F.lit(budget)).cast("int")
    )


def greedy_pack(
    df: DataFrame,
    token_col: str,
    group_col: str,
    order_col: str,
    budget: int,
) -> DataFrame:
    """First-fit-in-order whole-document packing: adds ``bin_id`` such
    that each bin's token sum ≤ ``budget`` (a document larger than the
    budget occupies its own bin). Deterministic given the group/order
    columns; Arrow-batched pandas per group."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    # copy the fields — StructType.add would mutate df's live schema
    schema = StructType(df.schema.fields + [StructField("bin_id", IntegerType())])
    cols = list(df.columns)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, cur_bin, cur_tokens = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if cur_tokens > 0 and cur_tokens + t > budget:
                cur_bin += 1
                cur_tokens = 0
            bins.append(cur_bin)
            cur_tokens += t
        pdf["bin_id"] = pd.array(bins, dtype="int32")
        return pdf[cols + ["bin_id"]]

    # groupBy+applyInPandas performs its own hash shuffle on group_col —
    # no explicit repartition needed (one shuffle total).
    return df.groupBy(group_col).applyInPandas(pack, schema)
