"""Sliding token windows over long documents — the chunker that feeds
embedding models and fixed-context training from documents longer than
one context window.

Two implementations of the same contract
(``(id, win_start, win_text)`` with ``win_start`` 0-based, windows of
``size`` tokens every ``stride`` tokens, at least one window even for
short/empty docs):

- :func:`sliding_token_windows` — the production path: sequence →
  explode → slice, pure JVM expressions, no shuffle (the 100 TB form).
- :func:`sliding_token_windows_udtf` — the same thing as a Python UDTF
  (lateral row-generating UDF, §2a #32 surface): row-at-a-time Python,
  kept as the API demonstration and equality-tested against the JVM
  path in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_glue_spark.operators.text import words


def sliding_token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 16,
) -> DataFrame:
    """JVM path: one narrow projection + explode; window starts are
    ``sequence(1, max(n_tokens - size + 1, 1), stride)`` (1-based
    internally, surfaced 0-based)."""
    base = df.select(F.col(id_col), words(text_col).alias("__w"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("__w") - F.lit(size - 1), F.lit(1)),
        F.lit(stride),
    )
    exploded = base.select(id_col, "__w", F.explode(starts).alias("__s"))
    return exploded.select(
        id_col,
        (F.col("__s") - 1).cast("int").alias("win_start"),
        F.concat_ws(" ", F.slice("__w", F.col("__s"), size)).alias("win_text"),
    )


def sliding_token_windows_udtf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Python-UDTF path (arrow-disabled row generator): registered as a
    table function and applied via LATERAL join. Same output contract as
    :func:`sliding_token_windows`."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_start int, win_text string")
    class SlidingWindows:
        def eval(self, text: str, size: int, stride: int):
            toks = [t for t in (text or "").split() if t]
            last = max(len(toks) - size, 0)  # 0-based final window start
            for s in range(0, last + 1, stride):
                yield s, " ".join(toks[s : s + size])

    spark = df.sparkSession
    spark.udtf.register("hgs_sliding_windows", SlidingWindows)
    df.select(F.col(id_col), F.col(text_col).alias("__text")).createOrReplaceTempView(
        "__hgs_udtf_in"
    )
    return spark.sql(
        f"""
        SELECT {id_col}, w.win_start, w.win_text
        FROM __hgs_udtf_in,
             LATERAL hgs_sliding_windows(__text, {int(size)}, {int(stride)}) w
        """
    )
