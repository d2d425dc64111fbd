"""Scalar expression helpers (SURVEY.md §2a #16-21).

Everything here is a thin, named composition of built-in
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def surrogate_key(offset: int = 1) -> Column:
    """``monotonically_increasing_id() + offset``.

    Parity with glue/NYTaxiDataPrep.py:33. WARNING (FIXTURES.md hazard):
    values depend on scan partitioning and are only stable across
    re-reads if the partitioning is identical. Prefer
    :func:`stable_surrogate_key` for anything persisted.
    """
    return F.monotonically_increasing_id() + F.lit(offset)


def stable_surrogate_key(df: DataFrame, order_by: list[str], name: str = "pk_col") -> DataFrame:
    """Deterministic dense surrogate key: row_number over a stable sort.

    The scale-safe replacement for ``monotonically_increasing_id`` —
    same value for the same row regardless of scan partitioning. Costs
    one global sort; use at fixture/ingest time, not in hot query paths.
    """
    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(name, F.row_number().over(w).cast("long"))


def let_(value: Column, body) -> Column:
    """Bind an array expression ONCE and hand the bound value to
    ``body`` as a lambda variable — the expression-level ``let``.

    Why it exists (r15 optimization): higher-order-function lambdas run
    interpreted, with NO common-subexpression elimination, so a lambda
    that references an outer non-attribute expression re-evaluates that
    whole expression PER ELEMENT. ``transform(starts(ws), i ->
    slice(ws, i, n))`` with ``ws = split(text)`` re-splits the document
    once per gram — O(len²) character work that measured 5-8× the
    useful cost on the winnowing/shingling rows. Wrapping the value in
    a one-element array and binding it through ``transform`` makes
    every reference inside ``body`` a lambda-variable read (O(1)):

        let_(words(text), lambda ws: F.transform(..., slice(ws, i, n)))

    Works for any expression whose type is legal in an array (arrays,
    structs, scalars). Purely a plan-shape change — same values.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def ts_from_string(value: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """String → timestamp via unix_timestamp, as the reference does it
    (glue/NYTaxiDataPrep.py:37,42,47; glue/HudiJarGlueJob.py:74)."""
    col = F.lit(value) if isinstance(value, str) else value
    return F.unix_timestamp(col, fmt).cast("timestamp")


def hive_partition_value(partition_col: str) -> Column:
    """``concat(lit('col='), col)`` — the reference's hand-built
    Hive-style partition string (glue/HudiJarGlueJob.py:102,121).

    Kept for API parity; the engine's own writes use ``partitionBy``
    which produces this layout natively.
    """
    return F.concat(F.lit(partition_col + "="), F.col(partition_col).cast("string"))
