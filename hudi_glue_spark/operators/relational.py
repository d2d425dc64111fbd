"""Relational operators from the reference surface (SURVEY.md §2a #12-22).

Each helper is deliberately a very thin named wrapper over the DataFrame
API: the value is the documented parity mapping (and the test/oracle
coverage), not abstraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """``df.drop(*cols)`` — glue/HudiJarGlueJob.py:39,95 (identity when
    the list is empty, as it is in the reference)."""
    return df.drop(*cols) if cols else df


def filter_eq(df: DataFrame, column: str, value) -> DataFrame:
    """Equality filter — glue/NYTaxiDataPrep.py:37,47."""
    return df.filter(F.col(column) == F.lit(value))


def conditional_rewrite(df: DataFrame, column: str, cond: Column, value) -> DataFrame:
    """``withColumn(c, when(cond, v))`` with NO ``otherwise`` — non-matching
    rows become NULL, exactly as glue/NYTaxiDataPrep.py:37,47. The NULL
    fallthrough is reference behavior and is covered by tests."""
    return df.withColumn(column, F.when(cond, value))


def with_derived(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """``withColumn`` — glue/HudiJarGlueJob.py:74 et al."""
    return df.withColumn(name, expr)


def is_non_empty(df: DataFrame) -> bool:
    """Non-empty guard. The reference runs a full ``count() > 0``
    (glue/HudiJarGlueJob.py:96,115) which re-scans everything; at 100 TB
    that is an extra full pass. ``isEmpty()`` short-circuits after the
    first non-empty partition."""
    return not df.isEmpty()
