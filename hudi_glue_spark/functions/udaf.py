"""Grouped-aggregate pandas UDFs (the UDAF surface, SURVEY.md §2a #32).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the Series→scalar signature from REAL type hints; stringified
annotations break its inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median of a group (order statistic — no float-summation
    order to diverge across partitions/engines)."""
    return float(v.median())


@pandas_udf("long")
def count_udaf(v: pd.Series) -> int:
    """Group size. Spark disallows mixing pandas and JVM aggregates in
    one ``agg`` — pair this with other pandas UDAFs instead."""
    return int(len(v))
