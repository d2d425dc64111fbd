"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

This file is a thin adapter over :mod:`hudi_glue_spark.queries`, which
holds the actual inventory (each entry registered with both its Spark
implementation and its ANSI-SQL oracle side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hudi_glue_spark import queries as Q  # noqa: E402

# Importing these modules registers their queries into Q's registry.
import hudi_glue_spark.scenario_queries  # noqa: E402,F401
import hudi_glue_spark.llm_queries  # noqa: E402,F401
import hudi_glue_spark.streaming_queries  # noqa: E402,F401
import hudi_glue_spark.temporal_queries  # noqa: E402,F401
import hudi_glue_spark.analytics_queries  # noqa: E402,F401
import hudi_glue_spark.tpch_queries  # noqa: E402,F401
import hudi_glue_spark.pipeline_queries  # noqa: E402,F401
import hudi_glue_spark.io_queries  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return Q.SPARK_QUERIES["lineitem_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, yielded in
    driver-window priority order (one representative per §2a operator
    first — see ``queries.DRIVER_WINDOW_PRIORITY``)."""
    return {n: Q.SPARK_QUERIES[n] for n in Q.ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return {
        n: Q.ORACLE_QUERIES[n]
        for n in Q.ordered_query_names()
        if n in Q.ORACLE_QUERIES
    }
