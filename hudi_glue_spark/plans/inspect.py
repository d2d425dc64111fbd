"""Plan inspection helpers — make the ".explain and iterate" loop
scriptable (and assertable in tests).

The reference has no optimizer of its own (SURVEY.md §4); these helpers
exist to PROVE the Spark-native plans behave: filters reach the parquet
scan, projections prune columns, small dims broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning check)."""
    txt = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def assert_broadcast_join(df: DataFrame) -> None:
    txt = explain_str(df)
    assert "BroadcastHashJoin" in txt or "BroadcastNestedLoopJoin" in txt, (
        "expected a broadcast join in plan:\n" + txt[:2000]
    )
