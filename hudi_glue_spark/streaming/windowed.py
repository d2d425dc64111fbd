"""Watermarked window aggregations over event-time streams.

Both operators are pure built-in Spark (``window`` / ``session_window``
+ hash aggregation) — JVM-side, incremental state store, no Python in
the hot path. Late data beyond the watermark is dropped by Spark; late
data within it updates the open window, which is exactly the reference's
day=2 late-batch semantics (glue/NYTaxiDataPrep.py:21,25) expressed as
a stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    stream: DataFrame,
    ts_col: str,
    window: str,
    *aggs: Column,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window aggregation with a watermark.

    Returns ``window_start``/``window_end`` plus ``keys`` and ``aggs``.
    State per (window, keys) only — bounded by the watermark horizon, so
    state size is O(active windows), independent of total stream length:
    the property that makes this run forever on a 100 TB/day stream.
    """
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *(keys or []))
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_windows(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    *aggs: Column,
    keys: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows (``F.session_window``): a session per
    ``keys`` closes after ``gap`` of inactivity. Built-in stateful
    operator — sessions merge server-side as events arrive out of order
    (within the watermark).
    """
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )
