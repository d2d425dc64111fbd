"""Temporal join operators: as-of join and interval/range join.

Spark has no native as-of or interval join; these are the §2b-style
custom operators built as compositions of DataFrame ops (SURVEY.md
"custom operators" path (a) — no Python in the hot path).

Scale design notes
------------------
- ``asof_join`` uses the union + partitioned-window formulation: ONE
  shuffle of (left ∪ right) by the `by` keys, then a running
  last-non-null within each partition. The naive alternative — a
  non-equi join then per-left-row max — is a quadratic blowup per key;
  this form is linear in rows per key and survives 100× scale-up as
  long as keys stay bounded (skewed single keys can be salted upstream).
- ``point_in_interval_join`` equi-joins on a time/value *bucket* derived
  on both sides (interval rows explode into covered buckets), then
  refines with the exact range predicate. Bucket width trades shuffle
  fan-out vs. false candidates; a broadcast hint keeps the tiny-interval
  case (dimension bands, calendars) shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SRC = "_asof_src"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: list[str],
    right_values: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: attach, to every left row, the most recent
    ``right`` row with ``right.ts <= left.ts`` within the same ``by``
    keys (inclusive at equality — DuckDB/pandas ``merge_asof``
    semantics). Unmatched left rows keep NULLs.

    ``right_values`` are the right columns carried over (each emitted as
    ``asof_<name>``); carry ``ts`` itself to know the match time.
    ``tolerance`` (an INTERVAL string, e.g. ``'2 days'``) voids matches
    older than ``left.ts - tolerance``.

    Caveat: a NULL in a right value column is indistinguishable from
    "no match yet" for that column, because the implementation is a
    running ``last(col, ignorenulls=True)``.
    """
    l_tagged = left.withColumn(_SRC, F.lit(1))
    # _asof_rts: the right row's own ts, carried so the match time is
    # always known (tolerance check, and `asof_<ts>` when requested).
    r_tagged = right.select(
        *by,
        ts,
        F.col(ts).alias("_asof_rts"),
        *[F.col(c).alias(f"asof_{c}") for c in right_values if c != ts],
    ).withColumn(_SRC, F.lit(0))
    # Right rows sort before left rows at equal ts → inclusive match.
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts, _SRC)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"asof_{c}" for c in right_values if c != ts] + ["_asof_rts"]
    out = unioned
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col(_SRC) == 1).drop(_SRC)
    if tolerance is not None:
        cond = F.col("_asof_rts") >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        for c in carried:
            out = out.withColumn(c, F.when(cond, F.col(c)))
    if ts in right_values:
        out = out.withColumn(f"asof_{ts}", F.col("_asof_rts"))
    return out.drop("_asof_rts")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float | None = None,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Join points to the intervals containing them
    (``lo <= point < hi``).

    With ``bucket_width`` set, both sides gain an equi-join bucket key
    (intervals explode into every bucket they cover), turning the
    non-equi join into hash-partitionable work — the path for LARGE
    interval sets. Without it, intervals are broadcast (the dimension-
    table case) and Catalyst does a broadcast nested-loop with the range
    predicate — optimal when intervals fit in memory.
    """
    on = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    if bucket_width is None:
        iv = F.broadcast(intervals) if broadcast_intervals else intervals
        return points.join(iv, on)
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width))
    hi_b_raw = F.floor(F.col(hi_col) / F.lit(bucket_width))
    # hi is exclusive: a hi landing exactly on a bucket edge contributes
    # nothing to that bucket. Decided by arithmetic on the bucket index
    # (is hi exactly the edge?) rather than a float epsilon, so integer
    # and decimal domains bucket correctly too. greatest() keeps
    # degenerate (hi <= lo) intervals to one bucket — the range
    # predicate in the join removes them.
    hi_b = F.when(
        F.col(hi_col) == hi_b_raw * F.lit(bucket_width), hi_b_raw - 1
    ).otherwise(hi_b_raw)
    ib = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(lo_b, F.greatest(lo_b, hi_b))),
    )
    return pb.join(ib, (pb["_bucket"] == ib["_bucket"]) & on).drop("_bucket")


def lag_gap_sessions(
    events: DataFrame, ts: str, by: list[str], gap_minutes: int
) -> DataFrame:
    """Batch sessionization (lag + running sum) — the batch twin of
    ``streaming.windowed.session_windows``, same boundary semantics
    (new session when the gap to the previous event is >= gap)."""
    w = Window.partitionBy(*by).orderBy(ts)
    # Microsecond precision — a long cast would truncate to seconds and
    # disagree with session_window at sub-second gaps.
    gap: Column = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w)
    new_s = F.when(
        gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_id", sid)


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Arbitrary-width time bucketing (TimescaleDB ``time_bucket``
    parity): the bucket start for ``ts`` at ``width_seconds``
    granularity — not limited to ``date_trunc``'s calendar units, so
    15-minute / 6-hour / 2-day hypertable rollups are one expression.
    Pure integer epoch arithmetic; identical in any engine given a
    pinned session timezone."""
    c = F.col(ts) if isinstance(ts, str) else ts
    w = F.lit(width_seconds).cast("long")
    return F.timestamp_seconds(
        (F.unix_timestamp(c) - F.pmod(F.unix_timestamp(c), w))
    )


def hypertable_rollup(
    df: DataFrame,
    ts: str,
    grains: dict[str, int],
    *aggs: Column,
    keys: list[str] | None = None,
) -> DataFrame:
    """Continuous-aggregate hierarchy in ONE pass: every granularity of
    a hypertable rollup (e.g. 15 min / 1 h / 1 d), computed together.

    Each input row explodes into one (grain, bucket) pair per
    granularity, then a single groupBy aggregates all levels at once —
    one shuffle total, versus one full scan + shuffle per granularity
    for the naive union-of-rollups. The fan-out factor is
    ``len(grains)`` (3-4 in practice), which at 100 TB is vastly
    cheaper than re-scanning the corpus per level; the shuffle keys
    (grain, bucket, *keys) are high-cardinality and skew-free by
    construction. Coarser grains aggregate from raw rows, not from the
    finer grain — so the levels are independently exact even for
    non-decomposable aggregates.
    """
    reserved = {"grain", "bucket_start"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"hypertable_rollup injects columns {sorted(reserved)}; "
            "rename them on the input first"
        )
    c = F.col(ts)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("grain"),
                time_bucket(c, secs).alias("bucket_start"),
            )
            for name, secs in grains.items()
        ]
    )
    exploded = df.withColumn("__g", F.explode(pairs)).select(
        F.col("__g.grain").alias("grain"),
        F.col("__g.bucket_start").alias("bucket_start"),
        *df.columns,
    )
    return exploded.groupBy("grain", "bucket_start", *(keys or [])).agg(*aggs)
