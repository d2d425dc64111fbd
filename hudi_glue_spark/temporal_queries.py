"""Temporal operator queries: as-of join, interval/range join, batch
sessionization. DuckDB's native ASOF JOIN makes the as-of semantics
oracle-checkable down to the value level."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_glue_spark.operators.temporal import (
    asof_join,
    lag_gap_sessions,
    point_in_interval_join,
)
from hudi_glue_spark.queries import query, table

_N_BANDS = 16
_BAND_W = 25.0


@query(
    "asof_last_view_before_purchase",
    """
    SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
    """,
)
def q_asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent view at-or-before it
    (NULL if none): the canonical as-of join, implemented as one shuffle
    by user + a running last-non-null — checked against DuckDB's native
    ASOF LEFT JOIN."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = asof_join(purchases, views, ts="ts", by=["user_id"], right_values=["ts"])
    return out.select(
        "event_id", "user_id", "ts", F.col("asof_ts").alias("view_ts")
    )


@query(
    "events_value_band_join",
    f"""
    WITH bands AS (
      SELECT i AS band_id, i * {_BAND_W} AS lo, (i + 1) * {_BAND_W} AS hi
      FROM range({_N_BANDS}) t(i)
    )
    SELECT band_id, lo, hi,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band_id, lo, hi
    """,
)
def q_events_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events against value bands (lo <= value < hi), then a
    per-band rollup. The band table is broadcast — a broadcast
    nested-loop with the range predicate, zero shuffle on the fact side
    before the final aggregation."""
    ev = table(spark, sf_dir, "events")
    bands = spark.range(_N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * _BAND_W).cast("double").alias("lo"),
        ((F.col("id") + 1) * _BAND_W).cast("double").alias("hi"),
    )
    joined = point_in_interval_join(ev, bands, "value", "lo", "hi")
    return joined.groupBy("band_id", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "sessions_batch",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def q_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (lag + running sum) with the same boundary
    semantics as the streaming ``session_window`` query — batch and
    stream provably agree on session boundaries."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    s = lag_gap_sessions(ev, "ts", ["user_id"], gap_minutes=30)
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).select("session_start", "session_end", "user_id", "n_events")


#: hypertable rollup granularities (seconds): 15 min / 6 h / 1 d —
#: deliberately NOT all calendar units, to exercise arbitrary-width
#: bucketing (date_trunc can't express 15 min or 6 h).
_ROLLUP_GRAINS = {"15m": 900, "6h": 21600, "1d": 86400}


def _bucket_sql(width: int) -> str:
    # floor(), not CAST: DuckDB's double->BIGINT cast ROUNDS, while
    # Spark's unix_timestamp floors away sub-second fractions.
    return (
        f"to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) "
        f"- CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) % {width})"
        f"::TIMESTAMP"
    )


@query(
    "hypertable_rollup_hierarchy",
    "\nUNION ALL\n".join(
        f"""
        SELECT '{name}' AS grain, {_bucket_sql(secs)} AS bucket_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2, 3
        """
        for name, secs in _ROLLUP_GRAINS.items()
    ),
)
def q_hypertable_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup (TimescaleDB continuous-aggregate hierarchy):
    15-minute, 6-hour and 1-day rollups of the events stream computed
    in ONE pass — each row explodes into its three (grain, bucket)
    pairs and a single groupBy aggregates every level, one shuffle
    total versus one scan+shuffle per level for the naive plan. The
    grains are arbitrary widths (time_bucket epoch arithmetic), not
    calendar truncs. The oracle computes each level independently with
    per-level GROUP BYs and must match every bucket at every grain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from hudi_glue_spark.operators.temporal import hypertable_rollup

    ev = table(spark, sf_dir, "events").select("event_type", "value", "ts")
    return hypertable_rollup(
        ev,
        "ts",
        _ROLLUP_GRAINS,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        keys=["event_type"],
    )
