"""Driver-facing Structured Streaming queries (SURVEY.md §2a #31).

Each runs a real streaming query (file source → stateful operator →
sink) to completion under ``Trigger.AvailableNow`` and returns the final
answer as a batch DataFrame, so the driver's DuckDB oracle can check a
genuinely streaming execution against single-statement SQL.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_glue_spark.queries import query, sf_tag, table
from hudi_glue_spark.scenario_queries import _BATCHES_CTE, _batches
from hudi_glue_spark.streaming.ingest import run_to_memory, stream_ingest
from hudi_glue_spark.streaming.sources import stream_parquet, stream_table
from hudi_glue_spark.streaming.stateful import running_user_totals
from hudi_glue_spark.streaming.windowed import session_windows, tumbling_agg
from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table.keyed_table import EVENT_TIME_WINS

_COLS = ["event_id", "user_id", "event_type", "value", "ts"]


def _workdir(tag: str, sf_dir: str) -> str:
    root = f"/tmp/hudi_glue_spark_stream_{tag}_{sf_tag(sf_dir)}"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    return root


@query(
    "stream_tumbling_counts",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type over a *streamed* events
    table, complete-mode memory sink. Decimal-cast sum keeps the result
    independent of micro-batch boundaries (IEEE754 sums are not)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("tumble", sf_dir)
    ev = stream_table(spark, sf_dir, "events")
    agg = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        keys=["event_type"],
    )
    return run_to_memory(spark, agg, f"{wd}/ckpt")


@query(
    "stream_session_windows",
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
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based per-user sessions (30 min) via the built-in
    ``session_window`` stateful operator; the oracle re-derives the same
    sessions with lag + running-sum SQL (a session starts when the gap
    to the previous event is >= 30 min; end = last event + gap)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("session", sf_dir)
    ev = stream_table(spark, sf_dir, "events")
    agg = session_windows(
        ev, "ts", "30 minutes", F.count("*").alias("n_events"), keys=["user_id"]
    )
    return run_to_memory(spark, agg, f"{wd}/ckpt")


@query(
    "stream_keyed_ingest",
    _BATCHES_CTE
    + """
    SELECT event_id, user_id, event_type, value, ts FROM (
      SELECT u.*, row_number() OVER (PARTITION BY event_id
                                     ORDER BY ts DESC, src DESC) AS rn
      FROM u
    ) WHERE rn = 1
    """,
)
def q_stream_keyed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's day=0/1/2 incremental scenario as a STREAM: the
    three batches land as files, a file-source stream drains them with
    ``maxFilesPerTrigger=1``, and ``foreachBatch`` merges each into a
    KeyedTable (event-time policy). Final table must equal the batch
    upsert oracle — streaming and batch ingestion agree.

    ``key_scope="partition"``: an event's ``event_type`` is an immutable
    attribute (no batch ever rewrites it), so a key lives only in its
    own partition and each micro-batch commit skips the global old-host
    probe — one full-table semi-join job per trigger gone. That
    declaration is the per-commit lever for streaming ingest at scale:
    with global scope every trigger pays an ``existing`` scan just to
    learn what a schema fact already guarantees. Identical results
    either way here (event_id is unique and its partition never moves);
    the batch-upsert scenarios keep global scope because the
    reference's day=1 batch genuinely rewrites the partition column."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("ingest", sf_dir)
    staging = f"{wd}/staging"
    os.makedirs(staging)
    # Land the three scenario batches as single files, mtime-ordered so
    # the file source replays them in scenario order.
    for i, b in enumerate(_batches(spark, sf_dir)):
        tmp = f"{wd}/b{i}_tmp"
        b.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{staging}/batch_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp)
    tbl = KeyedTable(
        f"{wd}/table",
        key="event_id",
        precombine="ts",
        partition_by="event_type",
        policy=EVENT_TIME_WINS,
        key_scope="partition",
    )
    stream = stream_parquet(spark, staging, max_files_per_trigger=1)
    q = stream_ingest(tbl, stream, f"{wd}/ckpt")
    # returns False WITHOUT raising on timeout — fail loud rather than
    # reading a partially-ingested table
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("keyed-ingest stream did not drain in 300s")
    return tbl.read(spark).select(_COLS)


@query(
    "stream_running_totals",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS total_value_cents,
           max(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def q_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    running counters in integer cents, emitted every micro-batch in
    update mode; the last emission per user must equal the global batch
    aggregate."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("totals", sf_dir)
    ev = stream_table(spark, sf_dir, "events").select("user_id", "value", "ts")
    out = run_to_memory(
        spark, running_user_totals(ev), f"{wd}/ckpt", output_mode="update"
    )
    # Update mode appends one row per (user, batch); keep the final
    # emission (n_events strictly increases within a user).
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "stream_dim_join_windowed",
    """
    WITH bands AS (
      SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
      FROM range(8) t(i)
    )
    SELECT date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           b.band_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY 1, 2
    """,
)
def q_stream_dim_join_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-to-static join: the event stream joins a broadcast value-
    band dimension (range predicate) BEFORE a tumbling-window count —
    the enrich-then-aggregate streaming shape. The static side never
    enters state; only (window, band) counters persist."""
    from hudi_glue_spark.operators.temporal import point_in_interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("dimjoin", sf_dir)
    ev = stream_table(spark, sf_dir, "events")
    bands = spark.range(8).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50.0).cast("double").alias("lo"),
        ((F.col("id") + 1) * 50.0).cast("double").alias("hi"),
    )
    joined = point_in_interval_join(ev, bands, "value", "lo", "hi")
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "band_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "band_id",
            "n_events",
        )
    )
    return run_to_memory(spark, agg, f"{wd}/ckpt")


@query(
    "stream_dedup_exact",
    """
    SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value,
           CAST(ts AS TIMESTAMP) AS ts
    FROM events
    """,
)
def q_stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: the events table lands TWICE (two files,
    two micro-batches) and a stateful ``dropDuplicates`` on the key
    emits each event exactly once — the training-pipeline guard against
    re-delivered input. State is O(distinct keys) within the watermark
    horizon."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("dedup", sf_dir)
    staging = f"{wd}/staging"
    os.makedirs(staging)
    ev = table(spark, sf_dir, "events").select(_COLS)
    for i in range(2):  # same data twice = duplicated delivery
        tmp = f"{wd}/b{i}_tmp"
        ev.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{staging}/copy_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp)
    stream = stream_parquet(spark, staging, max_files_per_trigger=1)
    deduped = stream.withWatermark("ts", "90 days").dropDuplicates(["event_id"])
    return run_to_memory(spark, deduped, f"{wd}/ckpt", output_mode="append")


@query(
    "stream_stream_interval_join",
    """
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           p.ts AS purchase_ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
     AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
    """,
)
def q_stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM join: purchases joined to views of the same user
    within the preceding hour, both sides watermarked so join state is
    bounded by the time-range condition (Spark drops buffered rows once
    the watermark passes their joinable horizon). The oracle is the
    equivalent batch interval join."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("ssjoin", sf_dir)
    ev1 = stream_table(spark, sf_dir, "events")
    ev2 = stream_table(spark, sf_dir, "events")
    p = (
        ev1.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    v = (
        ev2.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("view_ts") <= F.col("purchase_ts")),
    ).select("purchase_id", "view_id", "user_id", "purchase_ts", "view_ts")
    return run_to_memory(spark, joined, f"{wd}/ckpt", output_mode="append")


from hudi_glue_spark.scenario_queries import CDF_AGG_ORACLE as _CDF_AGG_ORACLE


@query("stream_cdf_agg_maintenance", _CDF_AGG_ORACLE)
def q_stream_cdf_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental view maintenance: the per-commit pre/post-
    image change feeds of the CDF scenario table land as files, a file
    stream drains them one micro-batch per commit, and foreachBatch
    merges each delta into a materialized per-user aggregate table —
    read-modify-write touching ONLY the users in that delta, one
    KeyedTable commit per micro-batch. The maintained view (seeded with
    the aggregate at c0) must equal a from-scratch aggregate of the
    final snapshot, the same oracle as the batch cdf_incremental_agg —
    proving the batch and streaming maintenance paths agree. At 100 TB
    this is the standing pipeline that keeps a derived table fresh for
    the cost of each day's delta: the feed is O(changed rows), the
    merge is O(changed users), and restarts are safe because the
    checkpoint and the view's commit log advance together."""
    from hudi_glue_spark.scenario_queries import _cdf_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _cdf_table(spark, sf_dir)
    c0, c1, c2 = src.commits()

    wd = _workdir("cdfivm", sf_dir)
    staging = f"{wd}/staging"
    os.makedirs(staging)
    feeds = [
        src.diff_commits(spark, c0, c1, images="both"),
        src.diff_commits(spark, c1, c2, images="both"),
    ]
    for i, feed in enumerate(feeds):
        tmp = f"{wd}/f{i}_tmp"
        feed.select("user_id", "value", "_change_type").coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = f"{staging}/feed_{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        shutil.rmtree(tmp)

    dec = F.col("value").cast("decimal(18,4)")
    view = KeyedTable(f"{wd}/view", key="user_id", precombine="ver")
    view.bulk_insert(
        src.read(spark, at=c0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(dec).alias("s"),
        )
        .withColumn("ver", F.lit(0).cast("long"))
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # Idempotency ledger: foreachBatch is at-least-once — a crash
        # after the upsert but before the checkpoint commits the offset
        # replays this batch on restart. Each applied batch stamps its
        # version into the view's COMMIT STATS (metadata-only, via
        # upsert extra_stats), so a replay is detected by metadata
        # reads — not by re-aggregating the materialized view, which
        # at large view cardinality would be a per-batch table scan
        # for one scalar. max_stat scans ALL retained commits, so an
        # interleaved non-stamping commit (optimize, delete) cannot
        # reset the ledger. The rows still carry ver for audit.
        applied = view.max_stat("applied_ver")
        if batch_id + 1 <= applied:
            return
        pos = F.col("_change_type").isin("insert", "update_postimage")
        delta = batch.groupBy("user_id").agg(
            F.sum(F.when(pos, 1).otherwise(-1)).cast("long").alias("dn"),
            F.sum(F.when(pos, dec).otherwise(-dec)).alias("ds"),
        )
        cur = view.read(spark).select("user_id", "n_events", "s")
        zero = F.lit(0).cast("decimal(18,4)")
        touched = delta.join(cur, "user_id", "left").select(
            "user_id",
            (F.coalesce("n_events", F.lit(0)) + F.col("dn"))
            .cast("long")
            .alias("n_events"),
            (F.coalesce(F.col("s"), zero) + F.col("ds")).alias("s"),
            F.lit(batch_id + 1).cast("long").alias("ver"),
        )
        view.upsert(touched, extra_stats={"applied_ver": batch_id + 1})

    q = (
        stream_parquet(spark, staging, max_files_per_trigger=1)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{wd}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False WITHOUT raising — falling
    # through on a timeout would read a partially-maintained view.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("CDF maintenance stream did not drain in 300s")
    return (
        view.read(spark)
        .filter(F.col("n_events") > 0)
        .select("user_id", "n_events", F.col("s").cast("double").alias("sum_value"))
    )


_TBLCHANGES_CACHE: dict[str, KeyedTable] = {}


def _tblchanges_src(spark, sf_dir) -> KeyedTable:
    """stream_table_changes' SOURCE table (bulk + two upsert_dv
    commits), built once per process per sf: the commit log is
    append-only and the build deterministic, so re-draining it per
    run is exactly the replay the row exists to time."""
    root = f"/tmp/hudi_glue_spark_stream_tblchanges_src_{sf_tag(sf_dir)}"
    cached = _TBLCHANGES_CACHE.get(root)
    if cached is not None and os.path.isdir(root):
        return cached
    shutil.rmtree(root, ignore_errors=True)
    src = KeyedTable(
        root,
        key="event_id",
        precombine="ts",
        partition_by="event_type",
        policy=EVENT_TIME_WINS,
    )
    b0, b1, b2 = _batches(spark, sf_dir)
    src.bulk_insert(b0)
    src.upsert_dv(b1)
    src.upsert_dv(b2)  # all-stale under event-time: delta may be empty
    _TBLCHANGES_CACHE[root] = src
    return src


@query(
    "stream_table_changes",
    _BATCHES_CTE
    + """
    SELECT event_id, user_id, event_type, value, ts FROM (
      SELECT u.*, row_number() OVER (PARTITION BY event_id
                                     ORDER BY ts DESC, src DESC) AS rn
      FROM u
    ) WHERE rn = 1
    """,
)
def q_stream_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KeyedTable COMMIT LOG as a native streaming SOURCE (Hudi
    incremental streaming-read parity — the consumption side of the
    reference's pipeline): ``stream_changes`` opens the table via the
    keyed_table_changes Python Data Source, offsets are commit ids in
    the stream checkpoint, and every micro-batch carries the rows the
    newly-visible commits ADDED (O(delta) metadata planning on the
    driver, pyarrow decode in executor tasks — no snapshot rescan).

    Scenario: the day 0/1/2 batches land as bulk_insert + two
    upsert_dv commits (MoR appends, so each commit's delta is exactly
    its winning rows); a downstream pipeline tails the log and
    re-applies each commit's delta IN COMMIT ORDER into a derived
    table. The reconstructed table must equal the standard event-time
    upsert oracle — proving the stream is a complete, ordered,
    replayable change carrier."""
    from hudi_glue_spark.streaming.table_source import stream_changes

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = _tblchanges_src(spark, sf_dir)
    # fresh view + checkpoint per run: the DRAIN + REPLAY is what this
    # row times; the 3-commit source builds once per process (§9d#4
    # hygiene — bench.py charges it to a ``commit:`` row)
    wd = _workdir("tblchanges_view", sf_dir)
    view = KeyedTable(
        f"{wd}/view",
        key="event_id",
        precombine="ts",
        policy=EVENT_TIME_WINS,
    )

    def _apply(batch: DataFrame, _bid: int) -> None:
        # one availableNow micro-batch may span several commits —
        # apply them in commit order so the derived table replays the
        # log, not an arbitrary interleaving
        cids = [r[0] for r in batch.select("_commit").distinct().collect()]
        for cid in sorted(cids):
            delta = batch.filter(F.col("_commit") == cid).drop("_commit")
            from hudi_glue_spark.table import ingest

            ingest(view, delta)

    q = (
        stream_changes(spark, src, starting="earliest")
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{wd}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("table-changes stream did not drain in 300s")
    return view.read(spark).select(_COLS)


_CDF_SRC_CACHE: dict[str, KeyedTable] = {}


def _cached_src(spark, sf_dir, tag: str, build) -> KeyedTable:
    """Per-process source-table cache for the CDF stream rows: the
    commit log is append-only and the build deterministic, so the
    FRESH-CHECKPOINT drain each row times is an exact replay —
    rebuilding the source per run only re-times the fixture (§9d#4
    hygiene; bench.py charges builds to ``commit:`` rows)."""
    root = f"/tmp/hudi_glue_spark_stream_{tag}_src_{sf_tag(sf_dir)}"
    cached = _CDF_SRC_CACHE.get(root)
    if cached is not None and os.path.isdir(root):
        return cached
    shutil.rmtree(root, ignore_errors=True)
    src = build(root)
    _CDF_SRC_CACHE[root] = src
    return src


def _cdfexact_src(spark, sf_dir) -> KeyedTable:
    """stream_cdf_exact_rewrite's table: bulk + one small CoW rewrite."""

    def build(root):
        src = KeyedTable(
            root, key="event_id", precombine="ts",
            partition_by="event_type", policy=EVENT_TIME_WINS,
        )
        b0, b1, _b2 = _batches(spark, sf_dir)
        src.bulk_insert(b0.select(_COLS))
        src.upsert(b1.filter("event_id % 101 = 0").select(_COLS))
        return src

    return _cached_src(spark, sf_dir, "cdfexact", build)


def _cdfchanges_src(spark, sf_dir) -> KeyedTable:
    """stream_cdf_changes' table: bulk + sequenced DV predicate DML."""

    def build(root):
        src = KeyedTable(
            root, key="event_id", precombine="ts",
            partition_by="event_type", policy=EVENT_TIME_WINS,
            stats_cols=["event_id", "ts"],
        )
        b0, _b1, _b2 = _batches(spark, sf_dir)
        src.bulk_insert(b0.select(_COLS))
        src.update_where_dv(
            spark, {"value": "value + 100.0"},
            "event_type = 'click' AND value < 50.0",
        )
        src.delete_where_dv(spark, "value >= 180.0")
        return src

    return _cached_src(spark, sf_dir, "cdfchanges", build)


def _cdfchlog_src(spark, sf_dir) -> KeyedTable:
    """stream_cdf_changelog's table: change_log=True, bulk + a ~9%
    upsert + a predicate-shaped delete, each recording its delta."""

    def build(root):
        src = KeyedTable(
            root, key="event_id", precombine="ts",
            partition_by="event_type", policy=EVENT_TIME_WINS,
            change_log=True,
        )
        b0, b1, _b2 = _batches(spark, sf_dir)
        src.bulk_insert(b0.select(_COLS))
        src.upsert(b1.filter("event_id % 11 = 0").select(_COLS))
        src.delete(
            src.read(spark)
            .filter("event_id % 103 = 0")
            .select("event_id")
        )
        return src

    return _cached_src(spark, sf_dir, "cdfchlog", build)


@query(
    "stream_cdf_exact_rewrite",
    _BATCHES_CTE
    + """
    , merged AS (
      SELECT event_id, user_id, event_type, value, ts FROM (
        SELECT u.*, row_number() OVER (PARTITION BY event_id
                                       ORDER BY ts DESC, src DESC) AS rn
        FROM u
        WHERE src = 0 OR (src = 1 AND event_id % 101 = 0)
      ) WHERE rn = 1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           TRUE AS exact_delta
    FROM merged GROUP BY event_type
    """,
)
def q_stream_cdf_exact_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT row-level CDF through a COPY-ON-WRITE rewrite (VERDICT r9
    #6; table_source.py rewrite entries): a small upsert rewrites the
    whole click partition, but the stream's one-task multiset diff
    emits only the truly-changed rows — asserted by VOLUME (the
    rewrite commit streams ≤4× the update batch, where the coarse
    contract would stream the partition twice over) — and a consumer
    maintaining a per-type aggregate by pure +insert/−delete
    arithmetic hash-matches the from-scratch SQL of the merged final
    state. This is the difference between a downstream per-row
    consumer (audit log, cache invalidation) seeing k changes vs
    2×|partition| on every CoW commit."""
    import decimal

    from hudi_glue_spark.streaming.table_source import stream_changes

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("cdfexact_ck", sf_dir)
    src = _cdfexact_src(spark, sf_dir)
    _b0, b1, _b2 = _batches(spark, sf_dir)
    n_upd = b1.filter("event_id % 101 = 0").count()
    c_rewrite = src.commits()[-1]

    acc: dict[str, list] = {}  # event_type -> [n, decimal sum]
    vol: dict[str, int] = {}  # commit -> streamed row volume

    def _apply(batch: DataFrame, _bid: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        rows = (
            batch.groupBy("_commit", "event_type")
            .agg(
                F.count("*").alias("vol"),
                F.sum(sign).alias("dn"),
                F.sum(
                    sign * F.col("value").cast("decimal(18,4)")
                ).alias("dv"),
            )
            .collect()
        )
        for r in rows:  # O(commits x types) driver rows
            vol[r["_commit"]] = vol.get(r["_commit"], 0) + r["vol"]
            slot = acc.setdefault(r["event_type"], [0, decimal.Decimal(0)])
            slot[0] += r["dn"]
            slot[1] += decimal.Decimal(r["dv"])

    q = (
        stream_changes(spark, src, starting="earliest", mode="cdf")
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{wd}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("exact-rewrite CDF stream did not drain in 300s")
    # volume proof: exact path streamed ~2x the changed rows, not
    # 2x the rewritten partition (coarse would be >> 4x the batch)
    exact = 0 < vol.get(c_rewrite, 0) <= 4 * max(n_upd, 1)
    return spark.createDataFrame(
        [(k, v[0], float(v[1]), exact) for k, v in sorted(acc.items())],
        "event_type string, n_events long, sum_value double, "
        "exact_delta boolean",
    )


@query(
    "stream_cdf_changelog",
    _BATCHES_CTE
    + """
    , merged AS (
      SELECT event_id, user_id, event_type, value, ts FROM (
        SELECT u.*, row_number() OVER (PARTITION BY event_id
                                       ORDER BY ts DESC, src DESC) AS rn
        FROM u
        WHERE src = 0 OR (src = 1 AND event_id % 11 = 0)
      ) WHERE rn = 1
    ), final AS (
      SELECT * FROM merged WHERE event_id % 103 <> 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           TRUE AS changelog_exact
    FROM final GROUP BY event_type
    """,
)
def q_stream_cdf_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-TIME change log (r11; Delta CDC-file parity;
    KeyedTable.change_log + table_source 'chlog' slices): the table
    records each CoW op's exact logical delta at commit time, so the
    CDF stream serves EXACT row deltas for rewrites of ANY size —
    here the reader's size gate is zeroed, so without the log both
    commits would stream coarse whole-partition pairs. A ~9%-of-
    corpus upsert and a predicate delete stream ≤4×/≤2× their true
    changed-row counts (volume-proved), the commits carry the
    recorded refs (stats-proved), and the maintained per-type
    aggregate hash-matches the from-scratch SQL of the final state."""
    import decimal

    from hudi_glue_spark.streaming.table_source import stream_changes
    from hudi_glue_spark.table import manifest as M

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("cdfchlog_ck", sf_dir)
    src = _cdfchlog_src(spark, sf_dir)
    _b0, b1, _b2 = _batches(spark, sf_dir)
    n_upd = b1.filter("event_id % 11 = 0").count()
    _c0, c_up, c_del = src.commits()
    n_del = (
        src.read(spark, at=c_up)
        .filter("event_id % 103 = 0")
        .count()
    )
    logged = all(
        ((M.read_manifest(src.path, c).stats or {})
         .get("change_log") or {}).get("ref")
        for c in (c_up, c_del)
    )

    acc: dict[str, list] = {}
    vol: dict[str, int] = {}

    def _apply(batch: DataFrame, _bid: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        rows = (
            batch.groupBy("_commit", "event_type")
            .agg(
                F.count("*").alias("vol"),
                F.sum(sign).alias("dn"),
                F.sum(
                    sign * F.col("value").cast("decimal(18,4)")
                ).alias("dv"),
            )
            .collect()
        )
        for r in rows:
            vol[r["_commit"]] = vol.get(r["_commit"], 0) + r["vol"]
            slot = acc.setdefault(r["event_type"], [0, decimal.Decimal(0)])
            slot[0] += r["dn"]
            slot[1] += decimal.Decimal(r["dv"])

    q = (
        stream_changes(
            spark, src, starting="earliest", mode="cdf",
            exact_rewrite_max_bytes=0,  # gate OFF: only the log is exact
        )
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{wd}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("change-log CDF stream did not drain in 300s")
    exact = (
        logged
        and 0 < vol.get(c_up, 0) <= 4 * max(n_upd, 1)
        and 0 < vol.get(c_del, 0) <= 2 * max(n_del, 1)
    )
    return spark.createDataFrame(
        [(k, v[0], float(v[1]), exact) for k, v in sorted(acc.items())],
        "event_type string, n_events long, sum_value double, "
        "changelog_exact boolean",
    )


@query(
    "stream_cdf_changes",
    """
    WITH upd AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN event_type = 'click' AND value < 50.0
                  THEN value + 100.0 ELSE CAST(value AS DOUBLE) END AS value,
             CAST(ts AS TIMESTAMP) AS ts
      FROM events
    ), final AS (
      SELECT * FROM upd WHERE NOT (value >= 180.0)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM final GROUP BY event_type
    """,
)
def q_stream_cdf_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETRACTION-bearing change stream (stream_changes mode='cdf' —
    Delta CDF / Hudi change-query parity, §9d#6 closed): the table
    takes sequenced DV DML (predicate UPDATE then predicate DELETE,
    zero file rewrites — the dv_predicate_dml shape), and a downstream
    consumer tails the commit log maintaining a per-event_type
    aggregate by PURE +insert/−delete arithmetic: update pre-images
    arrive as deletes carrying the OLD value, post-images as inserts
    with the NEW one, DV deletes as deletes — no key joins, no
    snapshot rescans, O(changed rows) per trigger. The maintained
    aggregate must hash-match a from-scratch SQL aggregate of the
    sequenced final state. Decimal accumulation keeps the result
    independent of micro-batch boundaries."""
    import decimal

    from hudi_glue_spark.streaming.table_source import stream_changes

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wd = _workdir("cdfchanges_ck", sf_dir)
    src = _cdfchanges_src(spark, sf_dir)

    acc: dict[str, list] = {}  # event_type -> [n, decimal sum]

    def _apply(batch: DataFrame, _bid: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        rows = (
            batch.groupBy("event_type")
            .agg(
                F.sum(sign).alias("dn"),
                F.sum(
                    sign * F.col("value").cast("decimal(18,4)")
                ).alias("dv"),
            )
            .collect()
        )
        for r in rows:  # O(event types) driver rows, never O(changes)
            slot = acc.setdefault(r["event_type"], [0, decimal.Decimal(0)])
            slot[0] += r["dn"]
            slot[1] += decimal.Decimal(r["dv"])

    q = (
        stream_changes(spark, src, starting="earliest", mode="cdf")
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", f"{wd}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("CDF change stream did not drain in 300s")
    return spark.createDataFrame(
        [(k, v[0], float(v[1])) for k, v in sorted(acc.items())],
        "event_type string, n_events long, sum_value double",
    )
