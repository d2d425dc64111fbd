"""Wider SQL-analytics coverage: multi-dim grouping (CUBE), pivot, set
operations, subquery shapes, and TPC-H-style multi-join aggregations.

SURVEY.md §2a rows 25-30 record these operators as absent from the
reference but built into Spark; a user replacing the reference gets them
here as first-class, oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_glue_spark.queries import dec_sum, query, table

#: Pinned pivot values — explicit list on both engines (Spark would
#: otherwise launch a distinct-scan job and column order would float).
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER)
             AS grp,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass — Spark expands to a single Expand + hash-agg, one shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("grp"),
        F.count(F.lit(1)).alias("n"),
        dec_sum("l_quantity", "sum_qty"),
    )


@query(
    "pivot_user_event_matrix",
    f"""
    SELECT user_id,
           {", ".join(
               f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
               for t in _EVENT_TYPES
           )}
    FROM events GROUP BY user_id
    """,
)
def q_pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix. The value list is
    pinned, so Spark skips the implicit distinct-scan job and the output
    schema is stable (one shuffle, map-side partial aggregation)."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    # pivot leaves NULL where a (user, type) pair never occurred
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@query(
    "intersect_customer_supplier_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect_customer_supplier_nations(spark, sf_dir):
    """INTERSECT (set semantics, dedup both sides)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "except_nations_without_suppliers",
    """
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q_except_nations_without_suppliers(spark, sf_dir):
    """EXCEPT (set difference): nations with no supplier."""
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return n.exceptAll(s).distinct()


@query(
    "orders_above_avg_price",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
      SELECT avg(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders
    )
    """,
)
def q_orders_above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above the average price. The
    average is computed in exact decimal on both engines, so the
    boundary rows can't flip on IEEE summation order."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM __orders_v
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) > (
          SELECT avg(CAST(o_totalprice AS DECIMAL(18,2))) FROM __orders_v
        )
        """
    )


@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-10.
    customer is broadcast after its filter; the orderkey agg rides the
    join shuffle. Total tie-break (orderkey) pins the LIMIT."""
    c = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q_tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-relation join with a same-nation constraint.
    Declared as one SQL statement — Catalyst reorders the joins and
    broadcasts every dimension; the only large shuffle left is
    lineitem⋈orders."""
    for t in ["customer", "orders", "lineitem", "supplier", "nation", "region"]:
        table(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_v")
    return spark.sql(
        """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM __customer_v, __orders_v, __lineitem_v, __supplier_v,
             __nation_v, __region_v
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
        """
    )


@query(
    "orders_price_quantiles",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.5)  AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.95) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority class. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the same
    definition and agree bit-for-bit (verified); at 100 TB the same
    query swaps to ``approx_percentile`` with a documented error bound."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )


@query(
    "customer_name_features",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
           substring(c_name, 1, 8) AS name_prefix,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CAST(length(c_name) AS INTEGER) AS name_len
    FROM customer
    """,
)
def q_customer_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: upper / regexp_extract / substring /
    lpad / concat_ws / length — all JVM expressions in one projection."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("long").alias("name_num"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.length("c_name").cast("int").alias("name_len"),
    )


@query(
    "customer_orders_full_outer",
    """
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY coalesce(c.c_custkey, o.o_custkey)
    """,
)
def q_customer_orders_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join + aggregate: keeps customers with no orders
    (NULL-spend rows) and would keep orphan orders symmetrically."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.groupBy(
        F.coalesce(c.c_custkey, o.o_custkey).alias("custkey")
    ).agg(
        F.count("o_orderkey").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend"),
    )


@query(
    "salted_distinct_users_per_type",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_salted_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count via the two-phase salted pattern
    (operators.skew): a hot key's value set spreads over 16 tasks, the
    partial distinct counts sum to the true answer — checked against the
    single-statement COUNT(DISTINCT)."""
    from hudi_glue_spark.operators.skew import salted_count_distinct

    ev = table(spark, sf_dir, "events")
    return salted_count_distinct(
        ev, ["event_type"], "user_id", alias="n_users", n_salts=16
    )


@query(
    "salted_join_user_activity",
    """
    SELECT e.event_id, e.user_id, d.user_events
    FROM events e JOIN (
      SELECT user_id, CAST(count(*) AS BIGINT) AS user_events
      FROM events GROUP BY user_id
    ) d ON e.user_id = d.user_id
    """,
)
def q_salted_join_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient salted join (operators.skew.salted_join): the
    fact side salted 16 ways, the dimension exploded per salt — a hot
    user's rows fan over 16 tasks instead of one straggler. The oracle
    is the PLAIN join: salting must not change the result."""
    from hudi_glue_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    return salted_join(ev, dim, on="user_id").select(
        "event_id", "user_id", "user_events"
    )


@query(
    "orders_price_quantiles_approx",
    """
    SELECT o_orderpriority, CAST(q AS DOUBLE) AS q, exact_value,
           TRUE AS within_bound
    FROM (
      SELECT o_orderpriority, 0.25 AS q,
             quantile_cont(o_totalprice, 0.25) AS exact_value
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT o_orderpriority, 0.5, quantile_cont(o_totalprice, 0.5)
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT o_orderpriority, 0.75, quantile_cont(o_totalprice, 0.75)
      FROM orders GROUP BY o_orderpriority
      UNION ALL
      SELECT o_orderpriority, 0.95, quantile_cont(o_totalprice, 0.95)
      FROM orders GROUP BY o_orderpriority
    )
    """,
)
def q_orders_price_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for orders_price_quantiles: one-pass mergeable
    approx_percentile sketch (accuracy 10000 ≈ 0.01% rank error) instead
    of the exact sort-based percentile.

    Bounds-oracle shape so the sketch is DRIVER-checkable, not just
    unit-tested: each (priority, q) row carries the exact interpolated
    quantile (deterministic, hash-checkable — Spark ``percentile`` ==
    DuckDB ``quantile_cont``) plus ``within_bound``, computed in Spark
    as "the sketch value lies between the exact q±0.01 rank quantiles".
    The sketch's guarantee is 1e-4 rank error, so ±0.01 is a 100×
    margin, and sortedness makes the bound exact: any value whose rank
    is within q±1e-4 lies between the interpolated q-0.01 and q+0.01
    quantiles. DuckDB's oracle emits the exact values + TRUE.
    """
    qs = "array(0.25D, 0.5D, 0.75D, 0.95D)"
    lo = "array(0.24D, 0.49D, 0.74D, 0.94D)"
    hi = "array(0.26D, 0.51D, 0.76D, 0.96D)"
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr(f"percentile(o_totalprice, {qs})").alias("_exact"),
        F.expr(f"percentile(o_totalprice, {lo})").alias("_lo"),
        F.expr(f"percentile(o_totalprice, {hi})").alias("_hi"),
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.75, 0.95], 10000).alias(
            "_approx"
        ),
    )
    return agg.select(
        "o_orderpriority",
        F.posexplode(F.expr(qs)).alias("_i", "q"),
        "_exact",
        "_lo",
        "_hi",
        "_approx",
    ).select(
        "o_orderpriority",
        F.col("q").cast("double").alias("q"),
        F.expr("_exact[_i]").alias("exact_value"),
        (
            (F.expr("_approx[_i]") >= F.expr("_lo[_i]"))
            & (F.expr("_approx[_i]") <= F.expr("_hi[_i]"))
        ).alias("within_bound"),
    )


@query(
    "json_props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, 'k') AS BIGINT) AS k_val,
           CAST(CAST(json_extract_string(props, 'k') AS BIGINT) % 10 AS BIGINT)
             AS k_mod
    FROM events
    """,
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured: parse the JSON props column with
    ``get_json_object`` — string-typed JSON stays queryable without a
    schema migration (the training-data-pipeline norm for ragged
    metadata)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("k_val"), (k % 10).alias("k_mod")
    )


@query(
    "window_functions_suite",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER w AS INTEGER) AS rn,
           CAST(dense_rank() OVER wv AS INTEGER) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS max_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                      o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey),
           wv AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
    """,
)
def q_window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window surface in one pass: ranking, tiling,
    lag/lead, first_value, and a running decimal sum — all sharing ONE
    window spec, so Spark sorts each partition once."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wv = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.row_number().over(w).cast("int").alias("rn"),
        F.dense_rank().over(wv).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("max_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wr)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "orders_date_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
                AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 DAY AS due_ts,
           CAST(datediff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch
    FROM orders
    """,
)
def q_orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface (§2a #19-21): extraction, truncation, interval
    arithmetic, date difference. DuckDB dayofweek is 0-6 Sunday-first;
    Spark's is 1-7 — normalized to DuckDB's on the Spark side."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_ts"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch"),
    )


@query(
    "approx_distinct_users",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS within_rsd
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ cardinality per event_type. The 100 TB path: one
    pass, O(1) state per group, mergeable across partitions.

    Bounds-oracle shape so the sketch is DRIVER-checkable: the output
    carries the exact distinct count (hash-checkable against DuckDB)
    plus ``within_rsd``, computed in Spark as |approx - exact| ≤
    max(1, 3·rsd·exact) — a 3σ band around the sketch's rsd=0.02
    guarantee. The engine-specific HLL estimate itself stays out of the
    hashed output; the boolean converts its accuracy into a driver fact.
    """
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            <= F.greatest(F.lit(1.0), F.lit(0.06) * F.col("n_users_exact"))
        ).alias("within_rsd"),
    )


@query(
    "user_event_type_sets",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types
    FROM events GROUP BY user_id
    """,
)
def q_user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation surface: collect_set → sorted, joined to a
    deterministic string (collect order is engine-dependent; the sort
    makes it comparable)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias("types"),
        F.size(F.collect_set("event_type")).cast("int").alias("n_types"),
    )


@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + aggregate — every predicate pushes to the
    parquet scan, no shuffle beyond the final partial-agg exchange."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery with HAVING over an aggregate —
    Catalyst rewrites the IN to a left-semi join against the grouped
    subquery; decimal sums keep the >300 boundary exact."""
    for t in ["customer", "orders", "lineitem"]:
        table(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_v")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_orderdate,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM __customer_v, __orders_v, __lineitem_v
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM __lineitem_v GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
          )
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_orderdate
        """
    )


@query(
    "null_handling_suite",
    """
    SELECT o_orderkey,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'WAS-URGENT') AS prio,
           CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END
             AS price_nvl,
           CAST(o_orderstatus IS NULL AS BOOLEAN) AS status_missing,
           CAST(ifnull(CAST(NULL AS BIGINT), o_custkey) AS BIGINT) AS cust_filled
    FROM orders
    """,
)
def q_null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface: nullif/coalesce, NULL-replacing CASE,
    IS NULL predicate, ifnull — identical three-valued-logic behavior on
    both engines."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("WAS-URGENT"),
        ).alias("prio"),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_nvl"),
        F.col("o_orderstatus").isNull().alias("status_missing"),
        F.ifnull(F.lit(None).cast("long"), F.col("o_custkey")).alias("cust_filled"),
    )


#: Shared formula text for the deterministic-moments query: both engines
#: compute IDENTICAL exact decimal/bigint sums, cast to double, then run
#: the IDENTICAL IEEE expression tree — so stddev/corr hash-match
#: bit-for-bit, which naive distributed stddev()/corr() (order-dependent
#: one-pass accumulators) cannot guarantee.
_MOMENTS_INNER = """
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4)))
              AS DOUBLE) AS sxx,
         CAST(sum(user_id) AS DOUBLE) AS sy,
         CAST(sum(user_id * user_id) AS DOUBLE) AS syy,
         CAST(sum(CAST(value AS DECIMAL(18,4)) * user_id) AS DOUBLE) AS sxy
  FROM events GROUP BY event_type
"""

#: nullif on the corr denominator: a zero-variance group (single-row or
#: all-equal values) is 0/0, where Spark (ANSI off) returns NULL but
#: DuckDB returns NaN — nullif(...,0) makes BOTH engines return NULL.
_MOMENTS_OUTER = """
    SELECT event_type, n,
           sx / n AS mean_value,
           sqrt(sxx / n - (sx / n) * (sx / n)) AS stddev_value,
           (sxy / n - (sx / n) * (sy / n))
             / nullif(sqrt(sxx / n - (sx / n) * (sx / n))
                      * sqrt(syy / n - (sy / n) * (sy / n)), 0) AS corr_value_user
"""


@query(
    "events_moment_stats",
    f"{_MOMENTS_OUTER} FROM ({_MOMENTS_INNER})",
)
def q_events_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stddev and Pearson correlation per event_type from
    exact decimal moment sums (see _MOMENTS_INNER note). One map-side
    partial agg + one tiny shuffle — same cost as any groupBy; at 100 TB
    the moments stay mergeable across partitions (unlike a sort-based
    exact median)."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(f"{_MOMENTS_OUTER} FROM ({_MOMENTS_INNER})")


@query(
    "events_value_histogram",
    """
    SELECT CAST(floor(value / 50.0) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi
    FROM events GROUP BY 1
    """,
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (floor-bucket + count + bucket
    min/max). floor of one double division is a single deterministic
    IEEE op — safe to group on; the whole query is one narrow partial
    agg, no matter the table size."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / F.lit(50.0)).cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT CAST(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END)
           / sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS promo_pct,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dimension with a conditional aggregate
    ratio (decimal arithmetic end-to-end, one double division at the
    very top so engines can't diverge mid-sum). Covers the part table —
    every fixture table now appears in the inventory."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        (F.lit(100.0) * F.sum(promo) / F.sum(rev)).cast("double").alias("promo_pct"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "bucketed_colocated_join",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           TRUE AS join_exchange_free
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact⋈fact join over hash-bucketed tables.

    orders and lineitem are written ``CLUSTERED BY (orderkey) SORTED BY
    (orderkey) INTO 16 BUCKETS`` (write_bucketed), then joined on the
    bucket key: both scans report HashPartitioning(orderkey, 16), so
    EnsureRequirements inserts NO Exchange on either side — the join is
    a zipper over co-located files. The reference's Hudi layout
    (glue/HudiJarGlueJob.py:77 combinedConf) has no bucketing, so every
    fact-fact join re-shuffles both sides on every run; here the shuffle
    is paid once at write time and amortized over every later join and
    bucket-key aggregation. At 100 TB this is the difference between
    "the nightly join IS the pipeline's shuffle budget" and a map-side
    merge.

    ``join_exchange_free`` is computed from the join's actual physical
    plan (driver-side string inspection, metadata-scale), so a layout or
    planner regression that reintroduces the shuffle fails the driver
    hash — the scale claim is a checked fact, not a comment.
    """
    import hashlib as _hashlib
    import os as _os

    from hudi_glue_spark.sources.writers import write_bucketed

    # tag carries a hash of the FULL sf_dir: two fixtures sharing a
    # basename (/data/a/sf0.1 vs /data/b/sf0.1) must not share the
    # cached bucketed tables, or the cache silently serves stale data
    tag = (
        _os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
        + "_"
        + _hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:8]
    )
    root = f"/tmp/hudi_glue_spark_bucketed_{tag}"
    # Write-once, join-many — literally: rebuild only if this session's
    # catalog lacks the tables (bucketing metadata is catalog-scoped) or
    # the data directories are gone. Re-runs then time the exchange-free
    # JOIN the docstring claims, not two fresh bucketed table writes.
    cached = all(
        spark.catalog.tableExists(f"bkt_{t}_{tag}")
        and _os.path.isdir(f"{root}/{t}")
        for t in ("orders", "lineitem")
    )
    if not cached:
        o = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        write_bucketed(o, f"bkt_orders_{tag}", "o_orderkey", f"{root}/orders")
        write_bucketed(
            li, f"bkt_lineitem_{tag}", "l_orderkey", f"{root}/lineitem"
        )

    bo = spark.table(f"bkt_orders_{tag}")
    bl = spark.table(f"bkt_lineitem_{tag}")
    # merge hint: the exchange-free claim is about sort-merge over
    # co-located buckets; without it AQE could pick a broadcast at small
    # SF and the plan check would be vacuous.
    joined = bo.join(
        bl.hint("merge"), bo["o_orderkey"] == bl["l_orderkey"]
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    exchange_free = "Exchange" not in plan

    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(rev).cast("double").alias("revenue"),
        )
        .withColumn("join_exchange_free", F.lit(exchange_free))
    )


@query(
    "fk_integrity_audit",
    """
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
                 ON l.l_orderkey = o.o_orderkey
                 WHERE o.o_orderkey IS NULL) AS BIGINT) AS orphans,
           CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
             AS distinct_keys
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
                 ON o.o_custkey = c.c_custkey
                 WHERE c.c_custkey IS NULL) AS BIGINT),
           CAST((SELECT count(DISTINCT o_custkey) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT count(*) FROM lineitem l LEFT JOIN part p
                 ON l.l_partkey = p.p_partkey
                 WHERE p.p_partkey IS NULL) AS BIGINT),
           CAST((SELECT count(DISTINCT l_partkey) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem l LEFT JOIN supplier s
                 ON l.l_suppkey = s.s_suppkey
                 WHERE s.s_suppkey IS NULL) AS BIGINT),
           CAST((SELECT count(DISTINCT l_suppkey) FROM lineitem) AS BIGINT)
    """,
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts
    for every foreign key (anti-join against the referenced table) plus
    the referencing side's distinct-key cardinality — the pre-flight
    check a pipeline runs before trusting its joins. The four audits
    are built LAZILY and unioned with a tag column, so the whole audit
    is ONE Spark action (one DAG; the four fact-table scans run as
    sibling stages, not serialized driver round-trips), with the orphan
    count and the distinct-key cardinality of each FK fused into one
    left-join + aggregate. The dimension sides (customer, part,
    supplier) are broadcast-sized; the orders probe of lineitem is a
    shuffled join on the key. At 100 TB the audit costs the same joins
    the pipeline was about to run anyway — finding the orphans BEFORE
    they silently drop revenue rows in an inner join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def audit(fk_name, child, fk_col, parent, pk_col):
        # one left join, one aggregate: orphans = rows whose FK found no
        # PK (NULL FKs never match → orphans, same as a left-anti);
        # count_distinct, not distinct().count(): SQL's COUNT(DISTINCT)
        # ignores NULL FKs and the oracle must agree on NULL-bearing keys
        j = child.select(fk_col).join(
            parent.select(pk_col), F.col(fk_col) == F.col(pk_col), "left"
        )
        return j.agg(
            # coalesce: SUM over zero rows is NULL, but an empty child
            # table has 0 orphans, not unknown
            F.coalesce(
                F.sum(F.col(pk_col).isNull().cast("long")), F.lit(0)
            ).alias("orphans"),
            F.count_distinct(F.col(fk_col)).alias("distinct_keys"),
        ).select(F.lit(fk_name).alias("fk"), "orphans", "distinct_keys")

    audits = [
        audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        audit(
            "orders.o_custkey->customer",
            o,
            "o_custkey",
            table(spark, sf_dir, "customer"),
            "c_custkey",
        ),
        audit(
            "lineitem.l_partkey->part",
            li,
            "l_partkey",
            table(spark, sf_dir, "part"),
            "p_partkey",
        ),
        audit(
            "lineitem.l_suppkey->supplier",
            li,
            "l_suppkey",
            table(spark, sf_dir, "supplier"),
            "s_suppkey",
        ),
    ]
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


@query(
    "join_key_skew_profile",
    """
    WITH k AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_per_key,
           CAST(sum(n) AS DOUBLE) / count(*) AS avg_per_key,
           CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / count(*))
             AS skew_factor,
           CAST((SELECT count(*) FROM k
                 WHERE CAST(n AS HUGEINT) * (SELECT count(*) FROM k)
                       > 2 * (SELECT CAST(sum(n) AS HUGEINT) FROM k))
             AS BIGINT) AS n_heavy,
           CAST((SELECT min(user_id) FROM k
                 WHERE n = (SELECT max(n) FROM k)) AS BIGINT) AS top_key
    FROM k
    """,
)
def q_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: the distribution stats that decide
    whether a key needs salting BEFORE the join runs — rows, distinct
    keys, max and mean rows-per-key, their ratio (skew factor), the
    count of heavy keys (>2× mean) and the heaviest key itself (min key
    on ties, so the answer is deterministic). ONE action end to end:
    the global stats are a 1-row aggregate broadcast back onto the
    per-key counts, so the heavy-key test and the passthrough stats
    fold into a single final aggregate — no driver collect between
    jobs, and the groupBy exchange under both branches is identical so
    AQE reuses it instead of recomputing the shuffle (the old version
    ran three sequential actions, each re-running the groupBy). The
    heavy test is exact integer arithmetic (n·n_keys > 2·n_rows in
    decimal, HUGEINT on the oracle side) — no float-threshold edge.
    At 100 TB you run this on the join column once and route the
    output into operators/skew.py's salted join instead of
    discovering the straggler task at 3 a.m."""
    ev = table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # max(struct(n, -user_id)) = (max n, -(min user_id among max-n
    # keys)) — the deterministic top-key pick in the same pass
    stats = k.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_per_key"),
        F.max(
            F.struct(
                F.col("n").alias("n"),
                (-F.col("user_id")).cast("long").alias("neg_id"),
            )
        ).alias("__top"),
    )
    joined = k.crossJoin(F.broadcast(stats))
    return joined.agg(
        F.first("n_rows").alias("n_rows"),
        F.first("n_keys").alias("n_keys"),
        F.first("max_per_key").alias("max_per_key"),
        (F.first("n_rows") / F.first("n_keys")).alias("avg_per_key"),
        (
            F.first("max_per_key") / (F.first("n_rows") / F.first("n_keys"))
        ).alias("skew_factor"),
        F.sum(
            (
                F.col("n").cast("decimal(38,0)") * F.col("n_keys")
                > F.lit(2) * F.col("n_rows").cast("decimal(38,0)")
            ).cast("long")
        ).alias("n_heavy"),
        (-F.first(F.col("__top").getField("neg_id"))).cast("long").alias(
            "top_key"
        ),
    )
