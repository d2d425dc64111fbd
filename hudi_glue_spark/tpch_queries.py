"""TPC-H-derived query coverage (beyond Q1/Q3/Q5/Q6/Q14/Q18 in the core
modules): the classic decision-support shapes a user of the reference
would expect any replacement engine to run.

The fixture schema (TESTDATA.md) is a trimmed TPC-H — no ``partsupp``
table, no ship/commit/receipt-date triple, no comment/phone/address
columns — so queries needing those are ADAPTED (documented per query)
while keeping the operator shape that makes each query interesting:
correlated EXISTS (Q4, Q21), nation-pair volume (Q7), market share
ratio (Q8), outer-join histogram (Q13), view + scalar-max (Q15),
distinct-count grouping (Q16), correlated average threshold (Q17),
disjunctive pushdown predicates (Q19), HAVING-gated IN (Q20),
anti-join + scalar subquery (Q22).

Determinism: all money sums run in DECIMAL (exact, order-independent)
and are cast to DOUBLE only at the top; ratio divisions divide two
exactly-summed doubles; threshold comparisons are restated as
multiplications so no engine ever rounds mid-predicate (e.g. Q17's
``qty < 0.2 * avg`` becomes ``5 * qty * cnt < sum``).

Both engines run the IDENTICAL SQL text (registered over temp views on
the Spark side), so column aliases match by construction and the plan
is fully declarative — Catalyst picks broadcast/shuffle strategies and
reorders joins (SURVEY.md §4: no hand-scheduling).
"""

from __future__ import annotations

from hudi_glue_spark.queries import query, table

#: exact per-row revenue term used across TPC-H money aggregates
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"


def _sql_query(name: str, tables: list[str], sql: str, doc: str) -> None:
    """Register ``sql`` as BOTH the Spark implementation (temp views +
    ``spark.sql``) and the DuckDB oracle — one text, two engines."""

    @query(name, sql)
    def fn(spark, sf_dir, _sql=sql, _tables=tuple(tables)):
        for t in _tables:
            table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(_sql)

    fn.__doc__ = doc
    fn.__name__ = f"q_{name}"


_sql_query(
    "tpch_q4_order_priority",
    ["orders", "lineitem"],
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
    GROUP BY o_orderpriority
    """,
    """TPC-H Q4 (adapted: the fixture has no commit/receipt dates, so
    "late" = shipped >60 days after order date). Correlated EXISTS →
    Catalyst plans a left-semi join on orderkey; the date filter prunes
    orders at the scan.""",
)

_sql_query(
    "tpch_q7_volume_shipping",
    ["supplier", "lineitem", "orders", "customer", "nation"],
    f"""
    SELECT supp_nation, cust_nation, yr,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS yr,
             {_REV} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
    """,
    """TPC-H Q7: bilateral trade volume between a nation pair by year.
    Self-joined nation dim (n1 supplier-side, n2 customer-side) — both
    broadcast; the nation-pair disjunction prunes before the fact
    shuffle.""",
)

_sql_query(
    "tpch_q8_market_share",
    ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    f"""
    SELECT yr,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
             {_REV} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY yr
    """,
    """TPC-H Q8 (adapted: single-word p_type values): NATION_3's share
    of ECONOMY-part revenue sold into ASIA, by order year. Eight-way
    join — every dimension broadcasts; the conditional-sum ratio divides
    two exactly-summed decimals cast to double.""",
)

_sql_query(
    "tpch_q10_returned_items",
    ["customer", "orders", "lineitem", "nation"],
    f"""
    SELECT c_custkey, c_name, CAST(sum({_REV}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    """TPC-H Q10 (adapted: no phone/address/comment columns): top-20
    customers by revenue lost to returns in a quarter. Decimal revenue
    makes the top-20 boundary exact; c_custkey tie-break pins the
    LIMIT.""",
)

_sql_query(
    "tpch_q13_customer_distribution",
    ["customer", "orders"],
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    """TPC-H Q13 (adapted: the comment-pattern exclusion becomes a
    priority exclusion — same outer-join-with-filtered-ON shape):
    customers-per-order-count histogram. The ON-clause filter (not a
    WHERE) preserves zero-order customers; two cascaded aggregations.""",
)

_sql_query(
    "tpch_q15_top_supplier",
    ["supplier", "lineitem"],
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    """TPC-H Q15: the quarter's top revenue supplier via a CTE reused
    twice (once joined, once under a scalar MAX). Exact decimal revenue
    means the max-equality cannot be split by float noise.""",
)

_sql_query(
    "tpch_q16_supplier_part_counts",
    ["part", "lineitem", "supplier"],
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
    """TPC-H Q16 (adapted: supplier-part pairs come from lineitem since
    the fixture has no partsupp; the complaints exclusion becomes a
    negative-balance exclusion): distinct suppliers per (brand, type,
    size). NOT IN over a non-null key → null-safe anti-join.""",
)

_sql_query(
    "tpch_q17_small_quantity_revenue",
    ["lineitem", "part"],
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem, part,
         (SELECT l_partkey AS a_partkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                 count(*) AS cnt
          FROM lineitem GROUP BY l_partkey) part_avg
    WHERE p_partkey = l_partkey AND a_partkey = l_partkey
      AND p_brand = 'Brand#2' AND p_type = 'SMALL'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
    """,
    """TPC-H Q17 (adapted: no container column, so brand+type select
    the part family). The correlated ``qty < 0.2 * avg(qty)`` threshold
    is restated as ``5 * qty * cnt < sum`` — pure integer/decimal
    arithmetic, so the boundary rows are bit-identical on both engines;
    the per-part average comes from one grouped subquery joined back
    (two scans of lineitem, no correlated re-execution).""",
)

_sql_query(
    "tpch_q19_disjunctive_predicates",
    ["lineitem", "part"],
    f"""
    SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
         (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30))
    """,
    """TPC-H Q19 (adapted: brand/size/quantity bands replace the
    container/shipmode bands): three OR'd conjunct groups spanning both
    join sides. Catalyst extracts the common ``p_partkey = l_partkey``
    and pushes the single-side disjuncts below the join.""",
)

_sql_query(
    "tpch_q20_promo_suppliers",
    ["supplier", "lineitem", "part"],
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100)
    """,
    """TPC-H Q20 (adapted: availability comes from shipped quantity
    since the fixture has no partsupp): suppliers who moved >100 units
    of PROMO parts in 1996. IN over a HAVING-gated aggregate → semi
    join; the decimal sum keeps the >100 gate exact.""",
)

_sql_query(
    "tpch_q21_waiting_supplier",
    ["supplier", "lineitem", "orders", "nation"],
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
    """TPC-H Q21 (adapted: ship-date ordering stands in for the missing
    receipt/commit dates): suppliers in NATION_1 who were the LAST to
    ship in a multi-supplier finished order. The EXISTS/NOT-EXISTS pair
    plans as a semi join plus an anti join on the same key — the
    reference upsert's two primitives composed in one query.""",
)

_sql_query(
    "tpch_q22_global_sales_opportunity",
    ["customer", "orders"],
    """
    SELECT seg, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM (
      SELECT substring(c_name, 6, 1) AS seg, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
          FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_totalprice > 300000)
    ) prospective
    GROUP BY seg
    """,
    """TPC-H Q22 (adapted: a name-digit segment replaces the missing
    phone country code, and "no orders" becomes "no large orders" so the
    dense fixture yields a non-trivial result): well-funded customers
    with no order above 300k, by segment. Scalar AVG subquery (computed
    as exact-sum / count, so both engines derive the identical double
    threshold) + NOT EXISTS anti-join.""",
)

_sql_query(
    "tpch_q2_min_cost_supplier",
    ["part", "supplier", "lineitem", "nation", "region"],
    """
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(supplycost AS DOUBLE) AS supplycost
    FROM part, cost, supplier, nation, region
    WHERE p_partkey = partkey AND s_suppkey = suppkey
      AND p_size = 15
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND supplycost = (
        SELECT MIN(c2.supplycost)
        FROM cost c2, supplier s2, nation n2, region r2
        WHERE c2.partkey = p_partkey AND s2.s_suppkey = c2.suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    """,
    """TPC-H Q2 (adapted: no partsupp table in the fixture, so the
    supplier's cost for a part is derived as the MIN line price it ever
    shipped that part at — same correlated-scalar-MIN shape): for size-15
    parts, the cheapest EUROPE supplier(s). Ties all qualify, as in the
    spec, so the result is a deterministic set. Exercises a correlated
    scalar subquery that itself joins four tables — the decorrelation
    stress case. No LIMIT: the spec's top-100 needs a total order the
    driver's order-insensitive hash would not see anyway.""",
)

_sql_query(
    "tpch_q9_product_type_profit",
    ["lineitem", "part", "supplier", "orders", "nation"],
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))
             - CAST(p_retailprice AS DECIMAL(6,2))
               * CAST(0.6 AS DECIMAL(2,1))
               * CAST(l_quantity AS DECIMAL(4,0)) AS amount
      FROM lineitem, part, supplier, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    """TPC-H Q9 (adapted: supply cost is 60% of the part's retail price
    instead of the missing ps_supplycost; the '%green%' name filter
    becomes '%red%' to match the fixture's part names): profit by
    supplier nation and order year over a five-table star join. All
    money terms stay in DECIMAL chosen narrow enough ((6,2)x(2,1)x(4,0))
    that no engine ever rounds mid-product; quantities are integral
    <= 50 and retail prices 2dp <= 999.9 (verified), so every cast is
    exact.""",
)

_sql_query(
    "tpch_q11_important_stock",
    ["lineitem", "supplier", "nation"],
    """
    WITH val AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE value > (SELECT SUM(value) * 0.001 FROM val)
    """,
    """TPC-H Q11 (adapted: a part's "stock value" held by NATION_3
    suppliers is its shipped revenue from them, replacing the missing
    partsupp availability x cost): parts whose value exceeds 0.1% of the
    nation's total. The HAVING-against-global-scalar shape; both the
    per-part values and the threshold are exact decimal sums (x 0.001
    extends scale, never rounds), so the > comparison is bit-identical
    across engines.""",
)

_sql_query(
    "tpch_q12_shipment_priority_classes",
    ["orders", "lineitem"],
    """
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL '30' DAY
      AND l_shipdate < o_orderdate + INTERVAL '90' DAY
    GROUP BY l_linestatus
    """,
    """TPC-H Q12 (adapted: the fixture has no ship mode or commit/receipt
    dates, so the mode becomes l_linestatus and "late receipt" becomes a
    30-90 day ship lag after the order date): per class, how many lines
    belong to high- vs low-priority orders. The conditional-aggregation-
    over-join shape with both CASE branches summed in one pass.""",
)
