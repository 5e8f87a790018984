"""Relational query surface (SURVEY.md §2B) over the star schema.

Design notes for 100 TB scale:
- Everything is declarative DataFrame API -> Catalyst handles predicate
  pushdown, column pruning, join reordering; AQE converts to broadcast
  joins and splits skewed partitions at runtime.
- Dimension tables (region/nation/customer/supplier/part) are hinted
  with F.broadcast() where they are guaranteed small relative to the
  fact table; the lineitem/orders/events fact joins shuffle on their
  join keys only.
- Monetary aggregates are computed as exact DECIMAL sums (order
  independent, unlike double summation) and cast to DOUBLE at the end
  so results hash-match the DuckDB oracle bit-for-bit.
- Timestamp outputs are emitted as epoch microseconds (BIGINT) or DATE
  to avoid timezone-representation mismatches between engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from ..session import load_table, local_checkpoint
from .registry import query


def dsum(expr: str, alias: str, scale: int = 4) -> Column:
    """Exact, order-independent sum of a double expression: cast each
    row to DECIMAL(18,scale), sum exactly, cast the total to DOUBLE."""
    return F.expr(f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)").alias(alias)


def _sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Flagship: pricing summary (filter -> hash agg partial+final -> sort)
# ---------------------------------------------------------------------------

Q01_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity', 'sum_qty')},
       {_sql_dsum('l_extendedprice', 'sum_base_price')},
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', 6)},
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', 6)},
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", Q01_ORACLE)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Partial aggregation happens
    map-side (HashAggregate partial -> exchange on 2 low-cardinality
    keys -> final), so shuffle volume is O(groups), not O(rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price", 6),
            dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge", 6),
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
            ).alias("avg_qty"),
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
            ).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

Q03_ORACLE = f"""
SELECT l_orderkey,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)},
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q03_shipping_priority", Q03_ORACLE)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join + broadcast dim filter + top-k. customer is
    broadcast (semi-join reduction before the orders<->lineitem shuffle
    join); top-k is a TakeOrderedAndProject, not a global sort."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue", 6))
        .select(
            "l_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q05_ORACLE = f"""
SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("q05_region_volume", Q05_ORACLE)
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way star join. All dims broadcast; the only shuffles are the
    lineitem<->orders equi-join and the final tiny agg. At 100 TB the
    plan is identical — dims stay broadcast-able."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum("l_extendedprice * (1 - l_discount)", "revenue", 6))
    )


Q06_ORACLE = f"""
SELECT {_sql_dsum('l_extendedprice * l_discount', 'revenue', 6)}, COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("q06_revenue_forecast", Q06_ORACLE)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg: all four predicates push to the parquet
    reader (PushedFilters), projection prunes to 4 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum("l_extendedprice * l_discount", "revenue", 6), F.count("*").alias("n_rows"))
    )


Q_CUST_ORDER_STATS_ORACLE = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


@query("q_cust_order_stats", Q_CUST_ORDER_STATS_ORACLE)
def q_cust_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"),
                F.lit(0.0),
            ).alias("total_spent"),
        )
    )


@query(
    "q_semi_join",
    """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers with at least one big order."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_anti_join",
    """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_correlated_above_avg",
    """
WITH nation_avg AS (
  SELECT c_nationkey AS nk,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer JOIN nation_avg ON c_nationkey = nk
WHERE c_acctbal > avg_bal
""",
)
def q_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated subquery: customers above their nation's average
    balance. Expressed as agg + broadcast self-join (what Catalyst's
    decorrelation produces for the EXISTS form)."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)").alias(
            "avg_bal"
        )
    )
    return (
        cust.join(F.broadcast(avg_bal), cust.c_nationkey == avg_bal.nk)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------

@query(
    "q_distinct_agg",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""",
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed plain + distinct aggregation (expand-based two-phase)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)").alias("total"),
    )


@query(
    "q_rollup",
    """
SELECT r_name, n_name, COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acct_total
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)").alias(
                "acct_total"
            ),
        )
    )


@query(
    "q_cube",
    """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two categorical dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)").alias("total"),
    )


@query(
    "q_grouping_sets",
    """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem_gs GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_approx_distinct",
    """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       ABS(approx_count_distinct(l_orderkey) - COUNT(DISTINCT l_orderkey))
         <= 0.05 * COUNT(DISTINCT l_orderkey) AS approx_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). At 100 TB this replaces
    exact COUNT(DISTINCT) where a ~2% error is acceptable: no expand,
    single pass, constant memory per group.

    Hash-checkable via the CONTRACT, not the sketch: HLL internals
    differ by engine, so the checked surface is (exact count, "approx
    within 5% of exact" boolean) — each engine verifies its OWN sketch
    against its OWN exact value, and the verdicts must agree. 5% is
    generous vs the configured rsd=1% (and DuckDB's ~1.6%), so a true
    sketch regression still flips the boolean. Raw approx values stay
    asserted in tests/test_relational.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.01)
                - F.countDistinct("l_orderkey")
            )
            <= 0.05 * F.countDistinct("l_orderkey")
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

@query(
    "q_window_rank",
    """
SELECT * FROM (
  SELECT n_name, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn,
         RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS drnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rn <= 3
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window (single shuffle on the
    partition key; no global sort)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_lag_lead",
    """
SELECT event_id, user_id, value,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       value - LAG(value) OVER w AS delta
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over a per-user time order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_window_running",
    """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
FROM events
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running and sliding sums (DECIMAL for exactness —
    segment-tree vs sequential accumulation would differ in fp)."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(dec)
        .over(base.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("moving_sum3"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k and set operations
# ---------------------------------------------------------------------------

@query(
    "q_topk_orders",
    """
SELECT o_orderkey, o_totalprice, STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_totalprice", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


_SET_A = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SET_B = "SELECT c_custkey FROM customer WHERE c_acctbal > 7000"


@query("q_set_union", f"{_SET_A} UNION {_SET_B}")
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    return a.union(b).distinct()


@query("q_set_union_all", f"{_SET_A} UNION ALL {_SET_B}")
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    return a.union(b)


@query("q_set_intersect", f"{_SET_A} INTERSECT {_SET_B}")
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    return a.intersect(b)


@query("q_set_except", f"{_SET_A} EXCEPT {_SET_B}")
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 7000).select("c_custkey")
    return a.subtract(b)


# ---------------------------------------------------------------------------
# Scalar function surface: string / date / JSON / array
# ---------------------------------------------------------------------------

@query(
    "q_string_funcs",
    r"""
SELECT p_partkey,
       UPPER(p_name) AS up_name,
       LENGTH(p_name) AS name_len,
       REPLACE(p_name, ' ', '_') AS snake_name,
       SPLIT_PART(p_name, ' ', 1) AS first_word,
       CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
       LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       CONCAT_WS('|', p_brand, p_type) AS brand_type
FROM part
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression library — all JVM-side built-ins."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "q_date_funcs",
    """
SELECT o_orderkey,
       YEAR(o_orderdate) AS order_year,
       QUARTER(o_orderdate) AS order_quarter,
       MONTH(o_orderdate) AS order_month,
       DAY(o_orderdate) AS order_day,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time expression surface; outputs are DATE/INT (tz-safe)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.quarter(d).alias("order_quarter"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d.cast("date")), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
    )


@query(
    "q_monthly_revenue",
    f"""
SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
       COUNT(*) AS n_orders,
       {_sql_dsum('o_totalprice', 'revenue')}
FROM orders GROUP BY 1
""",
)
def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (the partition-pruning shape: at scale
    the table is partitioned by month and this becomes per-partition)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month")
        )
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@query(
    "q_json_events",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
""",
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("k_total"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@query(
    "q_pivot_status",
    """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders GROUP BY o_orderpriority
""",
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): one column per order status. Compiles to a
    single hash aggregate with conditional counts — same shuffle as a
    plain groupBy, no extra pass per pivoted column."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


@query(
    "q_percentiles",
    """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (percentile_cont
    semantics in both engines; l_quantity is integral so interpolated
    values are exact halves/tenths — no float-tie hashing risk)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.expr("percentile(l_quantity, 0.99)"), 6).alias("p99_qty"),
    )


@query(
    "q_string_agg",
    """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list -> array_sort ->
    array_join (deterministic output regardless of row arrival order —
    the property that makes listagg safe under distributed execution)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count("*").alias("n_nations"),
    )


@query(
    "q_map_funcs",
    """
SELECT p_partkey,
       CAST(cardinality(map(['brand','type','name'],
                            [p_brand, p_type, p_name])) AS INT) AS n_keys,
       map_extract(map(['brand','type','name'],
                       [p_brand, p_type, p_name]), 'brand')[1] AS brand,
       upper(p_type) AS type_upper,
       concat(CASE WHEN length(p_brand) > 9 THEN 'brand,' ELSE '' END,
              CASE WHEN length(p_type) > 9 THEN 'type,' ELSE '' END,
              CASE WHEN length(p_name) > 9 THEN 'name,' ELSE '' END
       ) AS long_keys
FROM part
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar functions: create_map / map_keys / element_at /
    map_filter / transform_values, all JVM-side expressions. The oracle
    mirrors the VALUES (DuckDB lacks map_filter; the filtered-key list
    is re-derived with CASE logic over the same columns)."""
    part = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.col("p_type"),
        F.lit("name"), F.col("p_name"),
    )
    long_kv = F.map_filter(m, lambda k, v: F.length(v) > 9)
    return part.select(
        "p_partkey",
        F.size(m).alias("n_keys"),
        F.element_at(m, F.lit("brand")).alias("brand"),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), F.lit("type")
        ).alias("type_upper"),
        F.concat_ws(
            "",
            F.transform(F.map_keys(long_kv), lambda k: F.concat(k, F.lit(","))),
        ).alias("long_keys"),
    )


@query(
    "q_array_funcs",
    """
SELECT vec_id, label,
       LEN(embedding) AS dim,
       ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2_norm,
       ROUND(LIST_SUM(CAST(embedding AS DOUBLE[])) / LEN(embedding), 6) AS mean_val
FROM embeddings
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array lambda functions (transform/aggregate) over embeddings —
    the JVM-side fast path for vector math (no Python UDF)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    sq_sum = F.aggregate(
        vec, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    total = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        F.size(vec).alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(total / F.size(vec), 6).alias("mean_val"),
    )


# ---------------------------------------------------------------------------
# As-of join and range join (custom operators Spark lacks natively)
# ---------------------------------------------------------------------------

def asof_last_error(ev: DataFrame) -> DataFrame:
    """Annotate every event with the most recent same-user error ts at
    or before it (inclusive): one shuffle on user_id, then a running
    last(ignorenulls) window. Shared by q_asof_join / q_asof_tolerance.

    Tie rule: "at or before" INCLUDES an error at exactly the event's
    timestamp, so within a tied ts the window orders errors before
    non-errors — ordering by raw event_id would drop a same-ts error
    whose id is larger than the click's. Same-ts errors all contribute
    the identical ts value, so the order among them is value-irrelevant;
    event_id remains as the final determinism tiebreak."""
    errors_first = F.when(F.col("event_type") == "error", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", errors_first, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    err_ts = F.when(F.col("event_type") == "error", F.col("ts"))
    return ev.withColumn(
        "last_error_ts", F.last(err_ts, ignorenulls=True).over(w)
    )


@query(
    "q_asof_join",
    """
SELECT c.event_id, epoch_us(c.ts) AS click_ts_us, c.user_id,
       (SELECT epoch_us(MAX(e.ts)) FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id AND e.ts <= c.ts)
       AS last_error_ts_us
FROM events c WHERE c.event_type = 'click'
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (reference semantics: for each click, the most recent
    error at-or-before it for the same user). Spark-native formulation:
    one shuffle on user_id, then a running `last(ignorenulls)` window —
    no O(n^2) join, scales linearly in events per user. Tie semantics
    (same-ts errors included, matching the oracle's `e.ts <= c.ts`)
    live in asof_last_error."""
    ev = load_table(spark, sf_dir, "events")
    return (
        asof_last_error(ev)
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            F.unix_micros("ts").alias("click_ts_us"),
            "user_id",
            F.unix_micros("last_error_ts").alias("last_error_ts_us"),
        )
    )


@query(
    "q_range_join",
    """
SELECT e.event_id AS error_id, COUNT(c.event_id) AS n_clicks_5m
FROM events e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts > e.ts AND c.ts <= e.ts + INTERVAL 5 MINUTE
WHERE e.event_type = 'error'
GROUP BY e.event_id
""",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: clicks within 5 minutes after each error.
    The user_id equi-component makes this a shuffle hash/merge join
    with a residual range predicate — not a cartesian product."""
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = err.join(
        clk,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") > F.col("e_ts"))
        & (F.col("c_ts") <= F.col("e_ts") + F.expr("INTERVAL 5 MINUTES")),
        "left",
    )
    return joined.groupBy("error_id").agg(F.count("click_id").alias("n_clicks_5m"))


@query(
    "q_window_dist",
    """
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER w AS quartile,
       CUME_DIST() OVER w AS cd,
       PERCENT_RANK() OVER w AS pr
FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / cume_dist / percent_rank)
    per market segment. The ratios are exact small-integer divisions —
    both engines produce bit-identical doubles, so no rounding is
    applied (ROUND at the 6th decimal is the cross-engine tie hazard,
    exactness is not)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "q_filtered_agg",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS open_value
FROM orders GROUP BY o_orderpriority
""",
)
def q_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation with the FILTER clause (one pass, one
    shuffle — not one subquery per condition); the filtered money sum
    keeps the DECIMAL-sum-then-DOUBLE hashing discipline."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr("COUNT(*) FILTER (WHERE o_orderstatus = 'F')").alias("n_filled"),
        F.expr(
            "CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
            " FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE)"
        ).alias("open_value"),
    )


@query(
    "q_posexplode",
    """
SELECT p_partkey,
       UNNEST(range(1, len(string_split(p_name, ' ')) + 1)) AS pos,
       UNNEST(string_split(p_name, ' ')) AS word
FROM part
""",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator with ordinality: posexplode over split part names
    (lateral-view shape). Aligned parallel UNNESTs replay the ordinal
    in DuckDB; positions are emitted 1-based to match range()."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "word"),
    ).withColumn("pos", (F.col("pos") + 1).cast("bigint"))


@query(
    "q_unpivot_part",
    """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
""",
)
def q_unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshaping (unpivot/melt): narrow projection, no
    shuffle — the inverse of q_pivot_status. Values promote to the
    common DOUBLE type, as the manual UNION oracle does explicitly.
    (Was registered as "q_unpivot" and silently shadowed by the later
    lineitem unpivot until the registry grew a duplicate-name guard.)"""
    part = load_table(spark, sf_dir, "part")
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_math_funcs",
    """
SELECT l_orderkey, l_linenumber,
       ABS(l_extendedprice - l_quantity * 1000) AS abs_diff,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       CAST(l_orderkey % 7 AS BIGINT) AS mod7,
       CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price_bucket,
       CAST(CEIL(l_quantity / 8) AS BIGINT) AS qty_bucket,
       ROUND(SQRT(l_quantity), 6) AS sqrt_qty,
       POWER(l_discount * 10, 2) AS disc_sq
FROM lineitem WHERE l_orderkey < 1000
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions, restricted to the IEEE-exact subset
    (abs/sign/mod/floor/ceil/sqrt, integer-exponent power): correctly
    rounded in every IEEE engine, so results hash identically. log/exp/
    trig are deliberately excluded — libm implementations differ by
    ULPs across engines and would make exact hashing a coin flip."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_diff"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.floor(F.col("l_extendedprice") / 100).alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 8).alias("qty_bucket"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.pow(F.col("l_discount") * 10, 2).alias("disc_sq"),
    )


ASOF_TOLERANCE_US = 30 * 60 * 1_000_000  # 30 minutes


@query(
    "q_asof_tolerance",
    f"""
SELECT c.event_id, epoch_us(c.ts) AS click_ts_us, c.user_id,
       (SELECT epoch_us(MAX(e.ts)) FROM events e
        WHERE e.event_type = 'error' AND e.user_id = c.user_id
          AND e.ts <= c.ts
          AND epoch_us(e.ts) > epoch_us(c.ts) - {ASOF_TOLERANCE_US})
       AS last_error_ts_us
FROM events c WHERE c.event_type = 'click'
""",
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with tolerance (pandas merge_asof semantics): the most
    recent same-user error at-or-before each click, but only within 30
    minutes — older matches become NULL instead of a stale pairing.
    Same single-shuffle running-window plan as q_asof_join (shared
    asof_last_error, same errors-before-clicks tie order); the
    tolerance is a post-window predicate, not a second join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        asof_last_error(ev)
        .withColumn("last_error_us", F.unix_micros("last_error_ts"))
        .filter(F.col("event_type") == "click")
        .select(
            "event_id",
            F.unix_micros("ts").alias("click_ts_us"),
            "user_id",
            F.when(
                F.col("last_error_us") > F.unix_micros("ts") - ASOF_TOLERANCE_US,
                F.col("last_error_us"),
            ).alias("last_error_ts_us"),
        )
    )


_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       approx_quantile(l_extendedprice, 0.5)
         BETWEEN quantile_disc(l_extendedprice, 0.45)
             AND quantile_disc(l_extendedprice, 0.55) AS p50_ok,
       approx_quantile(l_extendedprice, 0.9)
         BETWEEN quantile_disc(l_extendedprice, 0.85)
             AND quantile_disc(l_extendedprice, 0.95) AS p90_ok,
       approx_quantile(l_extendedprice, 0.99)
         BETWEEN quantile_disc(l_extendedprice, 0.94)
             AND quantile_disc(l_extendedprice, 1.0) AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


@query("q_approx_percentile", _APPROX_PCT_ORACLE)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the Greenwald-Khanna sketch
    (approx_percentile, accuracy 10000): mergeable partial sketches ->
    one tiny shuffle regardless of row count, the scale path where
    exact percentile's full sort-per-group (q_percentiles) would
    shuffle all rows.

    Hash-checkable via the CONTRACT (same design as q_approx_distinct):
    sketch internals differ by engine, so the checked surface is one
    boolean per percentile — "this engine's approx p lies between this
    engine's exact discrete quantiles at p±0.05" — a ±5%-rank bound,
    500x looser than GK's 1/accuracy guarantee, so verdicts agree
    across engines unless a sketch is actually broken. The exact-rank
    bound columns deliberately do NOT need to match across engines
    (each side checks itself); only the verdicts are compared. Raw
    approx values stay asserted in tests/test_relational.py. The
    contract check's collect_list sort is verification harness, not
    the production path."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("p"),
        F.count("*").cast("bigint").alias("n_rows"),
        F.expr("array_sort(collect_list(l_extendedprice))").alias("sorted"),
    )

    def qdisc(q: float):
        return F.expr(
            f"element_at(sorted, CAST(greatest(1, least(n_rows, ceil({q} * n_rows))) AS INT))"
        )

    def ok(idx: int, p: float):
        lo, hi = max(p - 0.05, 0.0), min(p + 0.05, 1.0)
        a = F.col("p")[idx]
        return (a >= qdisc(lo)) & (a <= qdisc(hi))

    return g.select(
        "l_returnflag",
        "n_rows",
        ok(0, 0.5).alias("p50_ok"),
        ok(1, 0.9).alias("p90_ok"),
        ok(2, 0.99).alias("p99_ok"),
    )


@query(
    "q_window_time_range",
    """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       COUNT(*) OVER w AS n_prev_1h,
       CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) OVER w AS BIGINT)
         AS sum_value_1h_scaled
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing-1-hour event count and
    value sum — the rolling-feature shape behind rate limits, velocity
    features, and fraud signals. Ordering on epoch microseconds makes
    the frame bound numeric and engine-portable; the value sum is
    scaled to exact integers. One shuffle on user_id; the frame scan is
    a per-partition ordered sweep, linear in events per user."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.count("*").over(w).alias("n_prev_1h"),
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .over(w)
        .cast("bigint")
        .alias("sum_value_1h_scaled"),
    )


@query(
    "q_full_outer_join",
    """
WITH c AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (customer vs
    supplier presence per nation): both inputs shrink to one row per
    key BEFORE the join — aggregate-then-join, so the outer join
    shuffles O(keys), not O(rows)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count("*").alias("n_cust")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.nk_c == s.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q_salted_join",
    """
SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact-to-dim join (operators/layout.salted_join): the
    big side gets a deterministic per-row salt, the dim side replicates
    across all salt values, and the join keys on (suppkey, salt) so one
    pathological key spreads over salt_buckets tasks. The oracle is the
    PLAIN join — salting is an execution-layout choice that must not
    change a single output row, and the driver hash-check proves it.
    This is the explicit fallback for skew beyond what AQE's skew-join
    splitting handles; at 100 TB the replicated side must stay
    broadcast-sized (it is: supplier is a dim)."""
    from ..operators.layout import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    j = salted_join(li, su, "suppkey", salt_buckets=8)
    return j.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count("*").cast("bigint").alias("n_items"),
        dsum("l_extendedprice", "revenue"),
    )


# --- pivot / unpivot --------------------------------------------------------

_PIVOT_FLAGS = ("A", "N", "R")  # l_returnflag domain


@query(
    "q_pivot",
    f"""
SELECT l_linestatus AS linestatus,
       {", ".join(
           f"CAST(SUM(CASE WHEN l_returnflag = '{v}' "
           f"THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) "
           f"AS rev_{v.lower()}, "
           f"CAST(COALESCE(SUM(CASE WHEN l_returnflag = '{v}' THEN 1 END), 0) "
           f"AS BIGINT) AS n_{v.lower()}"
           for v in _PIVOT_FLAGS
       )}
FROM lineitem
GROUP BY l_linestatus
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rotate l_returnflag values into columns per l_linestatus,
    with revenue (exact decimal sum) and count per cell. Uses
    DataFrame.groupBy().pivot(col, values) with the value list given
    EXPLICITLY — at scale that skips the extra distinct-values job
    Spark otherwise runs. The plan (verified via explain) is the right
    one: ONE map-side-combinable aggregate keyed on (groupBy, pivot)
    collapses the corpus to |groups| x |values| rows before a second
    tiny pivotfirst agg rotates them — the scan reads only 3 columns
    and never runs one job per pivot value. Oracle is the equivalent
    ANSI conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy(F.col("l_linestatus").alias("linestatus"))
        .pivot("l_returnflag", list(_PIVOT_FLAGS))
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    cols = [F.col("linestatus")]
    for v in _PIVOT_FLAGS:
        cols.append(F.col(f"{v}_rev").alias(f"rev_{v.lower()}"))
        cols.append(F.coalesce(F.col(f"{v}_n"), F.lit(0)).cast("bigint").alias(f"n_{v.lower()}"))
    return pv.select(*cols)


@query(
    "q_unpivot",
    f"""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, charge, amount
FROM (
  SELECT l_orderkey, l_linenumber, 'price' AS charge,
         l_extendedprice AS amount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount_amt',
         ROUND(l_extendedprice * l_discount, 4) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax_amt',
         ROUND(l_extendedprice * l_tax, 4) FROM lineitem
) WHERE l_orderkey < 1000
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: rotate three charge columns into (charge, amount)
    rows via DataFrame.unpivot — compiles to Expand (each input row
    emits 3 output rows in ONE pass over the scan, no self-union that
    would read the table three times; the oracle's UNION ALL is the
    semantic twin DuckDB optimizes its own way). The l_orderkey
    predicate stays pushed below the Expand into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    melted = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "discount_amt"
        ),
        F.round(F.col("l_extendedprice") * F.col("l_tax"), 4).alias("tax_amt"),
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["price", "discount_amt", "tax_amt"],
        variableColumnName="charge",
        valueColumnName="amount",
    )
    return melted.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        "charge",
        "amount",
    )


# --- market-basket co-occurrence + PageRank over the item graph -------------

COPURCHASE_TOP = 40
PAGERANK_ITERS = 3
# damping in parts-per-million so every PageRank step is exact integer
# arithmetic: r' = 150000 + (850000 * sum(r_u DIV outdeg_u)) DIV 1000000
_PR_DAMP_MU = 850_000
_PR_BASE_MU = 150_000


@query(
    "q_copurchase_pairs",
    f"""
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
agg AS (
  SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM pairs GROUP BY part_a, part_b
)
SELECT part_a, part_b, n_orders,
       ROW_NUMBER() OVER (ORDER BY n_orders DESC, part_a, part_b) AS rank
FROM agg
QUALIFY rank <= {COPURCHASE_TOP}
""",
)
def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought in the same
    order, counted across all orders — the support-counting core of
    frequent-itemset mining (and the edge list q_pagerank walks).

    Scale shape: the self-join keys on l_orderkey, so pair explosion is
    per-order and bounded by basket size squared (baskets are small and
    bounded by business reality, not corpus size — the classic reason
    market-basket pair counting scales); the pair count is map-side
    combinable, and the final top-40 is a TakeOrdered head, never a
    global sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    agg = pairs.groupBy("part_a", "part_b").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    head = agg.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(COPURCHASE_TOP)
    w = Window.orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
    return head.withColumn("rank", F.row_number().over(w))


def _pagerank_oracle() -> str:
    """Fixed-iteration PageRank unrolled into chained CTEs (SQL
    standard forbids aggregates in a recursive CTE's recursive term,
    so a fixed iteration count unrolls instead — same trick as the
    oracle side of k-means)."""
    step = (
        "SELECT e.dst AS part, "
        f"{_PR_BASE_MU} + ({_PR_DAMP_MU} * CAST(SUM(p.rank_mu // d.deg) AS BIGINT)) "
        "// 1000000 AS rank_mu "
        "FROM {prev} p JOIN outdeg d ON d.src = p.part "
        "JOIN edges e ON e.src = p.part "
        "GROUP BY e.dst"
    )
    iters = ",\n".join(
        f"pr{i} AS ({step.format(prev=f'pr{i - 1}')})"
        for i in range(1, PAGERANK_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
edges AS (
  SELECT part_a AS src, part_b AS dst FROM pairs GROUP BY part_a, part_b
),
outdeg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
),
pr0 AS (
  SELECT src AS part, CAST(1000000 AS BIGINT) AS rank_mu FROM outdeg
),
{iters}
SELECT part, rank_mu FROM pr{PAGERANK_ITERS}
"""


@query("q_pagerank", _pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (damping 0.85) over the co-purchase
    item graph — the canonical iterative Spark workload, joining the
    engine's other iterative operators (connected components, k-means).
    All arithmetic is integer micro-units (rank_mu starts at 1e6;
    each step is base + damp * sum(rank/deg) in exact BIGINT floor
    division), so three iterations hash-check exactly against the
    unrolled SQL.

    Scale shape: the co-purchase edge list is per-order bounded (see
    q_copurchase_pairs); each iteration is ONE shuffle keyed on dst
    with map-side partial sums (the Pregel message-combine pattern),
    and the contribution join keys on src — both AQE-managed equi
    joins, no broadcast of anything rank-sized. Iteration count is
    FIXED, so the lineage stays 3 deep (no checkpoint needed; the
    component-loop operator shows the localCheckpoint pattern for
    convergence-driven loops). The adjacency list is reused across
    iterations — at 100 TB it would be persisted once; here Catalyst
    dedups the identical subplan via ReusedExchange (an explicit
    checkpoint was A/B'd and lost; numbers below)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        # (order, part) dedup BEFORE the self-join: edges are distinct
        # anyway, so this is semantics-free, and shrinking the join
        # input before the quadratic step measured ~20% faster at
        # sf0.1 (4.7s -> 3.6s) even at ~0.01% duplication
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    # raw pair stream, NOT distinct'd: edge dedup rides the adjacency
    # aggregate below as collect_set, so the (src,dst)-keyed exchange
    # the old edges.distinct() paid is gone (r15 follow-up: interleaved
    # in-JVM A/B 4.94 vs 3.07 s min, new faster in every warmed pair).
    # All iterations still run in one job, so Catalyst dedups the
    # identical adjacency subplan via ReusedExchange — an eager
    # localCheckpoint of adj was A/B'd on top of this and LOST
    # (2.457 vs 2.554 min): the checkpoint adds a dispatch + array
    # serialization that ReusedExchange already amortizes.
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    # ADJACENCY-LIST iteration (r15, guide §2.3 "shuffle keys instead of
    # payloads" turned inward): one node-keyed aggregation folds the
    # raw pair stream into (src, dsts[], deg) — outdeg rides the same
    # agg, so the old separate outdeg aggregate AND the per-iteration
    # ranks->outdeg->edges join chain are gone. Each iteration now joins
    # node-cardinality ranks onto node-cardinality adjacency rows
    # (AQE broadcasts the 20k-row side at sf0.1; at scale both sides
    # are node-keyed equi-joins) and explodes to per-edge shares AFTER
    # the join, feeding the same map-side-combinable dst sum — the per-
    # iteration 2.4M-row edge-stream join probe becomes a 20k-row one.
    # Equivalence of the collect_set form vs the oracle's
    # DISTINCT-edges + GROUP BY count: collect_set yields the same dst
    # SET per src (element order irrelevant — every consumer is an
    # exact commutative BIGINT sum over exploded shares), and
    # deg = size(set) = the oracle's distinct-edge count per src, so
    # every share rank_mu DIV deg is bit-identical. One src-keyed
    # exchange with map-side partial collect_set replaces the
    # (src,dst)-keyed distinct exchange + the groupBy's src exchange.
    # Measured on landing: adjacency iteration 4.2 -> 2.3 s warm
    # (interleaved in-JVM mins, twice), then the collect_set fold
    # 4.94 -> 3.07 s min; output row-identical at sf0.1 and
    # oracle-green at sf0.01/sf0.001.
    # Hub-skew bound for the per-src collect_set (r16, VERDICT r15 item
    # 4): the adjacency row for a node is degree-sized and lands on ONE
    # task, so this shape is safe only if max degree does not grow with
    # the corpus.  It does not, structurally: deg(p) <= orders(p) x
    # (max_basket - 1), and the fixture (like TPC-H) scales the part
    # catalog WITH the fact table, so both factors are SF-constants.
    # Measured across three decades (DuckDB, distinct co-purchase
    # degree): max deg 138 @ sf0.001, 206 @ sf0.01, 222 @ sf0.1 while
    # nodes grew 100x (orders-per-part <= 47/49/53, basket <= 11/13/17)
    # — flat, so at 100 TB the worst adjacency row stays a few KB.
    # A synthetic-hub probe at the 100x corpus (OPTIMIZATION_r16.md
    # item 4) measures the failure mode this bound excludes.  Salting
    # the collect_set was considered and NOT taken: two-level
    # aggregation only splits the partial sets — the merged hub row
    # (and its explode) is degree-sized regardless, so salting adds an
    # exchange without removing the single-row concentration; a corpus
    # with true hubs needs a hybrid edge-stream path for the hot keys
    # (documented, not speculatively built — the fixture class cannot
    # reach it).
    adj = pairs.groupBy("src").agg(F.collect_set("dst").alias("dsts"))
    adj = adj.select("src", "dsts", F.size("dsts").cast("bigint").alias("deg"))
    # Iteration 1 folded in: ranks0 is (every src, 1e6), so the first
    # ranks-join is the identity attach — contrib1 reads straight off
    # the adjacency with rank_mu = 1e6 (bit-identical: 1e6 DIV deg).
    contrib = adj.select(
        F.explode("dsts").alias("part_new"),
        F.expr("CAST(1000000 AS BIGINT) DIV deg").alias("share"),
    )
    for it in range(PAGERANK_ITERS):
        if it > 0:
            contrib = (
                ranks.join(adj, F.col("src") == F.col("part"))
                .select(
                    F.explode("dsts").alias("part_new"),
                    F.expr("rank_mu DIV deg").alias("share"),
                )
            )
        ranks = contrib.groupBy("part_new").agg(
            (
                F.lit(_PR_BASE_MU)
                + F.expr(
                    f"({_PR_DAMP_MU} * sum(share)) DIV 1000000"
                )
            )
            .cast("bigint")
            .alias("rank_mu")
        ).select(F.col("part_new").alias("part"), "rank_mu")
    return ranks


@query(
    "q_window_frames",
    """
WITH o AS (
  SELECT o_orderkey AS orderkey, o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey < 5000
)
SELECT orderkey, priority, cents,
       CAST(SUM(cents) OVER (PARTITION BY priority ORDER BY cents, orderkey
                             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
            AS BIGINT) AS centered_sum,
       CAST(COUNT(*) OVER (PARTITION BY priority ORDER BY cents
                           RANGE BETWEEN 100000 PRECEDING AND 100000 FOLLOWING)
            AS BIGINT) AS n_within_1k,
       CAST((cents * 1000000) // SUM(cents) OVER (PARTITION BY priority)
            AS BIGINT) AS share_ppm
FROM o
""",
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame-bound coverage the other window queries lack:
    a centered ROWS frame (2 PRECEDING .. 2 FOLLOWING, deterministic
    via the orderkey tiebreak), a symmetric VALUE-based RANGE frame
    (orders within +-$1000 of each order, peer-inclusive by value so
    tie order is irrelevant), and a frame-less whole-partition
    aggregate (share of priority-total spend, exact ppm integers).
    Money is held in BIGINT cents throughout — sums and the ppm
    floor-division hash identically across engines. One exchange on
    the partition key serves all three windows; the orderkey predicate
    pushes to the parquet scan. (Replaced q_window_ntile, which
    duplicated q_window_dist's exact operator set on another table.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    o = o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    rows_w = (
        Window.partitionBy("priority")
        .orderBy(F.asc("cents"), F.asc("orderkey"))
        .rowsBetween(-2, 2)
    )
    range_w = (
        Window.partitionBy("priority")
        .orderBy(F.asc("cents"))
        .rangeBetween(-100_000, 100_000)
    )
    return o.select(
        "orderkey",
        "priority",
        "cents",
        F.sum("cents").over(rows_w).cast("bigint").alias("centered_sum"),
        F.count("*").over(range_w).cast("bigint").alias("n_within_1k"),
        F.expr(
            "CAST((cents * 1000000)"
            " DIV SUM(cents) OVER (PARTITION BY priority) AS BIGINT)"
        ).alias("share_ppm"),
    )


# --- blocked fuzzy join (entity resolution) ---------------------------------

FUZZY_PROBES = ("smal ring", "red widgit", "blue blot", "hot gearr", "smll gizmo")
FUZZY_MAX_DIST = 2
FUZZY_TOP = 3


def _fuzzy_oracle() -> str:
    vals = ", ".join(f"('{p}')" for p in FUZZY_PROBES)
    return f"""
WITH probes(probe) AS (VALUES {vals}),
cand AS (
  SELECT probe, p_partkey, p_name,
         levenshtein(probe, p_name) AS dist
  FROM part JOIN probes
    ON substr(p_name, 1, 1) = substr(probe, 1, 1)
   AND abs(length(p_name) - length(probe)) <= {FUZZY_MAX_DIST}
  WHERE levenshtein(probe, p_name) <= {FUZZY_MAX_DIST}
)
SELECT probe, p_partkey, p_name, CAST(dist AS BIGINT) AS dist,
       ROW_NUMBER() OVER (PARTITION BY probe
                          ORDER BY dist, p_partkey) AS rank
FROM cand
QUALIFY rank <= {FUZZY_TOP}
"""


@query("q_fuzzy_match", _fuzzy_oracle())
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join: resolve dirty probe strings against the
    part catalog by edit distance <= 2, top-3 per probe — the
    entity-resolution primitive (dirty crawl values -> canonical
    entities) that naive formulations write as a cartesian +
    levenshtein over everything.

    Scale shape: the join carries an EQUI component (first-char block
    key) plus a length-band filter, so Catalyst plans a hash join on
    the block key and the expensive levenshtein only runs inside
    blocks — with real blocking keys (normalized prefix + length bin)
    the candidate set is block-sized at any catalog size, never
    |dirty| x |catalog|. Probes here are a literal broadcast table;
    at scale the dirty side is a full DataFrame and the same equi-key
    plan holds."""
    part = load_table(spark, sf_dir, "part")
    probes = spark.createDataFrame(
        [(p,) for p in FUZZY_PROBES], "probe string"
    )
    dist = F.levenshtein(F.col("probe"), F.col("p_name"))
    cand = (
        part.join(
            F.broadcast(probes),
            (
                F.substring(F.col("p_name"), 1, 1)
                == F.substring(F.col("probe"), 1, 1)
            )
            & (
                F.abs(F.length("p_name") - F.length("probe"))
                <= FUZZY_MAX_DIST
            ),
        )
        .select("probe", "p_partkey", "p_name", dist.cast("bigint").alias("dist"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
    )
    w = Window.partitionBy("probe").orderBy(F.asc("dist"), F.asc("p_partkey"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= FUZZY_TOP
    )


# --- triangle counting (degree-oriented) ------------------------------------

TRI_SUPPORT = 2  # co-purchase support threshold: edge iff >= 2 shared orders


@query(
    "q_triangle_count",
    f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
und AS (
  SELECT pa AS a, pb AS b FROM pairs
  GROUP BY pa, pb HAVING COUNT(*) >= {TRI_SUPPORT}
),
nodes AS (SELECT a AS v FROM und UNION ALL SELECT b FROM und),
deg AS (SELECT v, COUNT(*) AS d FROM nodes GROUP BY v),
o AS (
  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS src,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS dst
  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
),
okey AS (SELECT o.src, o.dst, d.d AS dst_d FROM o JOIN deg d ON d.v = o.dst),
wedge AS (
  SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
  FROM okey w1 JOIN okey w2
    ON w1.src = w2.src AND (w1.dst_d, w1.dst) < (w2.dst_d, w2.dst)
),
tri AS (
  SELECT COUNT(*) AS t FROM wedge w JOIN o ON o.src = w.b AND o.dst = w.c
)
SELECT CAST((SELECT COUNT(*) FROM o) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM wedge) AS BIGINT) AS n_wedges,
       CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the support-thresholded co-purchase graph
    (edge iff two parts share >= TRI_SUPPORT orders) via DEGREE
    ORIENTATION — the standard distributed formulation (Cohen 2009 /
    MGT): orient every edge from its (degree, id)-smaller endpoint,
    enumerate wedges only among a node's ORIENTED out-neighbors, close
    each wedge against the oriented edge list. Orientation bounds
    out-degree at O(sqrt(m)), so wedge generation is ~m^1.5 worst-case
    instead of sum(deg^2) — hub nodes never explode.

    Scale shape: support thresholding collapses the quadratic raw-pair
    space to the frequent edges FIRST (map-side combinable count +
    HAVING); everything after runs on the small edge list with
    equi-keyed joins only (src for wedges, (b, c) for closure). All
    counts exact BIGINTs; output is one row."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    # CHECKPOINTED edge list + degrees (r15): the un-checkpointed form
    # replicated the pair-stream subtree into every consumer branch —
    # a 310-Exchange / 38-SortMergeJoin initial plan whose planning and
    # AQE re-optimization dominated execution (the edge list is only
    # ~3.6k rows at sf0.1). Materializing und once (linear, partition-
    # distributed — the connected_keepers edge-frame discipline) and
    # deg once (node-cardinality, one cheap job over the cached edges)
    # collapses the plan; join strategies stay with AQE, which now sees
    # EXACT sizes and broadcasts deg while it fits — no pinned
    # broadcast to blow up when the node count grows with the catalog.
    # Interleaved in-JVM A/B: 3.24 -> 0.51 s min, output identical.
    # (The earlier r15 A/B that checkpointed o INSTEAD measured slower,
    # 4.35 vs 3.63 — orientation is downstream of the deg joins, so the
    # und/deg duplication survived; checkpointing upstream is what
    # removes it.)
    und = local_checkpoint(
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("ua"), F.col("b.l_partkey").alias("ub")
        )
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= TRI_SUPPORT)
        .select("ua", "ub")
    )
    nodes = und.select(F.col("ua").alias("v")).unionAll(
        und.select(F.col("ub").alias("v"))
    )
    deg = local_checkpoint(nodes.groupBy("v").agg(F.count("*").alias("d")))
    da = deg.select(F.col("v").alias("va"), F.col("d").alias("dda"))
    db = deg.select(F.col("v").alias("vb"), F.col("d").alias("ddb"))
    keyed = und.join(da, F.col("ua") == F.col("va")).join(
        db, F.col("ub") == F.col("vb")
    )
    flip = F.struct(F.col("dda"), F.col("ua")) < F.struct(F.col("ddb"), F.col("ub"))
    o = keyed.select(
        F.when(flip, F.col("ua")).otherwise(F.col("ub")).alias("src"),
        F.when(flip, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
    )
    okey = o.join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dst_d")), "dst")
    w1 = okey.select("src", F.col("dst").alias("wb"), F.col("dst_d").alias("db1"))
    w2 = okey.select(F.col("src").alias("src2"), F.col("dst").alias("wc"), F.col("dst_d").alias("db2"))
    wedge = w1.join(
        w2,
        (F.col("src") == F.col("src2"))
        & (
            F.struct(F.col("db1"), F.col("wb"))
            < F.struct(F.col("db2"), F.col("wc"))
        ),
    ).select("wb", "wc")
    tri = wedge.join(
        o, (F.col("src") == F.col("wb")) & (F.col("dst") == F.col("wc"))
    )
    # one job, no driver-side counts: three 1-row aggregates cross-joined
    # (the shared edge subplan dedups via ReusedExchange)
    return (
        o.agg(F.count("*").cast("bigint").alias("n_edges"))
        .crossJoin(wedge.agg(F.count("*").cast("bigint").alias("n_wedges")))
        .crossJoin(tri.agg(F.count("*").cast("bigint").alias("n_triangles")))
    )


# --- skyline (Pareto frontier) ----------------------------------------------


@query(
    "q_skyline",
    """
SELECT a.p_partkey AS partkey, a.p_retailprice AS price,
       CAST(a.p_size AS BIGINT) AS size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on (lower price,
    larger size) — the multi-criteria shortlist operator (cheapest
    tradeoff curve) the naive formulation writes as an O(n^2)
    NOT EXISTS anti-join (which IS the oracle, on the small fixture).

    Scale shape (two-phase, the classic distributed skyline): phase 1
    computes each partition's LOCAL skyline in one vectorized Arrow
    pass — sort by (price asc, size desc), a row survives iff its size
    beats the running max over strictly-cheaper prices and the max of
    its own price group — every globally nondominated row survives
    locally, so correctness is partition-independent; phase 2 re-runs
    the same filter over the union of local skylines, which is
    skyline-per-partition sized (tiny), in ONE global pass: its
    mapInPandas callback concatenates every Arrow batch before
    filtering (Arrow splits >10k-row inputs into multiple batches —
    filtering per-batch there would miss cross-batch dominations), and
    the repartition(1) is a real shuffle barrier so phase 1 keeps the
    scan's parallelism instead of collapsing into phase 2's single
    task. The corpus is scanned exactly once; only local winners move
    through the exchange."""
    import pandas as pd

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    )

    def _skyline_filter(pdf):
        pdf = pdf.sort_values(["price", "size", "partkey"], ascending=[True, False, True])
        per_price_max = pdf.groupby("price", sort=True)["size"].max()
        prefix = per_price_max.cummax().shift(1, fill_value=-(10**18))
        grp_max = pdf["price"].map(per_price_max)
        strict_prefix = pdf["price"].map(prefix)
        dominated = (strict_prefix >= pdf["size"]) | (pdf["size"] < grp_max)
        return pdf[~dominated]

    def local_skyline(batches):
        for pdf in batches:
            if not pdf.empty:
                yield _skyline_filter(pdf)

    def global_skyline(batches):
        pdfs = [pdf for pdf in batches if not pdf.empty]
        if pdfs:
            yield _skyline_filter(pd.concat(pdfs, ignore_index=True))

    schema = "partkey bigint, price double, size bigint"
    local = part.mapInPandas(local_skyline, schema)
    return local.repartition(1).mapInPandas(global_skyline, schema)


# --- data profiling (one-pass per-column stats) -----------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    parts = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(ROUND(MIN({c}) * 10000) AS BIGINT) AS min_cu,
       CAST(ROUND(MAX({c}) * 10000) AS BIGINT) AS max_cu
FROM lineitem"""
        for c in _PROFILE_COLS
    )
    return parts


@query("q_profile_stats", _profile_oracle())
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling ("ANALYZE TABLE" as a query): per-column row /
    null / exact-distinct counts and integer-cents min/max for the
    numeric lineitem columns — the stats-collection pass every ingest
    pipeline runs before trusting a new drop.

    Scale shape: ONE scan computes every metric (a single aggregate
    with 4x5 expressions; distinct counts expand per column inside the
    same agg), then a 1-row unpivot emits one row per column — versus
    the oracle's UNION ALL of per-column scans, which reads the table
    4 times (fine for DuckDB at sf0.01, wasteful at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").cast("bigint").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__n_nulls"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__n_distinct"),
            F.round(F.min(c) * 10000).cast("bigint").alias(f"{c}__min_cu"),
            F.round(F.max(c) * 10000).cast("bigint").alias(f"{c}__max_cu"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n_rows").alias("n_rows"),
                F.col(f"{c}__n_nulls").alias("n_nulls"),
                F.col(f"{c}__n_distinct").alias("n_distinct"),
                F.col(f"{c}__min_cu").alias("min_cu"),
                F.col(f"{c}__max_cu").alias("max_cu"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# --- Z-order (Morton) layout keys -------------------------------------------

_Z_BITS = 16


def _zkey_expr(p: str, s: str, div: str = "DIV") -> str:
    """Bit-interleave two _Z_BITS-wide ints as pure integer arithmetic
    (floor-div/mod/multiply only) so the same formula is exact in both
    engines — no engine-specific bit operators. ``div`` is the one
    token the dialects spell differently (Spark ``DIV``, DuckDB
    ``//``)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({p} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({s} {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


@query(
    "q_zorder_layout",
    f"""
WITH keyed AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % {1 << _Z_BITS} AS pb,
         l_suppkey % {1 << _Z_BITS} AS sb
  FROM lineitem
),
z AS (
  SELECT l_orderkey, l_linenumber, pb, sb,
         {_zkey_expr("pb", "sb", div="//")} AS zkey
  FROM keyed
)
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
       pb AS part_bucket, sb AS supp_bucket, CAST(zkey AS BIGINT) AS zkey
FROM z
ORDER BY zkey, orderkey, linenumber
LIMIT 50
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: bit-interleave the (partkey,
    suppkey) buckets so sorting by the key clusters rows that are
    close in BOTH dimensions — what Delta/Iceberg OPTIMIZE ZORDER
    computes so parquet min/max stats can prune two-dimensional range
    predicates (a sort on partkey alone leaves suppkey ranges spread
    across every file). The interleave is pure DIV/MOD arithmetic, so
    the identical expression is exact in both engines.

    Scale shape: the key is a stateless narrow projection (no shuffle
    to compute); the intended use is `df.repartitionByRange(zkey)
    .sortWithinPartitions(zkey).write...` — one range shuffle at write
    time buys stats-based file skipping on every later 2D query. The
    registered query returns the 50 smallest keys (TakeOrdered, no
    global sort) as the deterministic check surface."""
    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        (F.col("l_partkey") % (1 << _Z_BITS)).alias("part_bucket"),
        (F.col("l_suppkey") % (1 << _Z_BITS)).alias("supp_bucket"),
    )
    z = keyed.withColumn(
        "zkey", F.expr(_zkey_expr("part_bucket", "supp_bucket")).cast("bigint")
    )
    return z.orderBy(F.asc("zkey"), F.asc("orderkey"), F.asc("linenumber")).limit(50)


# --- Bloom-pruned join (runtime semi-filter at the scan) --------------------

BLOOM_JOIN_M = 1 << 16  # filter bits (1024 longs); size ~10x expected keys
BLOOM_JOIN_K = 3  # probes per key (disjoint md5 hex windows)
_BJ_PRED = "o_orderpriority = '1-URGENT' AND o_totalprice >= 450000.0"


def _bloom_pos_exprs(key_sql: str) -> list[str]:
    """K bit positions per key: disjoint 8-hex-char windows of
    md5(key), each mod BLOOM_JOIN_M — engine-portable (the same md5
    discipline as the MinHash/KMV sketches), though the oracle never
    needs them: Bloom pruning has no false negatives and the real join
    removes false positives, so results are exactly the plain join's."""
    return [
        f"(CAST(CONV(SUBSTRING(MD5(CAST({key_sql} AS STRING)), {1 + 8 * j}, 8),"
        f" 16, 10) AS BIGINT) % {BLOOM_JOIN_M})"
        for j in range(BLOOM_JOIN_K)
    ]


def bloom_mask_and_tests(
    build_side: DataFrame, build_key: str, probe_key: str
) -> tuple[str, str]:
    """Build the Bloom bitmask from ``build_side[build_key]`` (one tiny
    job; the distinct-bit collect is <= BLOOM_JOIN_M rows, constant-
    bounded) and return (mask array literal, probe-side filter SQL over
    a ``_mask`` column). Shared by q_bloom_join_prune and its
    effectiveness test so the word packing and the shift/mask probe
    expression cannot silently diverge."""
    bit_rows = (
        build_side.select(
            F.explode(
                F.array(*[F.expr(p) for p in _bloom_pos_exprs(build_key)])
            ).alias("bit")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_JOIN_M // 64)
    for r in bit_rows:
        words[r["bit"] >> 6] |= 1 << (r["bit"] & 63)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    mask_lit = "array(" + ",".join(f"{w}L" for w in signed) + ")"
    # Each {p} (an md5+conv subtree) is interpolated twice (DIV 64 and
    # % 64). Binding it once via a TRANSFORM(ARRAY(MD5(..)), h -> ..)
    # let-trick measured SLOWER (1.29s vs 1.02s warm, sf0.1 lineitem):
    # higher-order functions are interpreted per element, while the
    # duplicated subtree stays inside whole-stage codegen. Keep the
    # duplication — it is the measured-faster form.
    tests = " AND ".join(
        f"((SHIFTRIGHT(ELEMENT_AT(_mask, CAST(({p}) DIV 64 AS INT) + 1),"
        f" CAST(({p}) % 64 AS INT)) & 1L) = 1L)"
        for p in _bloom_pos_exprs(probe_key)
    )
    return mask_lit, tests


@query(
    "q_bloom_join_prune",
    f"""
SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue', 6)}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE {_BJ_PRED}
GROUP BY 1
""",
)
def q_bloom_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-dim join with an explicit runtime Bloom filter:
    revenue by month for lineitems of urgent high-value orders (~2% of
    orders). The filtered dim's join keys compress to a BLOOM_JOIN_M-bit
    set built in one tiny dim-side job (collect is <= M distinct bit
    rows — constant-bounded, never key-proportional), inlined as ONE
    foldable array<bigint> literal; every lineitem row tests its K bit
    positions with shift/mask arithmetic INSIDE the scan projection —
    zero shuffle, zero join for the pruning step — and only surviving
    rows (true matches + ~0.2% false positives at these sizes) enter
    the real broadcast join, which removes the false positives, so the
    result is exactly the plain join's and the oracle needs no Bloom
    model at all.

    Scale: this is the manual statement of what AQE's runtime bloom
    filter join (spark.sql.optimizer.runtime.bloomFilter.enabled) and
    DPP do for partition columns — at 100 TB size m ~ 10x the filtered
    key count and ship the mask as a broadcast variable instead of a
    literal once it outgrows a few KB; the scan-side mechanics are
    identical. The win is shuffle bytes: non-matching fact rows die at
    the scan instead of crossing the exchange."""
    orders = load_table(spark, sf_dir, "orders").filter(F.expr(_BJ_PRED))
    mask_lit, tests = bloom_mask_and_tests(orders, "o_orderkey", "l_orderkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .withColumn("_mask", F.expr(mask_lit))
        .filter(F.expr(tests))
        .drop("_mask")
    )
    return (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            dsum("l_extendedprice * (1 - l_discount)", "revenue", 6),
        )
    )


# --- label propagation communities ------------------------------------------

LPA_ITERS = 2


def _lpa_oracle() -> str:
    step = """
SELECT part, l FROM (
  SELECT e.src AS part, p.l AS l,
         ROW_NUMBER() OVER (PARTITION BY e.src
                            ORDER BY COUNT(*) DESC, p.l) AS rn
  FROM edges e JOIN {prev} p ON p.part = e.dst
  GROUP BY e.src, p.l
) WHERE rn = 1"""
    iters = ",\n".join(
        f"lp{i} AS ({step.format(prev=f'lp{i - 1}')})"
        for i in range(1, LPA_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
edges AS (SELECT part_a AS src, part_b AS dst FROM pairs GROUP BY 1, 2),
lp0 AS (SELECT DISTINCT src AS part, src AS l FROM edges),
{iters}
SELECT part, l AS label FROM lp{LPA_ITERS}
"""


@query("q_label_propagation", _lpa_oracle())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (LPA, Raghavan 2007) over the
    co-purchase item graph: every node starts in its own community and
    each of LPA_ITERS rounds adopts the most common label among its
    neighbors (ties -> smallest label) — the classic cheap community
    detector, complementing connected components (pure reachability)
    and PageRank (centrality) in the graph family. Deterministic by
    construction: synchronous updates + total tie order, so the
    unrolled-CTE oracle reproduces it exactly.

    Scale shape: per round, ONE equi-join of edges onto the label table
    keyed on dst, then a (src, label) count that partial-aggregates
    map-side, collapsed per node with max_by over (count, -label) — the
    same combine-then-argmax discipline as ev_cdc_compact, so each
    round's exchanges carry O(edges) then O(nodes x distinct
    neighbor-labels), never materializing per-node label multisets.
    (The oracle states the argmax as a window; max_by is the
    shuffle-lean semantic twin.) The edge list dedups (order, part)
    BEFORE the self-join — the r5 PageRank lesson — and the iteration
    count is fixed, keeping lineage LPA_ITERS deep with no
    checkpointing."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b"))
    edges = (
        a.join(b, "k")
        .filter(F.col("part_a") != F.col("part_b"))
        .select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        .distinct()
        # an eager localCheckpoint here was A/B'd (r15 follow-up,
        # interleaved in-JVM): LOSES 5.57 vs 8.09 s min — with one
        # post-fold round the two edge mentions are already deduped by
        # ReusedExchange and the checkpoint only adds a dispatch
    )
    # Iteration 1 folded into ONE map-side-combinable aggregation (r15):
    # lp0 gives every node its own label, the edge list is DISTINCT and
    # SYMMETRIC (the <> condition emits both directions, so every dst is
    # also a src and the dst-join drops nothing), hence every round-1
    # (src, neighbor-label) count is exactly 1 and the argmax-by-
    # (count, lowest-label) degenerates to MIN(dst) per src. That
    # removes the labels-init distinct (an edge-sized exchange), round
    # 1's join, and round 1's (src, l) count exchange — measured
    # 3.75 -> 2.00 s warm at sf0.1 (interleaved in-JVM mins), identical
    # output at sf0.1, oracle-green at sf0.01/sf0.001. (q_pagerank's
    # adjacency form was ALSO measured here and is slower for LPA —
    # 2.56 vs 2.00 — a single remaining message round cannot amortize
    # the collect_list build; left in the flat edge form.)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("l"))
        .withColumnRenamed("src", "part")
    )
    for _ in range(LPA_ITERS - 1):
        cnt = (
            edges.join(labels.withColumnRenamed("part", "dst"), "dst")
            .groupBy(F.col("src"), F.col("l"))
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.groupBy("src")
            .agg(
                F.max_by(
                    F.col("l"),
                    F.struct(F.col("c").alias("c"), (-F.col("l")).alias("neg_l")),
                ).alias("l")
            )
            .withColumnRenamed("src", "part")
        )
    return labels.select("part", F.col("l").alias("label"))
