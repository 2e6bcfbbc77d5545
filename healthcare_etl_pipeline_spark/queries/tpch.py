"""TPC-H-style analytical queries over the star-schema testdata.

These exercise the core relational operator families (SURVEY.md §7.3):
multi-way joins, hash aggregation with partial (map-side) combine, filters
pushed to the parquet scan, broadcast joins for dimensions, window top-k.

Scale notes (100 TB posture):
- Dimension tables (region/nation/supplier/part) are joined with explicit
  ``F.broadcast`` — at TPC-H ratios they stay tiny relative to the fact
  tables, so the join never shuffles the fact side.
- Aggregations are expressed as single groupBy/agg so Catalyst emits
  partial_hashagg → shuffle-on-group-keys → final_hashagg; group-key
  cardinality (returnflag×linestatus, nation, priority) is low, so the
  shuffle moves only pre-aggregated rows.
- All float aggregates are rounded to 2 decimals on both Spark and DuckDB
  sides so cross-engine summation-order noise cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.queries.helpers import dim_hint, t
from healthcare_etl_pipeline_spark.queries.registry import query

_SPLIT_M = 1_000_000


def split_sums(v, tag: str) -> list:
    """EXACT distributed sum of a scaled-integer money expression as two
    long accumulators: sum(v div 1e6) and sum(v mod 1e6). Spark's decimal
    SUM beyond precision 18 allocates BigDecimal per row (~4x a whole
    scan-agg query, measured); plain long cents wrap around sf100. The
    split keeps per-row hi <= ~1e5 and lo <= 1e6-1, so the long sums stay
    exact to ~9e12 rows per group (the lo accumulator binds: 2^63 / (1e6-1)
    ~= 9.2e12; ~6 orders of magnitude past sf100's ~1.5e8 rows/group).
    hi/lo are exact: v < 2^53 so the double division's
    quotient cannot cross an integer boundary (1/M >> ulp); mod of
    non-negative longs is closed."""
    return [
        F.sum(F.floor(v / _SPLIT_M).cast("long")).alias(f"hi_{tag}"),
        F.sum(v % _SPLIT_M).alias(f"lo_{tag}"),
    ]


def recombine(tag: str, scale: int, dp: int):
    """Recombine a :func:`split_sums` pair into round(value, dp) as double
    — decimal arithmetic over the (few) output rows only."""
    total = F.col(f"hi_{tag}").cast("decimal(38,6)") * _SPLIT_M + F.col(
        f"lo_{tag}"
    ).cast("decimal(38,6)")
    return F.round(total / (10**scale), dp).cast("double").alias(tag)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                          * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                          * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))), 2) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 pricing summary: scan-filter + 8-way hash agg. "
    "Money sums are EXACT (TPC-H semantics): at sf10 (~10M rows/group) "
    "double summation is order-dependent at the 2dp rounding boundary, "
    "so Spark and any oracle legitimately differ in the last cent. A "
    "decimal SUM would be exact but leaves Spark's compact-long decimal "
    "fast path (sum precision > 18 → per-row BigDecimal, measured ~4x "
    "the whole query). Instead each money value is an exact scaled "
    "INTEGER (2dp inputs → products exact at 4dp/6dp in int64) summed "
    "as a SPLIT ACCUMULATOR — two long sums of (v div 1e6, v mod 1e6) — "
    "then recombined in decimal over the 6 output rows. Per-row hi "
    "≤ 1.1e5 and lo ≤ 1e6-1, so the long sums stay exact to ~9e12 rows "
    "per group (lo binds): "
    "overflow-safe at 100 TB where plain long cents would wrap at sf100.",
    tags=("agg", "tpch"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # exact scaled-integer per-row values (all inputs have <= 2dp)
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")  # 1e-2 units
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")  # 1e-2
    dfac = F.round((1 - F.col("l_discount")) * 100).cast("long")  # percent
    tfac = F.round((1 + F.col("l_tax")) * 100).cast("long")  # percent
    disc_p = cents * dfac  # 1e-4 units, < 1e9
    charge = disc_p * tfac  # 1e-6 units, < 1.1e11

    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *split_sums(qty_c, "sum_qty"),
            *split_sums(cents, "sum_base_price"),
            *split_sums(disc_p, "sum_disc_price"),
            *split_sums(charge, "sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        recombine("sum_qty", 2, 2),
        recombine("sum_base_price", 2, 2),
        recombine("sum_disc_price", 4, 2),
        recombine("sum_charge", 6, 2),
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: 3-way join + agg + top-10 by revenue.",
    tags=("join", "agg", "topk", "tpch"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5: 6-way join (broadcast dims) + agg per nation.",
    tags=("join", "agg", "broadcast", "tpch"),
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            dim_hint(supp, sf_dir, "supplier"),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(8,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan-filter-agg; every predicate pushes to "
    "parquet. Revenue is an EXACT split-accumulator sum (the sf100 value "
    "differential caught the double sum differing from the oracle in the "
    "last cent over ~12M matching rows — same class as Q1).",
    tags=("filter", "agg", "pushdown", "tpch"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # price(2dp) * discount(2dp) is exact at 4dp in int64 (< 1e9 per row)
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(*split_sums(rev, "revenue"))
        .select(recombine("revenue", 4, 2))
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: returned-item revenue per customer, top-20.",
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "top_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    )
    WHERE rk <= 3
    """,
    description="Window top-K per group: 3 priciest orders per customer.",
    tags=("window", "topk"),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rk")
    )


@query(
    "rollup_order_volume",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    description="ROLLUP aggregation over status × priority with grand "
    "total. Money sums are EXACT via the split-accumulator kernel "
    "(queries/tpch.py:31 split_sums): the sf10 digest ladder caught the "
    "double-sum form off by cents on the 15 M-row grand-total row "
    "(3752339125855.94 vs .97 — summation-order drift, the q1/q6 bug "
    "class one aggregation shape over), so the rollup's totals use the "
    "same exact path; oracle sums in DECIMAL.",
    tags=("agg", "rollup"),
)
def rollup_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    agg = orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        *split_sums(cents, "total_price"),
    )
    return agg.select(
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        recombine("total_price", 2, 2),
    )


@query(
    "cube_part_stats",
    oracle="""
    SELECT p_brand, p_type, count(*) AS n_parts,
           round(avg(p_retailprice), 2) AS avg_price
    FROM part
    GROUP BY CUBE (p_brand, p_type)
    """,
    description="CUBE aggregation over brand × type.",
    tags=("agg", "cube"),
)
def cube_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.cube("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
    )


@query(
    "distinct_ship_modes",
    oracle="""
    SELECT count(DISTINCT l_partkey)                      AS n_parts,
           count(DISTINCT l_suppkey)                      AS n_supps,
           count(DISTINCT (l_returnflag, l_linestatus))   AS n_flag_combos
    FROM lineitem
    """,
    description="Multi-column COUNT DISTINCT (expand-based distinct agg).",
    tags=("agg", "distinct"),
)
def distinct_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_combos"),
    )


@query(
    "order_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(lag(o_orderdate)  OVER w AS DATE) AS prev_date,
           CAST(lead(o_orderdate) OVER w AS DATE) AS next_date,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="lag/lead window functions: per-customer order cadence.",
    tags=("window",),
)
def order_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.lag("o_orderdate").over(w).cast("date").alias("prev_date"),
        F.lead("o_orderdate").over(w).cast("date").alias("next_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lag("o_orderdate").over(w).cast("date")
        ).cast("long").alias("days_since_prev"),
    )


@query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spend
    FROM orders
    """,
    description="Running-sum window frame per customer.",
    tags=("window",),
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )
