"""Extended TPC-H-style coverage over the star-schema testdata.

The testdata is a reduced TPC-H (no partsupp, no commit/receipt dates, no
shipmode/container/phone columns), so queries whose official form needs a
missing column are adapted — the *operator shape* (correlated existence,
scalar-subquery threshold, OR-of-conjunction pushdown, left-join count
distribution, grouping sets) is preserved and noted per query.

Scale notes (100 TB posture) follow tpch.py: dimensions broadcast, facts
never shuffled for dimension joins, single groupBy/agg per query so the
shuffle carries pre-aggregated rows, float aggregates rounded identically
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.queries.helpers import dim_hint, t
from healthcare_etl_pipeline_spark.queries.registry import query


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    description=(
        "TPC-H Q4 (adapted: late = shipped >30d after order, since the "
        "testdata has no commit/receipt dates): EXISTS → left-semi join."
    ),
    tags=("join", "semi", "agg", "tpch"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7: nation-pair trade volume per year (6-way join).",
    tags=("join", "agg", "broadcast", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim_hint(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    """,
    description="TPC-H Q8: national market share within a region (8-way join).",
    tags=("join", "agg", "broadcast", "tpch"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim_hint(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.8 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    description=(
        "TPC-H Q9 (adapted: cost = 0.8*retailprice, since the testdata has "
        "no partsupp/supplycost): profit by supplier nation and year."
    ),
    tags=("join", "agg", "broadcast", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_hint(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    description="TPC-H Q13: order-count-per-customer distribution (left join).",
    tags=("join", "outer", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01'
    """,
    description="TPC-H Q14: promo revenue share in one month.",
    tags=("join", "agg", "broadcast", "tpch"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description=(
        "TPC-H Q15: top supplier by quarterly revenue — scalar-subquery max "
        "expressed as an unpartitioned window over the (tiny) aggregated frame."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    # The window is unpartitioned but runs over the per-supplier aggregate
    # (|suppliers| rows), not the fact table — safe at any scale factor.
    best = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(best, supp.s_suppkey == best.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    description=(
        "TPC-H Q16 (adapted: lineitem stands in for the absent partsupp): "
        "distinct supplier count per brand/type/size."
    ),
    tags=("join", "agg", "distinct", "tpch"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) th ON th.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND l.l_quantity < th.qty_threshold
    """,
    description=(
        "TPC-H Q17: correlated avg-quantity threshold decorrelated into a "
        "per-part aggregate join (the plan Catalyst would produce anyway)."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    thresholds = li.groupBy(F.col("l_partkey").alias("th_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
        .join(thresholds, li.l_partkey == F.col("th_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    description="TPC-H Q18: large-volume orders via IN-subquery → semi-join.",
    tags=("join", "semi", "agg", "tpch"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    # one lineitem scan + ONE aggregation: the HAVING sum and the output
    # sum are the same per-order quantity total (o_orderkey determines
    # every other group column), so computing it once both filters and
    # carries sum_qty — the naive semi-join form rescans lineitem and
    # re-aggregates 6M rows just to recompute a number it already had
    # (sf1: 5.9s -> 2.2s). No broadcast hint: ~20% of orders clear the
    # threshold (293k at sf1), so the join side scales with the fact
    # table — AQE broadcasts it locally and must be free to sort-merge
    # at cluster scale.
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("sum_qty"),
        )
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    description=(
        "TPC-H Q19 (adapted: brand+size OR-blocks; no container/shipmode in "
        "testdata): disjunctive pushdown through a broadcast join."
    ),
    tags=("join", "filter", "broadcast", "tpch"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(dim_hint(part, sf_dir, "part"), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q22_sales_opportunity",
    oracle="""
    SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT c.c_nationkey % 10 AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    )
    GROUP BY cntrycode
    """,
    description=(
        "TPC-H Q22 (adapted: country code = nationkey % 10, idle = no order "
        "since 2000-06-01 — every synthetic customer has some order): "
        "above-average idle customers via scalar-avg crossjoin + anti-join."
    ),
    tags=("join", "anti", "subquery", "agg", "tpch"),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp_ntz")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            (F.col("c_nationkey") % 10).alias("cntrycode"), F.col("c_acctbal")
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_name), (o_orderpriority), (n_name, o_orderpriority))
    """,
    description="GROUPING SETS aggregation: by nation, by priority, and "
    "both. Money sums are EXACT via the split-accumulator kernel "
    "(queries/tpch.py:31) — the round-9 full-registry sf10 sweep caught "
    "the plain double sum off in the last cent on the single-column "
    "subtotal rows (~600k rows each), the same summation-order drift "
    "class as the round-8 rollup fix; oracle sums in DECIMAL.",
    tags=("agg", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.queries.tpch import recombine, split_sums

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.groupingSets(
            [["n_name"], ["o_orderpriority"], ["n_name", "o_orderpriority"]],
            "n_name",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *split_sums(cents, "total_price"),
        )
        .select(
            "n_name", "o_orderpriority", "n_orders", recombine("total_price", 2, 2)
        )
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           count(*) AS late_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS late_value
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    description=(
        "TPC-H Q12 (adapted: no shipmode column — classes by priority; "
        "late = shipped >60d after order): fact-fact join + CASE grouping. "
        "Money sums are EXACT via the split-accumulator kernel "
        "(queries/tpch.py:31) — the round-9 full-registry sf10 sweep "
        "caught the plain double sum off in the last cent over the "
        "~30M-row groups (summation-order drift, same class as the "
        "rollup/revenue-rank/grouping-sets fixes); oracle sums in DECIMAL."
    ),
    tags=("join", "agg", "tpch"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.queries.tpch import recombine, split_sums

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    priority_class = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high"
    ).otherwise("low")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        joined.groupBy(priority_class.alias("priority_class"))
        .agg(
            F.count(F.lit(1)).alias("late_items"),
            *split_sums(cents, "late_value"),
        )
        .select("priority_class", "late_items", recombine("late_value", 2, 2))
    )


@query(
    "q21_slowest_supplier",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             max(l_shipdate) AS last_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s.s_name, count(DISTINCT l.l_orderkey) AS numwait
    FROM lineitem l
    JOIN per_order p ON l.l_orderkey = p.l_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    WHERE p.n_supp > 1 AND l.l_shipdate = p.last_ship
    GROUP BY s.s_name
    """,
    description=(
        "TPC-H Q21 (adapted: no commit/receipt dates — 'kept waiting' = was "
        "the last to ship in a multi-supplier order): per-order aggregate "
        "joined back to the fact."
    ),
    tags=("join", "agg", "window", "tpch"),
)
def q21_slowest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    return (
        li.join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("l_shipdate") == F.col("last_ship")))
        .join(dim_hint(supp, sf_dir, "supplier"), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


# The testdata has no partsupp table; q2/q11/q20 are adapted over the
# DERIVED part-supplier relation: distinct (partkey, suppkey) pairs seen in
# lineitem, with supplycost := min unit price (extendedprice/quantity)
# that supplier ever charged for that part. Deterministic, derivable in
# both engines, and preserves the queries' operator shapes.

_DUCK_PARTSUPP = """
    partsupp AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost,
             sum(l_quantity) AS ps_volume
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    )
"""


def _spark_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_volume"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH {_DUCK_PARTSUPP.strip()}
    SELECT p.p_partkey, p.p_brand,
           CAST(round(CAST(ps.ps_supplycost AS DECIMAL(18,8)), 4) AS DOUBLE)
               AS best_cost,
           s.s_name, n.n_name
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s  ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_size = 10
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'ASIA'
      )
    """,
    description=(
        "TPC-H Q2 (adapted: partsupp derived from lineitem, supplycost = min "
        "unit price): cheapest in-region supplier per size-10 part — "
        "correlated-min decorrelated into a window over the region-filtered "
        "part-supplier frame."
    ),
    tags=("join", "subquery", "broadcast", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _spark_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    in_region = (
        ps.join(dim_hint(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    best = in_region.withColumn(
        "min_cost", F.min("ps_supplycost").over(w)
    ).filter(F.col("ps_supplycost") == F.col("min_cost"))
    return (
        best.join(dim_hint(part, sf_dir, "part"), F.col("ps_partkey") == part.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            # round via DECIMAL(18,8): double round() disagrees between
            # engines when the quotient's shortest repr sits on a .5
            # boundary at the 4th decimal (e.g. 478.40074999999996); the
            # 8-digit decimal cast collapses the wobble identically on
            # both sides before the visible rounding
            F.round(F.col("ps_supplycost").cast("decimal(18,8)"), 4)
            .cast("double")
            .alias("best_cost"),
            "s_name",
            "n_name",
        )
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH {_DUCK_PARTSUPP.strip()},
    value_by_part AS (
      SELECT ps.ps_partkey,
             sum(ps.ps_supplycost * ps.ps_volume) AS part_value
      FROM partsupp ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 3
      GROUP BY ps.ps_partkey
    )
    SELECT ps_partkey, round(part_value, 2) AS part_value
    FROM value_by_part
    WHERE part_value > (SELECT 0.01 * sum(part_value) FROM value_by_part)
    """,
    description=(
        "TPC-H Q11 (adapted partsupp): parts whose stock value in one "
        "nation exceeds 1% of the national total — global-scalar threshold "
        "via crossjoined aggregate."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _spark_partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    value_by_part = (
        ps.join(dim_hint(supp, sf_dir, "supplier"), ps.ps_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_volume")).alias("part_value"))
    )
    total = value_by_part.agg(
        (0.01 * F.sum("part_value")).alias("threshold")
    )
    return (
        value_by_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", F.round("part_value", 2).alias("part_value"))
    )


@query(
    "q20_excess_volume_suppliers",
    oracle=f"""
    WITH {_DUCK_PARTSUPP.strip()},
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_1997
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM partsupp ps
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_suppkey = s.s_suppkey
        AND sh.qty_1997 > 0.5 * ps.ps_volume
    )
    """,
    description=(
        "TPC-H Q20 (adapted partsupp): suppliers who shipped more than half "
        "a part's lifetime volume in 1997 — EXISTS over a derived aggregate "
        "join, as a semi-join."
    ),
    tags=("join", "semi", "agg", "tpch"),
)
def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = _spark_partsupp(spark, sf_dir)
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty_1997")
    )
    hot = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("qty_1997") > 0.5 * F.col("ps_volume"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(hot, supp.s_suppkey == hot.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
