"""Extended analytics surface: unpivot, higher-order array functions,
ordered string aggregation, conditional aggregates, approximate percentiles.

Rounds out the relational function families (SURVEY.md §7.3) beyond the
core tpch/analytics modules; everything here is built-in expressions, so
the plans stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.queries.helpers import t, td
from healthcare_etl_pipeline_spark.queries.registry import query


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, measure, round(val, 2) AS val
    FROM part
    UNPIVOT (val FOR measure IN (p_retailprice, p_size))
    """,
    description="UNPIVOT: melt part's numeric measures into (measure, value) "
    "rows — Spark's unpivot/melt vs DuckDB UNPIVOT.",
    tags=("reshape", "unpivot"),
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.col("p_retailprice").cast("double"),
            F.col("p_size").cast("double"),
        )
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "val")
        .filter(F.col("val").isNotNull())
        .select("p_partkey", "measure", F.round("val", 2).alias("val"))
    )


@query(
    "array_ops_embeddings",
    oracle="""
    SELECT vec_id,
           round(CAST(embedding[1] AS DOUBLE), 6)  AS first_c,
           len(embedding)                          AS dim,
           round(list_reduce(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) AS head_sum,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_c,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
    description="Higher-order array functions over the embedding column: "
    "slice + fold, element access, max, filtered count.",
    tags=("functions", "array", "llm"),
)
def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = td(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    head = F.transform(F.slice(e, 1, 8), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(F.element_at(e, 1).cast("double"), 6).alias("first_c"),
        F.size(e).cast("long").alias("dim"),
        F.round(
            F.aggregate(
                head, F.lit(None).cast("double"),
                lambda acc, x: F.when(acc.isNull(), x).otherwise(acc + x),
            ),
            6,
        ).alias("head_sum"),
        F.round(F.array_max(e).cast("double"), 6).alias("max_c"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "string_agg_nation_customers",
    oracle="""
    SELECT n.n_name,
           string_agg(c.c_name, ',' ORDER BY c.c_name) AS members
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey <= 100
    GROUP BY n.n_name
    """,
    description="Ordered string aggregation (listagg): sorted collect_list + "
    "array_join vs DuckDB string_agg ORDER BY.",
    tags=("agg", "string"),
)
def string_agg_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "members"
            )
        )
    )


@query(
    "conditional_aggregates",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05)            AS n_discounted,
           count(*) FILTER (WHERE l_quantity >= 25)             AS n_bulk,
           round(sum(l_extendedprice) FILTER (WHERE l_tax = 0), 2) AS tax_free_price,
           round(min(l_extendedprice), 2)                       AS min_price,
           round(max(l_extendedprice), 2)                       AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Conditional aggregation (FILTER clauses / count_if) in one "
    "grouped pass.",
    tags=("agg", "conditional"),
)
def conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") == 0, F.col("l_extendedprice"))), 2
        ).alias("tax_free_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@query(
    "approx_percentiles_value",
    oracle="""
    WITH rv AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*)    OVER (PARTITION BY event_type)                 AS n
      FROM events
    )
    SELECT event_type,
           round(max(CASE WHEN rn = CAST(floor((n - 1) * 0.5)  AS BIGINT) + 1 THEN value END), 4) AS p50_exact,
           round(max(CASE WHEN rn = CAST(floor((n - 1) * 0.9)  AS BIGINT) + 1 THEN value END), 4) AS p90_exact,
           round(max(CASE WHEN rn = CAST(floor((n - 1) * 0.99) AS BIGINT) + 1 THEN value END), 4) AS p99_exact,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM rv GROUP BY event_type
    """,
    description="approx_percentile (GK sketch) as a value-checkable ACCURACY "
    "CONTRACT: the exact discrete percentiles (value at rank "
    "floor((n-1)p)+1, same formula both engines — see exact_percentiles) "
    "are hash-matched, and each sketch estimate is asserted within 2% "
    "relative (+0.01 absolute floor) of the value at the sketch's OWN "
    "target rank ceil(p*n) — percentile_approx's convention, one rank "
    "above the hash-matched formula for some (n, p); comparing against "
    "the wrong convention made the boolean flip at sf0.001, where ~200 "
    "rows/group leave huge neighbor gaps in the p99 tail. The oracle "
    "mirrors the boolean as TRUE, so a GK sketch exceeding its error "
    "bound flips the hash red.",
    tags=("agg", "approx", "percentile"),
)
def approx_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select("event_type", "value").withColumns(
        {
            "rn": F.row_number().over(w),
            "n": F.count(F.lit(1)).over(Window.partitionBy("event_type")),
        }
    )
    idx = lambda p: F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1  # noqa: E731
    # percentile_approx's exact-regime target: value at rank ceil(p*n)
    tgt = lambda p: F.ceil(F.col("n") * F.lit(p)).cast("long")  # noqa: E731
    exact = ranked.groupBy("event_type").agg(
        *[
            F.max(F.when(F.col("rn") == idx(p), F.col("value"))).alias(f"p{n}_exact_raw")
            for n, p in (("50", 0.5), ("90", 0.9), ("99", 0.99))
        ],
        *[
            F.max(F.when(F.col("rn") == tgt(p), F.col("value"))).alias(f"p{n}_tgt")
            for n, p in (("50", 0.5), ("90", 0.9), ("99", 0.99))
        ],
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("pcts")
    )
    ok = lambda i, name: (  # noqa: E731
        F.abs(F.element_at("pcts", i) - F.col(f"p{name}_tgt"))
        <= F.lit(0.02) * F.abs(F.col(f"p{name}_tgt")) + F.lit(0.01)
    ).alias(f"p{name}_ok")
    return exact.join(approx, "event_type").select(
        "event_type",
        F.round("p50_exact_raw", 4).alias("p50_exact"),
        F.round("p90_exact_raw", 4).alias("p90_exact"),
        F.round("p99_exact_raw", 4).alias("p99_exact"),
        ok(1, "50"),
        ok(2, "90"),
        ok(3, "99"),
    )


@query(
    "json_corrupt_routing",
    oracle="""
    WITH mangled AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN substring(props, 1, 4)
                  ELSE props END AS props
      FROM events
    ), checked AS (
      -- null out corrupt strings BEFORE json_extract: DuckDB evaluates the
      -- extract eagerly, json_extract(NULL) is the safe path
      SELECT event_id,
             CASE WHEN json_valid(props) THEN props END AS good_props
      FROM mangled
    )
    SELECT event_id,
           json_extract(good_props, '$.k') IS NOT NULL AS is_valid,
           CAST(json_extract(good_props, '$.k') AS BIGINT) AS k
    FROM checked
    """,
    description="JSON source with corrupt-record routing: from_json against "
    "a pinned schema, malformed rows flagged (quarantine side-output), typed "
    "field extraction for the rest — the reference's parse-or-422 wire "
    "contract as an in-plan split. Corruption injected on event_id % 97.",
    tags=("json", "source", "etl"),
)
def json_corrupt_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 97 == 0, F.substring("props", 1, 4)
        ).otherwise(F.col("props")).alias("props"),
    )
    schema = "struct<k: bigint>"
    parsed = F.from_json("props", schema)
    return ev.select(
        "event_id",
        (parsed.isNotNull() & parsed["k"].isNotNull()).alias("is_valid"),
        parsed["k"].alias("k"),
    )


@query(
    "csv_corrupt_routing",
    oracle="""
    SELECT event_id,
           event_id % 89 <> 0 AS is_valid,
           CASE WHEN event_id % 89 <> 0 THEN event_type END AS event_type,
           CASE WHEN event_id % 89 <> 0 THEN value END AS value
    FROM events
    """,
    description="CSV source with corrupt-record routing: each event is "
    "serialized to a delimited line (value mangled to a non-numeric token "
    "on event_id % 89), then parsed back with from_csv against a pinned "
    "DDL schema in PERMISSIVE mode — corrupt lines route to a quarantine "
    "side with the raw text preserved, well-formed lines re-emerge typed "
    "and must round-trip the original values exactly (shortest-repr "
    "double→string→double is lossless). The delimited-feed sibling of "
    "json_corrupt_routing.",
    tags=("csv", "source", "etl"),
)
def csv_corrupt_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.sources.csv_source import (
        parse_csv_column,
    )

    lines = t(spark, sf_dir, "events").select(
        "event_id",
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.col("event_type"),
            F.when(
                F.col("event_id") % 89 == 0,
                F.concat(F.col("value").cast("string"), F.lit("x")),
            ).otherwise(F.col("value").cast("string")),
        ).alias("line"),
    )
    split = parse_csv_column(
        lines, "line", "csv_event_id BIGINT, event_type STRING, value DOUBLE"
    )
    good = split.parsed.select(
        "event_id",
        F.lit(True).alias("is_valid"),
        F.col("parsed.event_type").alias("event_type"),
        F.col("parsed.value").alias("value"),
    )
    bad = split.corrupt.select(
        "event_id",
        F.lit(False).alias("is_valid"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    return good.unionByName(bad)


@query(
    "orc_partitioned_roundtrip",
    oracle="""
    SELECT month(o_orderdate) AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
      AND month(o_orderdate) BETWEEN 4 AND 6
      AND o_totalprice > 1000.0
    GROUP BY month(o_orderdate)
    """,
    description="ORC source/sink interop: 1995 orders are written as a "
    "hive-partitioned ORC dataset (partitionBy month), then read back with "
    "a partition filter AND a row-level predicate. Both scale contracts "
    "are asserted in-query: partition PRUNING (inputFiles shows only the "
    "month=4..6 directories were opened — at 100 TB the other nine months "
    "are never touched) and predicate PUSHDOWN into the ORC reader "
    "(PushedFilters in the executed plan, so row-group stats skip inside "
    "each file). The aggregate must equal the parquet-side oracle — a "
    "wrongly pruned partition or a dropped row flips the hash. Rounds out "
    "the format surface: parquet, JSON, CSV, JSONL export, ORC.",
    tags=("orc", "source", "format", "scale"),
)
def orc_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.queries.helpers import scratch_dir

    root = scratch_dir("orc_rt", sf_dir)
    ord95 = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.month("o_orderdate").cast("int").alias("month"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )
    ord95.write.mode("overwrite").partitionBy("month").orc(root)

    back = spark.read.orc(root).filter(
        F.col("month").between(4, 6) & (F.col("totalprice") > 1000.0)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the month bounds run against the directory index,
    # so only month=4..6 directories are ever opened
    assert "PartitionFilters" in plan and "(month" in plan, plan
    # row-level pushdown reaches the ORC reader (row-group stat skipping)
    assert "PushedFilters" in plan and "GreaterThan(totalprice" in plan, plan
    return back.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("totalprice"), 2).alias("revenue"),
    )


@query(
    "sql_interface_revenue_rank",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             sum(CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 1000000) AS BIGINT)) AS hi,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 1000000) AS lo
      FROM orders
      GROUP BY o_custkey
    ), nation_rev AS (
      SELECT n.n_name, c.c_mktsegment,
             CAST(sum(p.hi) * 1000000 + sum(p.lo) AS DOUBLE) / 100 AS revenue
      FROM per_cust p
      JOIN customer c ON p.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_mktsegment
    )
    SELECT n_name, c_mktsegment, revenue,
           rank() OVER (PARTITION BY c_mktsegment
                        ORDER BY revenue DESC, n_name) AS rev_rank
    FROM nation_rev
    WHERE revenue > 0
    """,
    description="Pure Spark-SQL surface: the same text (CTEs + joins + "
    "window rank) runs through spark.sql over registered views and through "
    "DuckDB — exercising the SQL front end rather than the DataFrame API. "
    "Exactness AND speed are both in the shared text: revenue is the "
    "split-accumulator sum (hi/lo BIGINT cents — the earlier DECIMAL(18,2) "
    "sum was exact but per-row BigDecimal, and the plain double sum was "
    "the cent-drift bug the sf100 rung caught), pre-aggregated per "
    "customer BEFORE the join so the orders->customer shuffle carries one "
    "narrow row per customer, not one per order (3.3x at sf100, values "
    "identical). Recombine casts exact integer cents to DOUBLE and "
    "divides by 100 — IEEE division is correctly rounded, so both engines "
    "produce the identical nearest double (DuckDB's DECIMAL '/' routes "
    "through double and diverges in the last ulp; measured at sf100).",
    tags=("sql", "window", "agg"),
)
def sql_interface_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH per_cust AS (
          SELECT o_custkey,
                 sum(CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 1000000) AS BIGINT)) AS hi,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 1000000) AS lo
          FROM orders
          GROUP BY o_custkey
        ), nation_rev AS (
          SELECT n.n_name, c.c_mktsegment,
                 CAST(sum(p.hi) * 1000000 + sum(p.lo) AS DOUBLE) / 100 AS revenue
          FROM per_cust p
          JOIN customer c ON p.o_custkey = c.c_custkey
          JOIN nation n   ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name, c.c_mktsegment
        )
        SELECT n_name, c_mktsegment, revenue,
               rank() OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue DESC, n_name) AS rev_rank
        FROM nation_rev
        WHERE revenue > 0
        """
    )


@query(
    "funnel_view_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view')     AS first_view,
             min(ts) FILTER (WHERE event_type = 'click')    AS first_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE first_view IS NOT NULL) AS n_viewed,
           count(*) FILTER (WHERE first_view IS NOT NULL
                            AND first_click > first_view) AS n_clicked_after,
           count(*) FILTER (WHERE first_view IS NOT NULL
                            AND first_click > first_view
                            AND first_purchase > first_click) AS n_purchased_after
    FROM firsts
    """,
    description="Event funnel (view -> click -> purchase, strictly ordered "
    "first-occurrence times): one grouped pass + conditional counts — the "
    "classic large-scale product-analytics shape.",
    tags=("events", "funnel", "agg"),
)
def funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & (F.col("first_click") > F.col("first_view"))
    purchased = clicked & (F.col("first_purchase") > F.col("first_click"))
    return firsts.agg(
        F.count_if(viewed).alias("n_viewed"),
        F.count_if(clicked).alias("n_clicked_after"),
        F.count_if(purchased).alias("n_purchased_after"),
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH weeks AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS BIGINT)
               AS week_idx
      FROM events
    ), cohorts AS (
      SELECT user_id, week_idx,
             min(week_idx) OVER (PARTITION BY user_id) AS cohort_week
      FROM weeks
    )
    SELECT cohort_week, week_idx - cohort_week AS week_offset,
           count(DISTINCT user_id) AS n_active
    FROM cohorts
    GROUP BY cohort_week, week_offset
    """,
    description="Retention cohorts: users bucketed by first-seen week "
    "(explicit anchor arithmetic — Spark's window() and DuckDB's "
    "time_bucket anchor 7-day buckets to different origins), distinct-"
    "active count per (cohort, week offset).",
    tags=("events", "retention", "window", "agg"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    week_idx = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("long")
    w = Window.partitionBy("user_id")
    cohorts = ev.select("user_id", week_idx.alias("week_idx")).withColumn(
        "cohort_week", F.min("week_idx").over(w)
    )
    return (
        cohorts.select(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "window_frame_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ntile(4)       OVER w AS spend_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cume,
           round(first_value(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS cheapest,
           round(last_value(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS priciest,
           round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
             AS moving_sum_3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    description="Window-function families beyond rank/lag: ntile quartiles, "
    "percent_rank, cume_dist, unbounded-frame first/last value, and a "
    "3-row moving sum (sum, not avg: both engines fold the frame in order, so the double result is bit-identical; avg accumulates differently in DuckDB).",
    tags=("window", "frames"),
)
def window_frame_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_move = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("spend_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.first("o_totalprice").over(w_full), 2).alias("cheapest"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("priciest"),
        F.round(F.sum("o_totalprice").over(w_move), 2).alias("moving_sum_3"),
    )


@query(
    "keyset_page_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey > 700
    ORDER BY c_custkey
    LIMIT 50
    """,
    description="Keyset pagination (WHERE key > last ORDER BY key LIMIT n): "
    "the scale-path alternative to OFFSET — the predicate pushes to the "
    "parquet scan, so page N+1 costs the same as page 1.",
    tags=("pagination", "etl", "pushdown"),
)
def keyset_page_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.reads import keyset_page

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return keyset_page(cust, "c_custkey", after_key=700, limit=50)


@query(
    "zscore_outlier_events",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 4) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 3.0
    """,
    description="Anomaly detection: per-event-type z-score against grouped "
    "mean/stddev (one aggregate + broadcast join back), flagging |z| > 3.",
    tags=("events", "anomaly", "agg"),
)
def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@query(
    "resample_gapfill_events",
    oracle="""
    WITH observed AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             count(*) AS n_events,
             round(sum(value), 6) AS value_sum,
             round(avg(value), 6) AS value_avg
      FROM events WHERE user_id < 20
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    spans AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM observed GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    )
    SELECT g.user_id, g.bucket,
           coalesce(o.n_events, 0) AS n_events,
           coalesce(o.value_sum, 0.0) AS value_sum,
           last_value(o.value_avg IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value_avg
    FROM grid g LEFT JOIN observed o
      ON g.user_id = o.user_id AND g.bucket = o.bucket
    """,
    description="Hypertable-style resample + gap-fill (time_bucket_gapfill): "
    "hourly buckets per user, dense per-key grid via key-local sequence "
    "explode, zeros on gaps, forward-filled mean via last(ignorenulls) over "
    "a running per-key frame. Key set bounded (user_id < 20) — a dense grid "
    "over all keys x all history is a data-generation job, not a query.",
    tags=("timeseries", "gapfill", "window", "events"),
)
def resample_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.timeseries import resample_ffill

    events = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return resample_ffill(events, "user_id", "ts", "value", step="1 hour")


def _pagerank_oracle(iters: int = 3, d: float = 0.85) -> str:
    ctes = [
        """pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )""",
        "e AS (SELECT c AS src, s AS dst FROM pairs UNION ALL SELECT s, c FROM pairs)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
      SELECT dst AS node, sum(rank / outdeg) AS mass
      FROM r{i - 1} r JOIN e ON r.node = e.src JOIN outdeg USING (src)
      GROUP BY dst
    )"""
        )
        ctes.append(
            f"""r{i} AS (
      SELECT nodes.node, (1 - {d}) / n + {d} * coalesce(mass, 0.0) AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, round(rank, 6) AS rank FROM r{iters}"
    )


@query(
    "pagerank_order_graph",
    oracle=_pagerank_oracle(iters=3),
    description="PageRank (3 synchronous rounds, d=0.85) over the "
    "bidirectional customer↔supplier order graph: per round one join of "
    "ranks to the checkpointed edge list + one map-side-combined mass "
    "aggregation; ranks eagerly checkpointed (flat lineage). Oracle is the "
    "exactly-unrolled recurrence.",
    tags=("graph", "pagerank", "iterative", "join"),
)
def pagerank_order_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.graph import pagerank

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 10_000_000).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "mad_outlier_events",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.event_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.event_id,
           round(d.value, 6) AS value,
           round((d.value - d.med) / (1.4826 * m.mad), 6) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs((d.value - d.med) / (1.4826 * m.mad)) > 3.5
    """,
    description="Robust outlier detection by median absolute deviation "
    "(the z-score variant that survives the outliers it hunts): per-type "
    "exact median, MAD of deviations, flag |robust z| > 3.5. Two "
    "aggregations + two broadcast joins of 5-row stats frames — the scans "
    "dominate, as they should.",
    tags=("anomaly", "mad", "agg"),
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    med = events.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    rz = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > 3.5)
        .select(
            "event_type",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(rz, 6).alias("robust_z"),
        )
    )


@query(
    "user_event_sequences",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id,
           CAST(max(n_events) AS BIGINT) AS n_events,
           string_agg(event_type, '>' ORDER BY rn) AS seq_50
    FROM ranked WHERE rn <= 50
    GROUP BY user_id
    """,
    description="Behavioral-sequence assembly for sequence-model training "
    "data: each user's first 50 events in (ts, event_id) order joined into "
    "an ordered action string. Bounded state: the cap is applied by "
    "windowed row_number BEFORE any list is built (never an unbounded "
    "collect per key), and the total count rides the same window shuffle.",
    tags=("window", "sequence", "events", "llm"),
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    wu = Window.partitionBy("user_id")
    ranked = events.select(
        "user_id",
        "event_type",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("n_events"),
    )
    return (
        ranked.filter(F.col("rn") <= 50)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("seq_50"),
        )
    )


@query(
    "quantile_normalize_orders",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_orderpriority,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n,
             ntile(10) OVER w AS decile
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(CASE WHEN n = 1 THEN 0
                ELSE (2*(rn-1)*1000000 + (n-1)) // (2*(n-1)) END AS DOUBLE)
               / 1000000 AS pr,
           CAST((2*rn*1000000 + n) // (2*n) AS DOUBLE) / 1000000 AS cd,
           CAST(decile AS INTEGER) AS decile
    FROM r
    """,
    description="Quantile normalization of a feature column (the rank-based "
    "scaling step of ML feature prep): percent_rank, cume_dist and decile "
    "of o_totalprice within each order priority — the remaining "
    "distribution window functions. Deterministic total order via the "
    "(value, key) tie-break; one shuffle on the partition key. The 6-dp "
    "rounding of the rank rationals is EXACT integer half-up arithmetic "
    "((2·num·10^6 + den) div (2·den)) in BOTH engines: the round-9 sf10 "
    "digest sweep caught round(cume_dist(),6) flipping the 6th decimal "
    "between engines wherever rn/n lands on a .5e-6 midpoint (Spark "
    "rounds the double's exact expansion half-up via BigDecimal, DuckDB "
    "the scaled double — a last-ulp cross-engine hazard absent at the "
    "gate scales because their group sizes produce no exact midpoints).",
    tags=("window", "percentile", "normalize"),
)
def quantile_normalize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority"))
    # Exact half-up 6-dp rounding of the rank rationals in long arithmetic.
    # Operands stay < 2^53 (2·n·10^6 ≈ 6.4e12 at sf10, ~6.4e15 headroom at
    # 100× that), so the double division inside floor() is exact-integer
    # correct — same reasoning as split_sums (queries/tpch.py:31).
    pr6 = F.when(n == 1, F.lit(0).cast("long")).otherwise(
        F.floor((2 * (rn - 1) * 1_000_000 + (n - 1)) / (2 * (n - 1)))
    )
    cd6 = F.floor((2 * rn * 1_000_000 + n) / (2 * n))
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        (pr6.cast("double") / 1_000_000).alias("pr"),
        (cd6.cast("double") / 1_000_000).alias("cd"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "schema_evolution_union",
    oracle="""
    SELECT c_custkey, c_mktsegment, CAST(NULL AS DOUBLE) AS c_acctbal,
           CAST(NULL AS VARCHAR) AS loyalty_tier
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END
    FROM customer WHERE c_custkey % 2 = 1
    """,
    description="Schema-drift tolerant ingestion: an old-schema batch (no "
    "acctbal, no loyalty_tier) unioned with a new-schema batch via "
    "unionByName(allowMissingColumns) — missing columns NULL-padded by "
    "NAME, not position. The mergeSchema read-side counterpart for "
    "long-lived datasets whose producers evolve independently.",
    tags=("etl", "schema-evolution", "setops"),
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    old_batch = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_mktsegment"
    )
    new_batch = cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double"),
        F.when(F.col("c_acctbal") >= 5000, F.lit("gold"))
        .otherwise(F.lit("std"))
        .alias("loyalty_tier"),
    )
    return old_batch.unionByName(new_batch, allowMissingColumns=True)


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present
    FROM events GROUP BY event_type
    """,
    description="Semi-structured extraction via the VARIANT type (Spark 4): "
    "props parsed ONCE into a binary variant, fields read with typed "
    "variant_get — the shredded-at-parse lakehouse path that replaces "
    "per-access JSON string re-parsing (get_json_object re-tokenizes the "
    "string on every extraction; a variant parses once and serves many "
    "reads). Values match the string-path oracle exactly.",
    tags=("json", "variant", "agg"),
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return events.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("k_sum"),
        F.count("k").alias("k_present"),
    )


@query(
    "time_decay_spend_customers",
    oracle="""
    SELECT o_custkey, count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           round(sum(o_totalprice
                     * pow(2.0, -date_diff('day', o_orderdate, DATE '2002-01-01')
                                 / 365.0)), 4) AS decayed_total
    FROM orders GROUP BY o_custkey
    """,
    description="Exponentially time-decayed spend per customer (1-year "
    "half-life, explicit as-of date — never now()): the recency "
    "weighting feature stores apply to behavioral aggregates. Each "
    "row's weight depends only on its own date, so this is a pure "
    "expression + one map-side-combined aggregation — scales exactly "
    "like a plain sum, no window, no order sensitivity.",
    tags=("timeseries", "decay", "features", "agg"),
)
def time_decay_spend_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.timeseries import (
        time_decay_agg,
    )

    orders = t(spark, sf_dir, "orders")
    return time_decay_agg(
        orders, ["o_custkey"], "o_totalprice", "o_orderdate",
        as_of="2002-01-01", half_life_days=365.0,
    )


@query(
    "markov_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events
    ), cnts AS (
      SELECT from_state, to_state, count(*) AS cnt
      FROM seq WHERE to_state IS NOT NULL
      GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, cnt,
           round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY from_state), 6) AS prob
    FROM cnts
    """,
    description="First-order Markov transition matrix over each user's "
    "time-ordered event sequence (lead over the per-user window, "
    "event_id tiebreak for determinism): the |S|^2-row behavioral model "
    "behind next-event prediction and anomaly scoring. One shuffle on "
    "the user key; output size is vocabulary-bound, not data-bound.",
    tags=("timeseries", "markov", "events", "window"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.timeseries import (
        transition_matrix,
    )

    events = t(spark, sf_dir, "events")
    return transition_matrix(
        events, "user_id", [F.col("ts"), F.col("event_id")], "event_type"
    )


@query(
    "robust_means_lineitem",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ), bounds AS (
      SELECT l_returnflag,
             max(CASE WHEN rn = CAST(floor((n - 1) * 0.05) AS BIGINT) + 1
                      THEN l_extendedprice END) AS lo,
             max(CASE WHEN rn = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1
                      THEN l_extendedprice END) AS hi
      FROM ranked GROUP BY l_returnflag
    )
    SELECT r.l_returnflag,
           round(avg(l_extendedprice), 4) AS mean,
           round(avg(CASE WHEN rn >= CAST(floor((n - 1) * 0.05) AS BIGINT) + 1
                          AND rn <= CAST(floor((n - 1) * 0.95) AS BIGINT) + 1
                          THEN l_extendedprice END), 4) AS trimmed_mean,
           round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS winsorized_mean
    FROM ranked r JOIN bounds b ON r.l_returnflag = b.l_returnflag
    GROUP BY r.l_returnflag
    """,
    description="Robust location estimates per return flag: plain mean, "
    "5% trimmed mean (rank-windowed drop of each tail), and winsorized "
    "mean (tails clamped to the rank-based p05/p95 values — integer rank "
    "selection, no interpolation, deterministic tiebreak). One window "
    "shuffle on the group key + a broadcast of the 3-row bounds; the "
    "outlier-resistant aggregates monitoring pipelines report alongside "
    "MAD. Complements mad_outlier_events (flagging) with estimation.",
    tags=("stats", "robust", "window", "agg"),
)
def robust_means_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wp = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_rn = F.floor((F.col("n") - 1) * 0.05).cast("long") + 1
    hi_rn = F.floor((F.col("n") - 1) * 0.95).cast("long") + 1
    bounds = ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("l_extendedprice"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("l_extendedprice"))).alias("hi"),
    )
    joined = ranked.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    in_core = (F.col("rn") >= lo_rn) & (F.col("rn") <= hi_rn)
    return joined.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean"),
        F.round(
            F.avg(F.when(in_core, F.col("l_extendedprice"))), 4
        ).alias("trimmed_mean"),
        F.round(F.avg(clamped), 4).alias("winsorized_mean"),
    )


@query(
    "triangle_count_copurchase",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                      greatest(x.l_partkey, y.l_partkey) AS b
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    ), deg AS (
      SELECT v, count(*) AS deg FROM (
        SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs
      ) GROUP BY v
    ), oriented AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.a < p.b)
                  THEN p.a ELSE p.b END AS lo,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.a < p.b)
                  THEN p.b ELSE p.a END AS hi
      FROM pairs p JOIN deg da ON da.v = p.a JOIN deg db ON db.v = p.b
    ), wedge_pairs AS (
      SELECT least(o1.hi, o2.hi) AS a, greatest(o1.hi, o2.hi) AS b
      FROM oriented o1 JOIN oriented o2
        ON o1.lo = o2.lo AND o1.hi < o2.hi
    ), tri AS (
      SELECT count(*) AS n_triangles
      FROM wedge_pairs w WHERE EXISTS (
        SELECT 1 FROM pairs p WHERE p.a = w.a AND p.b = w.b
      )
    )
    SELECT (SELECT count(*) FROM deg) AS n_vertices,
           (SELECT count(*) FROM pairs) AS n_edges,
           (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
           n_triangles,
           round(3.0 * n_triangles /
                 (SELECT sum(deg * (deg - 1) / 2) FROM deg), 6) AS clustering
    FROM tri
    """,
    description="Triangle count + global clustering coefficient of the "
    "part co-purchase graph (parts sharing an order) via degree-ordered "
    "orientation (Suri & Vassilvitskii WWW 2011): each triangle is "
    "generated by exactly one wedge at its lowest-(degree,id) vertex, "
    "bounding wedge fanout by out-degree O(sqrt(m)) so the hub vertex "
    "never becomes the last reducer. Edge generation is an in-order "
    "self-join (order size is bounded, so per-order pair fanout is "
    "constant). The third classic graph kernel beside PageRank and "
    "connected components.",
    tags=("graph", "triangles", "join"),
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.graph import triangle_stats

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    x = li.alias("x")
    y = li.alias("y")
    edges = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(
        F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
    )
    return triangle_stats(edges)


@query(
    "rolling_event_features",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 2) AS sum_1h,
           round(max(value) OVER w, 2) AS max_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    description="Time-RANGE window frames — per-user rolling 1-hour event "
    "features (count/sum/max over an interval frame, microsecond-exact "
    "boundaries), the standard online-feature backfill shape. Spark "
    "expresses the interval frame as rangeBetween over unix microseconds; "
    "per-user frames shuffle once on user_id and never cross partitions.",
    tags=("window", "range-frame", "features"),
)
def rolling_event_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        F.round(F.max("value").over(w), 2).alias("max_1h"),
    )


@query(
    "histogram_orders",
    oracle="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    ),
    binned AS (
      SELECT least(CAST(floor((CAST(o_totalprice AS DOUBLE) - CAST(lo AS DOUBLE))
                         * 16.0 / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)))
                   AS INTEGER) + 1, 16) AS bin,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS depth_bin,
             o_totalprice
      FROM orders, bounds
    )
    SELECT bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max,
           count(DISTINCT depth_bin) AS depth_bins_touched
    FROM binned GROUP BY bin
    """,
    description="Histogram construction both ways: equi-WIDTH binning over "
    "the global [min,max] (16 bins via identical IEEE-double arithmetic in "
    "both engines, top edge folded into the last bin) and equi-DEPTH via "
    "ntile(8) with a deterministic tie-break, summarized per width-bin. The profiling shape behind "
    "optimizer statistics and drift monitors; bounds attach as a 1-row "
    "broadcast, binning is a pure projection.",
    tags=("histogram", "profile", "agg"),
)
def histogram_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    wd = Window.orderBy("o_totalprice", "o_orderkey")
    lo = F.col("lo").cast("double")
    hi = F.col("hi").cast("double")
    x = F.col("o_totalprice").cast("double")
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((x - lo) * 16.0 / (hi - lo)).cast("int") + 1, F.lit(16)
        ).alias("bin"),
        F.ntile(8).over(wd).alias("depth_bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("bin_min"),
        F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        F.countDistinct("depth_bin").alias("depth_bins_touched"),
    )


@query(
    "ewma_customer_spend",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             list(CAST(o_totalprice AS DOUBLE)
                  ORDER BY o_orderdate, o_orderkey) AS xs
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           len(xs) AS n_points,
           round(xs[-1], 4) AS last_value,
           floor(list_reduce(xs, (acc, x) -> acc * 0.7 + x * 0.3)
                 * 10000.0) / 10000.0 AS ewma
    FROM seq WHERE len(xs) >= 3
    """,
    description="Per-customer EWMA of order spend (alpha=0.3, ordered by "
    "orderdate with orderkey tiebreak): the recursive smoothing every "
    "monitoring/feature pipeline wants but no fixed-frame window "
    "aggregate can express. Evaluated as an exact JVM-side left fold — "
    "sort_array(collect_list) fixes the order inside the aggregation "
    "buffer, then the `aggregate` higher-order function runs "
    "state = 0.7*state + 0.3*x with state_1 = x_1. One map-side-combined "
    "shuffle on the key; identical fold order on both engines makes the "
    "IEEE double result bit-reproducible (DuckDB mirrors it with "
    "list(... ORDER BY) + list_reduce, whose first element is likewise "
    "the initial accumulator).",
    tags=("timeseries", "ewma", "fold", "features"),
)
def ewma_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.timeseries import ewma_fold

    orders = t(spark, sf_dir, "orders")
    return ewma_fold(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], "o_totalprice",
        alpha=0.3, min_points=3,
    )


@query(
    "kmv_intersection_events",
    oracle="""
    WITH d AS (
      SELECT DISTINCT event_type AS s,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    ka AS (SELECT hv FROM d WHERE s = 'click'    ORDER BY hv LIMIT 256),
    kb AS (SELECT hv FROM d WHERE s = 'purchase' ORDER BY hv LIMIT 256),
    ku AS (
      SELECT hv FROM (
        SELECT DISTINCT hv FROM (
          SELECT hv FROM ka UNION ALL SELECT hv FROM kb
        )
      ) ORDER BY hv LIMIT 256
    ),
    sk AS (
      SELECT (SELECT count(*) FROM ku) AS nu,
             (SELECT max(hv) FROM ku)  AS dk,
             (SELECT count(*) FROM ku
               WHERE hv IN (SELECT hv FROM ka)
                 AND hv IN (SELECT hv FROM kb)) AS ni
    ),
    est AS (
      SELECT nu, ni,
             CASE WHEN nu < 256 THEN CAST(nu AS DOUBLE)
                  ELSE 255.0 / (CAST(dk AS DOUBLE) / 1152921504606846976.0)
             END AS eu,
             CAST(ni AS DOUBLE) / nu AS rho
      FROM sk
    ),
    exact AS (
      SELECT count(*) AS exact_union,
             count(*) FILTER (WHERE has_a AND has_b) AS exact_intersection
      FROM (
        SELECT user_id,
               bool_or(event_type = 'click')    AS has_a,
               bool_or(event_type = 'purchase') AS has_b
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id
      )
    )
    SELECT 256 AS k, nu AS union_sketch_size,
           round(eu, 4) AS est_union,
           exact_union,
           round(rho, 4) AS jaccard_est,
           round(rho * eu, 4) AS est_intersection,
           exact_intersection,
           abs(eu - exact_union) / exact_union <= 0.25
             AS union_within_tol,
           abs(rho * eu - exact_intersection)
             / greatest(exact_intersection, 1) <= 0.35
             AS intersection_within_tol
    FROM est, exact
    """,
    description="KMV (k-minimum-values) sketch set algebra over event-user "
    "sets: the distinct-INTERSECTION estimate HLL cannot give. k=256 "
    "smallest portable-md5 hashes per event type; union sketches merge by "
    "re-taking k smallest (worker-mergeable algebra), (k-1)/frac(d_k) "
    "estimates the union cardinality, and rho = |K(A∪B) ∩ K(A) ∩ K(B)|/k "
    "estimates Jaccard (membership against the component SKETCHES is "
    "provably exact for union-sketch elements). Build side is scale-"
    "bounded: a threshold prefilter (safety*k/approx_distinct) caps the "
    "per-set aggregation state at ~8k longs regardless of input size, and "
    "provably cannot change the k-minimum answer. Exact counts + within-"
    "tolerance booleans form the accuracy contract; every value, estimate "
    "and boolean is reproduced bit-for-bit by the SQL oracle from the "
    "same hashes.",
    tags=("sketch", "kmv", "set-ops", "accuracy-contract"),
)
def kmv_intersection_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.sketch import (
        KMV_SCALE,
        kmv_build,
        kmv_estimate,
        kmv_union,
    )

    K = 256
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    sk = kmv_build(ev, "user_id", "event_type", k=K)
    a = sk.filter(F.col("event_type") == "click").select(
        F.col("kmv").alias("kmv_a")
    )
    b = sk.filter(F.col("event_type") == "purchase").select(
        F.col("kmv").alias("kmv_b")
    )
    merged = a.crossJoin(F.broadcast(b)).select(
        kmv_union(F.col("kmv_a"), F.col("kmv_b"), K).alias("ku"),
        "kmv_a",
        "kmv_b",
    )
    eu = kmv_estimate(F.col("ku"), K)
    ni = F.size(
        F.array_intersect(F.array_intersect(F.col("ku"), F.col("kmv_a")), F.col("kmv_b"))
    )
    rho = ni.cast("double") / F.size("ku")
    sketch_row = merged.select(
        F.lit(K).alias("k"),
        F.size("ku").alias("union_sketch_size"),
        eu.alias("eu"),
        rho.alias("rho"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "click").alias("has_a"),
            F.max(F.col("event_type") == "purchase").alias("has_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.count_if(F.col("has_a") & F.col("has_b")).alias(
                "exact_intersection"
            ),
        )
    )
    return sketch_row.crossJoin(F.broadcast(exact)).select(
        "k",
        "union_sketch_size",
        F.round("eu", 4).alias("est_union"),
        "exact_union",
        F.round("rho", 4).alias("jaccard_est"),
        F.round(F.col("rho") * F.col("eu"), 4).alias("est_intersection"),
        "exact_intersection",
        (
            F.abs(F.col("eu") - F.col("exact_union")) / F.col("exact_union")
            <= 0.25
        ).alias("union_within_tol"),
        (
            F.abs(F.col("rho") * F.col("eu") - F.col("exact_intersection"))
            / F.greatest(F.col("exact_intersection"), F.lit(1))
            <= 0.35
        ).alias("intersection_within_tol"),
    )


@query(
    "rolling_active_users_events",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    )
    SELECT d.day, e.event_type,
           count(*) AS events_w,
           count(DISTINCT e.user_id) AS active_users_w
    FROM days d JOIN events e
      ON CAST(date_trunc('day', e.ts) AS DATE)
         BETWEEN d.day - 6 AND d.day
    GROUP BY d.day, e.event_type
    """,
    description="Rolling 7-day active users and event volume per (day, "
    "event_type) — the trailing DAU/WAU family. Sliding COUNT DISTINCT "
    "has no incremental window frame (distinct is not subtractable), so "
    "each event fans out to the <= 7 report days it affects (bounded "
    "explode, map-side partial agg) and report days are confined to "
    "observed days by a broadcast join against the tiny distinct-days "
    "frame — no global scalar pass, no days x events range join, which "
    "is exactly the plan the oracle runs and the one that dies at "
    "100 TB.",
    tags=("timeseries", "window", "distinct", "activity"),
)
def rolling_active_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.timeseries import (
        rolling_window_activity,
    )

    return rolling_window_activity(
        t(spark, sf_dir, "events"), "ts", "event_type", "user_id",
        window_days=7,
    )


_RECURSIVE_TREE_SQL = """
WITH RECURSIVE walk AS (
  SELECT CAST(1 AS BIGINT) AS partkey, 0 AS depth
  UNION ALL
  SELECT c.p_partkey AS partkey, w.depth + 1 AS depth
  FROM walk w
  JOIN part c ON CAST(floor(c.p_partkey / 2.0) AS BIGINT) = w.partkey
  WHERE c.p_partkey > 1
)
SELECT depth, count(*) AS n_parts, min(partkey) AS min_key, max(partkey) AS max_key
FROM walk GROUP BY depth
"""


@query(
    "sql_interface_recursive_tree",
    oracle=_RECURSIVE_TREE_SQL,
    description="Pure SQL-surface recursion (WITH RECURSIVE, Spark 4's "
    "recursive CTE): walk the implicit binary tree over part keys "
    "(parent = floor(key/2)) from the root and aggregate node counts per "
    "depth — the same text runs through spark.sql and DuckDB. Each "
    "iteration is an EQUI-join of the frontier against the part scan "
    "(the parent expression is computed on the probe side), so every "
    "step is a plain shuffled/broadcast hash join and the iteration "
    "count is log2(|part|) — ~25 joins at 20M parts, not a "
    "row-at-a-time driver loop. The iterative-DataFrame twin of this "
    "shape is bfs_hops_orders; this entry pins the SQL front end.",
    tags=("sql", "recursive", "iterative"),
)
def sql_interface_recursive_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    # Spark's runaway-recursion guard (spark.sql.cteRecursionRowLimit,
    # default 1M cumulative rows) is a SAFETY NET, not a semantic bound —
    # this walk provably visits each part key at most once, so size the
    # guard to the table (found live by the sf10 rung: 2M parts tripped
    # the default). Keeping the guard data-scaled (rather than -1) still
    # catches a genuinely diverging recursion loudly.
    n_parts = spark.table("part").count()
    current = int(spark.conf.get("spark.sql.cteRecursionRowLimit", "1000000"))
    if n_parts + 16 > current:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(n_parts + 16))
    return spark.sql(_RECURSIVE_TREE_SQL)


_LATERAL_TOPK_SQL = """
WITH cs AS (SELECT c_custkey FROM customer)
SELECT cs.c_custkey, l.o_orderkey, l.o_totalprice
FROM cs, LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o
  WHERE o.o_custkey = cs.c_custkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) l
"""


@query(
    "sql_interface_lateral_topk",
    oracle=_LATERAL_TOPK_SQL,
    description="SQL-surface correlated LATERAL subquery with ORDER BY + "
    "LIMIT (top-2 orders per customer), same text in both engines. "
    "Catalyst DECORRELATES the apply: the executed plan is a map-side "
    "partial WindowGroupLimit (per-partition top-k before the shuffle) "
    "+ one hash exchange + broadcast join back to the customer keys — "
    "i.e. the same distributed top-k-per-group shape as "
    "top_orders_per_customer, never a per-customer nested loop. The "
    "deterministic tie-break (price DESC, orderkey ASC) is what makes "
    "the result value-comparable across engines.",
    tags=("sql", "lateral", "window"),
)
def sql_interface_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


_GROUPING_FILTER_SQL = """
SELECT
  coalesce(o_orderpriority, '(all)') AS priority,
  coalesce(o_orderstatus, '(all)') AS status,
  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
  count(*) AS n_orders,
  count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
  CAST(sum(CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 1000000) AS BIGINT)) * 1000000
       + sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) % 1000000) AS DOUBLE) / 100 AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderpriority, o_orderstatus), ())
"""


@query(
    "sql_interface_grouping_filter",
    oracle=_GROUPING_FILTER_SQL,
    description="SQL-surface GROUPING SETS + GROUPING() markers + "
    "aggregate FILTER (WHERE ...) clauses, same text through spark.sql "
    "and DuckDB — pins front-end parity for the multi-granularity "
    "reporting shape (per-priority, per-priority-and-status, grand "
    "total in ONE scan: Spark executes one Expand + hash aggregate, "
    "never three scans). Revenue uses the same split-accumulator "
    "(hi/lo BIGINT cents) recombine-to-double trick as "
    "sql_interface_revenue_rank so the sums are exact and both engines "
    "agree at every grouping granularity.",
    tags=("sql", "agg", "grouping-sets"),
)
def sql_interface_grouping_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_FILTER_SQL)
