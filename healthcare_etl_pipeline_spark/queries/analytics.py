"""General analytics surface: scalar functions, set ops, pivot, JSON,
sessionization (SURVEY.md §7.3).

All queries are expression-only (whole-stage codegen, no Python), each with a
DuckDB oracle. Float outputs are rounded identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.queries.helpers import t
from healthcare_etl_pipeline_spark.queries.registry import query


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                         AS name_upper,
           lower(p_brand)                        AS brand_lower,
           substr(p_type, 1, 4)                  AS type_prefix,
           concat(p_brand, ':', p_type)          AS brand_type,
           length(p_name)                        AS name_len,
           replace(p_name, ' ', '_')             AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           regexp_extract(p_brand, '[0-9]+')     AS brand_num
    FROM part
    """,
    description="Scalar string functions (U-family): upper/lower/substr/"
    "concat/length/replace/lpad/regexp_extract.",
    tags=("functions",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)       AS order_year,
           CAST(month(o_orderdate) AS INTEGER)      AS order_month,
           CAST(dayofweek(o_orderdate) AS INTEGER)  AS order_dow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS due_date,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders
    """,
    description="Date/time functions (U5/U6 family): year/month/dow/trunc/"
    "last_day/date arithmetic.",
    tags=("functions", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1.
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d, 90).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - l_quantity * 1000), 2) AS price_gap,
           CAST(ceil(l_quantity) AS BIGINT)   AS qty_ceil,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
           round(sqrt(l_extendedprice), 6)    AS price_sqrt,
           round(l_tax * l_tax, 8)            AS tax_sq,
           CAST(l_quantity AS BIGINT) % 7     AS qty_mod
    FROM lineitem
    """,
    description="Scalar math functions: abs/ceil/floor/sqrt/multiply/mod "
    "(IEEE-identical across engines; no libm-dependent fns in oracle set).",
    tags=("functions", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000), 2).alias(
            "price_gap"
        ),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.col("l_tax") * F.col("l_tax"), 8).alias("tax_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@query(
    "case_when_bucketing",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           count(*) AS n_customers,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer GROUP BY 1
    """,
    description="CASE WHEN bucketing + aggregation (enum-style routing U7).",
    tags=("functions", "agg"),
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        cust.groupBy(bucket.alias("balance_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


@query(
    "set_ops_customers",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    """,
    description="Set operations: INTERSECT / UNION / EXCEPT chain.",
    tags=("setops",),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    big = orders.filter(F.col("o_totalprice") > 450000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    # SQL set-op precedence: INTERSECT binds tighter; UNION/EXCEPT left-to-right.
    return building.intersect(finished).union(negative).distinct().exceptAll(big.distinct())


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1
    """,
    description="Pivot (wide conditional aggregation) of event counts.",
    tags=("pivot", "agg"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    pivoted = (
        events.withColumn("user_bucket", F.col("user_id") % 100)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
    )
    # pivot yields nulls for empty cells; counts must be 0 to match FILTER.
    return pivoted.select(
        "user_bucket",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type
    """,
    description="JSON extraction (U8) from a string payload column + agg.",
    tags=("json", "agg"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ), sessions AS (
      SELECT *, sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(max(ts) AS TIMESTAMP) AS session_end
    FROM sessions GROUP BY user_id, session_seq
    """,
    description="Sessionization: lag + gap>30min cumulative-sum session ids "
    "(the batch analogue of session_window).",
    tags=("window", "sessionize"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "is_new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "exact_percentiles",
    oracle="""
    WITH hp AS (
      SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ), cp AS (
      SELECT l_returnflag, v,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS hi,
             sum(c) OVER (PARTITION BY l_returnflag) AS n
      FROM hp
    ), price AS (
      SELECT l_returnflag,
             min(CASE WHEN hi >= CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN v END)  AS p50_price,
             min(CASE WHEN hi >= CAST(floor((n - 1) * 0.95) AS BIGINT) + 1 THEN v END) AS p95_price
      FROM cp GROUP BY l_returnflag
    ), hq AS (
      SELECT l_returnflag, l_quantity AS v, count(*) AS c
      FROM lineitem GROUP BY 1, 2
    ), cq AS (
      SELECT l_returnflag, v,
             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS hi,
             sum(c) OVER (PARTITION BY l_returnflag) AS n
      FROM hq
    ), qty AS (
      SELECT l_returnflag,
             min(CASE WHEN hi >= CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 THEN v END) AS p50_qty
      FROM cq GROUP BY l_returnflag
    )
    SELECT price.l_returnflag, p50_price, p95_price, p50_qty
    FROM price JOIN qty ON price.l_returnflag = qty.l_returnflag
    """,
    description="Exact discrete percentiles (value at rank floor((n-1)p)+1, "
    "no interpolation) via the DISTRIBUTED HISTOGRAM identity: the value "
    "at rank k of the sorted multiset is the smallest value whose "
    "cumulative count reaches k, so the plan is one map-side-combined "
    "groupBy(value) histogram plus a window over DISTINCT VALUES only. "
    "The previous rank-selection form row_number()ed ALL rows partitioned "
    "by the 3-value returnflag — three single-reducer sorts of 200 M rows "
    "each at sf100, which exhausted spill disk (the 100x-lens defect the "
    "round-8 digest ladder exposed); the histogram form's per-flag window "
    "is |distinct values|-sized, 4 orders of magnitude smaller here.",
    tags=("agg", "percentile", "window"),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")

    def pct_disc(val: str, ps: dict[str, float]) -> DataFrame:
        hist = li.groupBy("l_returnflag", F.col(val).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        cum = hist.withColumns(
            {
                "hi": F.sum("c").over(
                    Window.partitionBy("l_returnflag")
                    .orderBy("v")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
                "n": F.sum("c").over(Window.partitionBy("l_returnflag")),
            }
        )
        idx = lambda p: F.floor((F.col("n") - 1) * F.lit(p)).cast("long") + 1  # noqa: E731
        return cum.groupBy("l_returnflag").agg(
            *[
                F.min(F.when(F.col("hi") >= idx(p), F.col("v"))).alias(name)
                for name, p in ps.items()
            ]
        )

    price = pct_disc("l_extendedprice", {"p50_price": 0.5, "p95_price": 0.95})
    qty = pct_disc("l_quantity", {"p50_qty": 0.5})
    return price.join(qty, "l_returnflag")


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_tolerance
    FROM events GROUP BY event_type
    """,
    description="approx_count_distinct (HLL, rsd=0.02): scale-path distinct "
    "counting as a value-checkable ACCURACY CONTRACT — the sketch estimate "
    "itself is engine-specific, so the query emits the exact count plus a "
    "within_tolerance boolean (|est-exact|/exact <= 0.05, vs the sketch's "
    "configured 2% rsd) that the oracle mirrors as TRUE. A sketch drifting "
    "past its error bound flips the hash red instead of hiding behind a "
    "rows-only check.",
    tags=("agg", "approx"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("within_tolerance"),
        )
    )
