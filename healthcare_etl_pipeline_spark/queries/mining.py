"""Round-3 mining/statistics wave: exact-substring duplication profiling,
market-basket pair mining, PMI co-occurrence, Pareto frontier, regression /
hypothesis-test aggregates, multi-source BFS.

All value-oracled. Float columns are rounded to 6 dp on both sides;
integer-exact thresholds use integer arithmetic (``25*df >= 2*n`` instead of
``df >= 0.08*n`` with a DECIMAL-typed literal) wherever a DuckDB DECIMAL
literal could diverge from Spark's double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.text import portable_char_hash_sql
from healthcare_etl_pipeline_spark.queries.helpers import dim_hint, t, td
from healthcare_etl_pipeline_spark.queries.registry import query

_K = 8  # token window for exact-substring profiling

_DUCK_TOKS = """
toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
)
"""


@query(
    "exact_substring_spans_docs",
    oracle=f"""
    WITH {_DUCK_TOKS.strip()}
    , gl AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= {_K} THEN
               list_transform(range(1, len(tk) - {_K} + 2),
                 i -> {portable_char_hash_sql(f"array_to_string(tk[i:i+{_K}-1], ' ')")})
             ELSE [] END AS gs
      FROM toks
    ), ex AS (
      SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS h FROM gl
    ), dup AS (
      SELECT h FROM ex GROUP BY h HAVING count(*) > 1
    ), marked AS (
      SELECT ex.doc_id, ex.pos FROM ex JOIN dup USING (h)
    ), runs AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM marked
    ), rl AS (
      SELECT doc_id, grp, count(*) AS run FROM runs GROUP BY doc_id, grp
    ), pd AS (
      SELECT doc_id, sum(run) AS n_dup, max(run) AS max_run
      FROM rl GROUP BY doc_id
    ), base AS (
      SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams FROM gl
    )
    SELECT base.doc_id, n_grams,
           CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams,
           CASE WHEN n_grams > 0 THEN round(coalesce(n_dup, 0) / n_grams, 6)
                ELSE 0.0 END AS dup_gram_ratio,
           CAST(CASE WHEN max_run IS NULL THEN 0 ELSE max_run + {_K - 1} END AS BIGINT)
             AS max_dup_span
    FROM base LEFT JOIN pd USING (doc_id)
    """,
    description="ExactSubstr-style duplication profile (Lee et al. 2022): "
    "per-doc count of length-8 token windows repeated anywhere in the "
    "corpus + longest contiguous duplicated span, via rolling k-gram "
    "hashing (the shardable substitute for the paper's single-node suffix "
    "array) — shuffle ships 8-byte hashes, span merge is per-doc "
    "gaps-and-islands.",
    tags=("dedup", "llm", "substring"),
)
def exact_substring_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.dedup import duplicated_span_stats

    return duplicated_span_stats(
        td(spark, sf_dir, "documents"), "doc_id", "text", k=_K
    )


@query(
    "frequent_brand_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS b, p_brand AS i
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), n AS (
      SELECT count(DISTINCT b) AS n FROM items
    ), singles AS (
      SELECT i, count(*) AS ni FROM items GROUP BY i
    ), pairs AS (
      SELECT l.i AS item_a, r.i AS item_b, count(*) AS n_baskets
      FROM items l JOIN items r ON l.b = r.b AND l.i < r.i
      GROUP BY 1, 2
      HAVING count(*) >= 50
    )
    SELECT item_a, item_b, n_baskets,
           round(n_baskets / n.n, 6) AS support,
           round((n_baskets * n.n) / (sa.ni * sb.ni), 6) AS lift
    FROM pairs
    CROSS JOIN n
    JOIN singles sa ON sa.i = item_a
    JOIN singles sb ON sb.i = item_b
    """,
    description="Market-basket frequent 2-itemsets (A-priori pair level) "
    "over order baskets of part brands: distinct-items projection bounds "
    "the per-basket self-join, pair counts are one hash-groupBy on a tiny "
    "key domain, marginals broadcast back for support + lift.",
    tags=("mining", "association", "join"),
)
def frequent_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.mining import frequent_pairs

    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    baskets = li.join(
        dim_hint(part, sf_dir, "part"), li["l_partkey"] == part["p_partkey"]
    ).select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
    return frequent_pairs(baskets, "basket", "item", min_baskets=50)


@query(
    "pmi_cooccurrence_docs",
    oracle=f"""
    WITH {_DUCK_TOKS.strip()}
    , dt AS (
      SELECT doc_id AS d, unnest(list_distinct(tk)) AS t FROM toks
    ), nd AS (
      SELECT count(*) AS n FROM documents
    ), vocab AS (
      SELECT t, count(*) AS df FROM dt GROUP BY t
      HAVING count(*) * 25 >= (SELECT n FROM nd) * 2
    ), kept AS (
      SELECT d, t FROM dt WHERE t IN (SELECT t FROM vocab)
    ), pairs AS (
      SELECT l.t AS tok_a, r.t AS tok_b, count(*) AS n_ab
      FROM kept l JOIN kept r ON l.d = r.d AND l.t < r.t
      GROUP BY 1, 2
      HAVING count(*) >= 5
    )
    SELECT tok_a, tok_b, n_ab,
           round(ln((n_ab * nd.n) / (va.df * vb.df)), 6) AS pmi
    FROM pairs
    CROSS JOIN nd
    JOIN vocab va ON va.t = tok_a
    JOIN vocab vb ON vb.t = tok_b
    """,
    description="Pointwise mutual information of token pairs co-occurring "
    "within documents, vocabulary floored at 8% document frequency (a "
    "fraction — scale-invariant — enforced in exact integer arithmetic "
    "25·df ≥ 2·N so both engines agree at the boundary).",
    tags=("mining", "text", "llm"),
)
def pmi_cooccurrence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.mining import pmi_pairs

    return pmi_pairs(
        td(spark, sf_dir, "documents"), "doc_id", "text",
        min_df_ratio=2 / 25, min_cooccur=5,
    )


@query(
    "pareto_frontier_orders",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice, o_orderdate,
             (o_orderdate - DATE '1970-01-01') AS days
      FROM orders
    ), s AS (
      SELECT *, max(days) OVER (
               ORDER BY o_totalprice DESC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best
      FROM o
    )
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM s WHERE best IS NULL OR days > best
    """,
    description="2-D Pareto (skyline) frontier of orders maximizing "
    "(o_totalprice, o_orderdate): rows whose date beats every date ranked "
    "ahead in the price order. Spark side is the two-phase distributed "
    "sweep (range-partition + per-partition running max + broadcast prefix "
    "maxima), NOT a single-partition global window; the oracle is the "
    "classic sorted sweep with the identical total order.",
    tags=("mining", "skyline", "window"),
)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.mining import pareto_frontier

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.datediff("o_orderdate", F.lit("1970-01-01")).alias("days"),
    )
    return pareto_frontier(
        orders, "o_totalprice", "days", "o_orderkey"
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


@query(
    "linear_trend_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(regr_count(o_totalprice, CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)) AS BIGINT) AS n,
           round(regr_slope(o_totalprice, CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)), 6) AS slope,
           round(regr_intercept(o_totalprice, CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)), 6) AS intercept,
           round(regr_r2(o_totalprice, CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS DOUBLE)), 6) AS r2
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="Per-priority least-squares trend of order value over time "
    "(regr_slope/intercept/r2 aggregates — O(1) co-moment state per group, "
    "one map-side-combined pass at any scale).",
    tags=("stats", "regression", "agg"),
)
def linear_trend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    x = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("double")
    y = F.col("o_totalprice")
    return orders.groupBy("o_orderpriority").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


@query(
    "welch_ttest_orders",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp, count(*) AS n,
             avg(o_totalprice) AS mean, var_samp(o_totalprice) AS var
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ), w AS (
      SELECT a.n AS n1, b.n AS n2, a.mean AS m1, b.mean AS m2,
             a.var AS v1, b.var AS v2
      FROM g a JOIN g b ON a.grp = '1-URGENT' AND b.grp = '5-LOW'
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)), 6)
             AS welch_dof
    FROM w
    """,
    description="Welch's unequal-variance t statistic comparing order value "
    "between URGENT and LOW priorities, with the Welch–Satterthwaite "
    "degrees of freedom — two grouped co-moment aggregates, one row out.",
    tags=("stats", "hypothesis-test", "agg"),
)
def welch_ttest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    g = (
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("o_totalprice").alias("mean"),
            F.var_samp("o_totalprice").alias("var"),
        )
    )
    a = g.filter(F.col("o_orderpriority") == "1-URGENT").alias("a")
    b = g.filter(F.col("o_orderpriority") == "5-LOW").alias("b")
    se2 = F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")
    return a.crossJoin(b).select(
        F.col("a.n").cast("long").alias("n1"),
        F.col("b.n").cast("long").alias("n2"),
        F.round(F.col("a.mean") - F.col("b.mean"), 6).alias("mean_diff"),
        F.round((F.col("a.mean") - F.col("b.mean")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("a.var") / F.col("a.n"), 2) / (F.col("a.n") - 1)
                + F.pow(F.col("b.var") / F.col("b.n"), 2) / (F.col("b.n") - 1)
            ),
            6,
        ).alias("welch_dof"),
    )


@query(
    "chi_square_events",
    oracle="""
    WITH obs AS (
      SELECT event_type, (isodow(ts) - 1) AS weekday, count(*) AS observed
      FROM events GROUP BY 1, 2
    ), rt AS (
      SELECT event_type, sum(observed) AS r FROM obs GROUP BY event_type
    ), ct AS (
      SELECT weekday, sum(observed) AS c FROM obs GROUP BY weekday
    ), n AS (
      SELECT sum(observed) AS n FROM obs
    )
    SELECT obs.event_type, obs.weekday, CAST(observed AS BIGINT) AS observed,
           round(rt.r * ct.c / n.n, 6) AS expected,
           round(pow(observed - rt.r * ct.c / n.n, 2) / (rt.r * ct.c / n.n), 6)
             AS contrib
    FROM obs
    JOIN rt USING (event_type)
    JOIN ct USING (weekday)
    CROSS JOIN n
    """,
    description="Chi-squared independence cells for event_type × weekday: "
    "observed vs expected counts and per-cell contribution (sum of contrib "
    "= the chi² statistic; per-cell rows keep the output deterministic — "
    "no cross-engine float-sum ordering in the hashed values).",
    tags=("stats", "hypothesis-test", "agg"),
)
def chi_square_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir, "events")
    obs = events.groupBy(
        "event_type", F.weekday("ts").alias("weekday")
    ).agg(F.count(F.lit(1)).alias("observed"))
    rt = obs.groupBy("event_type").agg(F.sum("observed").alias("r"))
    ct = obs.groupBy("weekday").agg(F.sum("observed").alias("c"))
    n = obs.select(F.sum("observed").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "weekday")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "weekday",
            F.col("observed").cast("long").alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(F.pow(F.col("observed") - exp, 2) / exp, 6).alias("contrib"),
        )
    )


@query(
    "bfs_hops_orders",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION
      SELECT s AS src, c AS dst FROM pairs
    ), h0 AS (
      SELECT min(c_custkey) AS node FROM customer
    ), h1 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN h0 ON e.src = h0.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
    ), h2 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN h1 ON e.src = h1.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
        AND e.dst NOT IN (SELECT node FROM h1)
    ), h3 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN h2 ON e.src = h2.node
      WHERE e.dst NOT IN (SELECT node FROM h0)
        AND e.dst NOT IN (SELECT node FROM h1)
        AND e.dst NOT IN (SELECT node FROM h2)
    )
    SELECT node, 0 AS hops FROM h0
    UNION ALL SELECT node, 1 FROM h1
    UNION ALL SELECT node, 2 FROM h2
    UNION ALL SELECT node, 3 FROM h3
    """,
    description="Multi-source BFS hop distance (≤3) from the lowest-keyed "
    "customer over the bidirectional customer↔supplier order graph: "
    "frontier-expansion joins against a persisted edge list with per-round "
    "localCheckpoint (flat lineage); oracle is the exactly-unrolled "
    "frontier recursion.",
    tags=("graph", "bfs", "iterative", "join"),
)
def bfs_hops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.graph import bfs_hops

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    customer = t(spark, sf_dir, "customer")
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
    seeds = customer.select(F.min("c_custkey").alias("node"))
    out = bfs_hops(edges, seeds, max_hops=3)
    return out.select("node", F.col("hops").cast("int").alias("hops"))


@query(
    "median_mode_orders",
    oracle="""
    WITH dw AS (
      SELECT o_orderpriority, (isodow(o_orderdate) - 1) AS dow
      FROM orders
    ), dc AS (
      SELECT o_orderpriority, dow, count(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY count(*) DESC, dow) AS rk
      FROM dw GROUP BY o_orderpriority, dow
    ), md AS (
      SELECT o_orderpriority, count(*) AS n,
             round(median(o_totalprice), 6) AS median_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT md.o_orderpriority, n, median_price,
           dc.dow AS mode_weekday, dc.cnt AS mode_count
    FROM md JOIN dc ON md.o_orderpriority = dc.o_orderpriority AND dc.rk = 1
    """,
    description="Median + deterministic mode per group: exact interpolated "
    "median of order value, and the modal order weekday computed as "
    "count-then-rank with an explicit (count DESC, value) tiebreak — the "
    "engine-portable mode (builtin mode() tie-breaks arbitrarily). Both "
    "are grouped aggregates with map-side combine; the mode's rank runs "
    "on the tiny (group x 7) count table.",
    tags=("stats", "agg", "median"),
)
def median_mode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders")
    dow = (F.dayofweek("o_orderdate") + 5) % 7  # Mon=0 ... Sun=6 (isodow-1)
    dc = (
        orders.select("o_orderpriority", dow.alias("dow"))
        .groupBy("o_orderpriority", "dow")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("o_orderpriority").orderBy(
                    F.desc("cnt"), F.asc("dow")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    md = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
    )
    return md.join(dc, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "median_price",
        F.col("dow").alias("mode_weekday"),
        F.col("cnt").alias("mode_count"),
    )


@query(
    "moments_lineitem",
    oracle="""
    WITH a AS (
      SELECT l_returnflag, count(*) AS n,
             avg(l_quantity) AS a1,
             avg(l_quantity * l_quantity) AS a2,
             avg(l_quantity * l_quantity * l_quantity) AS a3,
             avg(l_quantity * l_quantity * l_quantity * l_quantity) AS a4
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round(a1, 6) AS mean_qty,
           round((a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1)
                 / pow(a2 - a1 * a1, 1.5), 6) AS skewness,
           round((a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1)
                 / pow(a2 - a1 * a1, 2) - 3, 6) AS ex_kurtosis
    FROM a
    """,
    description="Skewness and excess kurtosis per return flag from raw "
    "power-moment averages (identical algebra in both engines — builtin "
    "skewness/kurtosis differ between engines in sample-correction "
    "convention). Four co-moments of O(1) state per group, one "
    "map-side-combined pass; the standardized ratios cancel summation-"
    "order noise to far below the 6-dp rounding.",
    tags=("stats", "agg", "moments"),
)
def moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    a = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("a1"),
        F.avg(x * x).alias("a2"),
        F.avg(x * x * x).alias("a3"),
        F.avg(x * x * x * x).alias("a4"),
    )
    a1, a2, a3, a4 = F.col("a1"), F.col("a2"), F.col("a3"), F.col("a4")
    m2 = a2 - a1 * a1
    m3 = a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1
    m4 = a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1
    return a.select(
        "l_returnflag",
        "n",
        F.round(a1, 6).alias("mean_qty"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 6).alias("ex_kurtosis"),
    )


@query(
    "attribution_credit_events",
    oracle="""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT event_id AS touch_id, user_id, event_type AS touch_type, ts AS touch_ts
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ), joined AS (
      SELECT conv_id, touch_id, touch_type, touch_ts
      FROM conv JOIN touch USING (user_id)
      WHERE touch_ts < conv_ts AND touch_ts >= conv_ts - INTERVAL 12 HOUR
    ), ranked AS (
      SELECT conv_id, touch_type,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY touch_ts DESC, touch_id) AS last_rk,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY touch_ts ASC, touch_id) AS first_rk,
             count(*) OVER (PARTITION BY conv_id) AS n_touches
      FROM joined
    )
    SELECT touch_type,
           count(*) AS n_touch_events,
           CAST(sum(CASE WHEN last_rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS last_touch_credit,
           CAST(sum(CASE WHEN first_rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS first_touch_credit,
           round(sum(1.0 / n_touches), 6) AS linear_credit
    FROM ranked GROUP BY touch_type
    """,
    description="Multi-touch marketing attribution: for every purchase, "
    "credit the view/click/signup touches of the same user in the "
    "preceding 12 hours under last-touch, first-touch, and linear models. "
    "The conversion-touch join is an equi-join on user_id (per-user fan-out "
    "is bounded by the window) and the rank state is per-conversion — both "
    "shard freely at scale.",
    tags=("events", "attribution", "window"),
)
def attribution_credit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.col("ts").alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click", "signup")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    joined = conv.join(touch, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("touch_ts") >= F.col("conv_ts") - F.expr("INTERVAL 12 HOURS"))
    )
    w_last = Window.partitionBy("conv_id").orderBy(
        F.desc("touch_ts"), F.asc("touch_id")
    )
    w_first = Window.partitionBy("conv_id").orderBy(
        F.asc("touch_ts"), F.asc("touch_id")
    )
    ranked = joined.select(
        "conv_id",
        "touch_type",
        F.row_number().over(w_last).alias("last_rk"),
        F.row_number().over(w_first).alias("first_rk"),
        F.count(F.lit(1)).over(Window.partitionBy("conv_id")).alias("n_touches"),
    )
    return ranked.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_touch_events"),
        F.sum(F.when(F.col("last_rk") == 1, 1).otherwise(0))
        .cast("long")
        .alias("last_touch_credit"),
        F.sum(F.when(F.col("first_rk") == 1, 1).otherwise(0))
        .cast("long")
        .alias("first_touch_credit"),
        F.round(F.sum(1.0 / F.col("n_touches")), 6).alias("linear_credit"),
    )


@query(
    "seqpattern_support_events",
    oracle="""
    WITH tot AS (SELECT count(DISTINCT user_id) AS n_total_users FROM events),
    p1 AS (
      SELECT 'view>click' AS pattern, count(DISTINCT a.user_id) AS n_users
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.ts < b.ts
       AND a.event_type = 'view' AND b.event_type = 'click'
    ),
    p2 AS (
      SELECT 'click>purchase' AS pattern, count(DISTINCT a.user_id) AS n_users
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.ts < b.ts
       AND a.event_type = 'click' AND b.event_type = 'purchase'
    ),
    p3 AS (
      SELECT 'signup>error' AS pattern, count(DISTINCT a.user_id) AS n_users
      FROM events a JOIN events b
        ON a.user_id = b.user_id AND a.ts < b.ts
       AND a.event_type = 'signup' AND b.event_type = 'error'
    ),
    p4 AS (
      SELECT 'view>click>purchase' AS pattern,
             count(DISTINCT a.user_id) AS n_users
      FROM events a
      JOIN events b ON a.user_id = b.user_id AND a.ts < b.ts
      JOIN events c ON b.user_id = c.user_id AND b.ts < c.ts
      WHERE a.event_type = 'view' AND b.event_type = 'click'
        AND c.event_type = 'purchase'
    ),
    p5 AS (
      SELECT 'signup>view>purchase' AS pattern,
             count(DISTINCT a.user_id) AS n_users
      FROM events a
      JOIN events b ON a.user_id = b.user_id AND a.ts < b.ts
      JOIN events c ON b.user_id = c.user_id AND b.ts < c.ts
      WHERE a.event_type = 'signup' AND b.event_type = 'view'
        AND c.event_type = 'purchase'
    ),
    pats AS (
      SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL
      SELECT * FROM p3 UNION ALL SELECT * FROM p4 UNION ALL
      SELECT * FROM p5
    )
    SELECT pattern, n_users, n_total_users,
           round(CAST(n_users AS DOUBLE) / n_total_users, 6) AS support
    FROM pats, tot
    """,
    description="Sequential-pattern support (the PrefixSpan counting "
    "primitive): per pattern [a>b(>c)], the number of users whose event "
    "history contains it as a strictly-time-increasing subsequence, any "
    "gap allowed. Spark evaluates ALL patterns in one pass: one shuffle "
    "groups each user's sorted sequence, then a codegen'd `aggregate` "
    "fold runs the greedy earliest-feasible matcher (exact by the "
    "exchange argument) per pattern, and a single global aggregation + "
    "stack() emits the per-pattern rows — contrast the oracle's "
    "quadratic/cubic self-joins, which is exactly the plan this operator "
    "exists to avoid at scale. Adjacent-transition counting is "
    "markov_event_transitions; this is containment.",
    tags=("mining", "sequence", "prefixspan", "fold"),
)
def seqpattern_support_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.mining import (
        sequential_pattern_support,
    )

    return sequential_pattern_support(
        t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "event_type",
        {
            "view>click": ["view", "click"],
            "click>purchase": ["click", "purchase"],
            "signup>error": ["signup", "error"],
            "view>click>purchase": ["view", "click", "purchase"],
            "signup>view>purchase": ["signup", "view", "purchase"],
        },
    )
