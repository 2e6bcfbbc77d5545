"""Custom-join query entries: as-of join, range join, salted skew join.

Each demonstrates a join shape Spark has no built-in operator for,
implemented with a scale-conscious composition (operators/joins.py) and
oracle-checked against DuckDB's native forms (ASOF JOIN / BETWEEN join /
plain join — salting must be result-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.operators import joins as J
from healthcare_etl_pipeline_spark.queries.helpers import t
from healthcare_etl_pipeline_spark.queries.registry import query


def _dedup_events(events: DataFrame) -> DataFrame:
    """One event per (user_id, ts): keep max event_id — both engines must
    agree on which row wins an exact-timestamp tie before an as-of join."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    purchases AS (SELECT user_id, ts, event_id FROM ev
                  WHERE event_id IN (SELECT event_id FROM events WHERE event_type = 'purchase')),
    clicks AS (SELECT user_id, ts, event_id AS click_id, value AS click_value FROM ev
               WHERE event_id IN (SELECT event_id FROM events WHERE event_type = 'click'))
    SELECT p.event_id AS purchase_id, p.user_id,
           c.click_id AS last_click_id, round(c.click_value, 4) AS last_click_value
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    description="As-of join: latest click at-or-before each purchase per "
    "user — union-merge implementation (ONE shuffle on the key; no pairwise "
    "blowup) vs DuckDB's native ASOF JOIN.",
    tags=("join", "asof", "custom"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _dedup_events(
        t(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "value", "event_type"
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("last_click_id"),
        F.round("value", 4).alias("last_click_value"),
    )
    joined = J.asof_join(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        payload_cols=["last_click_id", "last_click_value"],
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "last_click_id",
        "last_click_value",
    )


@query(
    "range_join_purchase_window",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id
    FROM events e
    JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 30 MINUTE
     AND e.ts <= p.ts
     AND e.event_id <> p.event_id
    """,
    description="Point-in-interval range join (events in the 30 minutes "
    "leading to each purchase) via bin-bucketed equi-join — avoids the "
    "nested-loop fallback a raw BETWEEN join triggers.",
    tags=("join", "range", "custom"),
)
def range_join_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    # microsecond precision: unix_timestamp() truncates to whole seconds,
    # which silently widens the window by up to 1s at both edges — at
    # sf0.1 one event sits inside the truncated window but outside the
    # true one (sub-second ts fractions are real in this data)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    half_hour_us = 1800 * 1_000_000
    points = ev.select("event_id", "user_id", us.alias("ts_us"))
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (us - half_hour_us).alias("lo"),
        us.alias("hi"),
    )
    joined = J.range_join_binned(
        points,
        windows,
        left_point="ts_us",
        right_lo="lo",
        right_hi="hi",
        bin_width=half_hour_us,
        key="user_id",
        extra_cond=F.col("event_id") != F.col("purchase_id"),
    )
    return joined.select("purchase_id", "event_id")


@query(
    "salted_join_lineitem_supplier",
    oracle="""
    SELECT s.s_nationkey, count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    description="Skew-resistant salted join (8 salt buckets) — result must "
    "be identical to the plain join, checked via the aggregate oracle.",
    tags=("join", "skew", "custom"),
)
def salted_join_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = J.salted_join(li, supp, key="s_suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "skew_join_lineitem_supplier",
    oracle="""
    SELECT s.s_nationkey, count(*) AS n_items,
           round(sum(l.l_extendedprice), 2) AS total_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
    description="SKEW-GATED join (operators/joins.skew_join): the gate is "
    "set by the paired A/B in BENCH_NOTES round 8 — explicit salting wins "
    "2.2x on a measured 40%-hot key at sf100 (AQE's post-shuffle split "
    "measured SLOWER than no handling there), but costs ~1.5x on uniform "
    "keys, so the helper salts when the hot share (caller-known or "
    "sample-probed) clears the threshold and otherwise emits the plain "
    "join under AQE's safety net. This uniform-key instance takes the "
    "plain path. Same oracle as the salted twin: the gate must never "
    "change values.",
    tags=("join", "skew", "aqe"),
)
def skew_join_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = J.skew_join(li, supp, key="s_suppkey", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@query(
    "skew_join_hot_customer",
    oracle="""
    WITH hot AS (
      SELECT CASE WHEN o_orderkey % 5 < 2
                  THEN (SELECT min(c_custkey) FROM customer)
                  ELSE o_custkey END AS c_custkey,
             o_totalprice
      FROM orders
    )
    SELECT c.c_mktsegment, count(*) AS n_orders,
           CAST(round(sum(CAST(h.o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS total_price
    FROM hot h JOIN customer c ON h.c_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    description="The skew gate's HOT path end-to-end: orders deterministic"
    "ally remapped so ~40% of rows land on one customer key (the measured "
    "regime where explicit salting beats AQE skewJoin 2.2x, BENCH_NOTES "
    "round 8), joined via skew_join(probe=True) — the sampled probe "
    "estimates the hot share, clears the 5% threshold, and takes the SALT "
    "path (asserted in tests; memoized per (plan, key) so repeated gate "
    "decisions cost one scan). Money total is the EXACT split-accumulator "
    "sum — ~6M rows funnel into one group at sf10, the regime where "
    "double-sum order drift flips cents. Same-oracle-as-plain-join "
    "contract: the gate must never change values.",
    tags=("join", "skew", "salt"),
)
def skew_join_hot_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.queries.tpch import (
        recombine,
        split_sums,
    )

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    hot_key = cust.agg(F.min("c_custkey")).collect()[0][0]  # 1-row driver val
    orders = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 5 < 2, F.lit(hot_key))
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        "o_totalprice",
    )
    joined = J.skew_join(
        orders, cust, key="c_custkey", salt_buckets=8,
        probe=True, probe_fraction=0.01,
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *split_sums(cents, "total_price"),
        )
        .select("c_mktsegment", "n_orders", recombine("total_price", 2, 2))
    )


@query(
    "bloom_prefilter_join_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(*) AS order_cnt,
           round(sum(o.o_totalprice), 2) AS total_spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey, c.c_name
    """,
    description="Bloom-prefiltered join (explicit runtime filter / sideways "
    "information passing): the BUILDING-segment customers' keys hash into "
    "a 2^16-bit, k=3 Bloom set whose SET positions broadcast to the orders "
    "scan; orders failing any of their 3 bit probes drop BEFORE the join "
    "shuffle. No false negatives by construction and the join removes "
    "false positives, so the result equals the plain join exactly (the "
    "oracle). The pattern pays off when the build side is too large to "
    "broadcast as rows but its fixed-size bit set is not — at 100 TB the "
    "probe-side scan shrinks by the build side's selectivity before any "
    "wide exchange. Spark's AQE injects the same shape when stats allow; "
    "this form is deterministic and engine-portable (portable md5 bits).",
    tags=("join", "bloom", "sketch", "runtime-filter"),
)
def bloom_prefilter_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_prefilter,
    )

    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    bits = bloom_build(cust, "c_custkey")
    lean = bloom_prefilter(orders, "c_custkey", bits)
    return lean.join(cust, "c_custkey").groupBy("c_custkey", "c_name").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )


@query(
    "fuzzy_match_part_names",
    oracle="""
    WITH names AS (
      SELECT trim(lower(p_name)) AS name, count(*) AS n
      FROM part GROUP BY 1
    ), blocked AS (
      SELECT name, n, (string_split(name, ' '))[-1] AS block FROM names
    )
    SELECT a.block, a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           a.n AS n_a, b.n AS n_b
    FROM blocked a JOIN blocked b ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 3
    """,
    description="Entity-resolution fuzzy join (blocking + matching): "
    "distinct normalized part names, blocked on their head noun (last "
    "token), candidate pairs only WITHIN a block, matched by edit "
    "distance <= 3. Matching runs on distinct names carrying occurrence "
    "counts — a name seen a million times costs one comparison — and the "
    "quadratic pair space is sum of squared block sizes, not n^2. "
    "Levenshtein is a JVM built-in on both engines -> exact value oracle.",
    tags=("join", "fuzzy", "entity-resolution", "custom"),
)
def fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").select("p_name")
    return J.fuzzy_blocked_pairs(
        part,
        "p_name",
        block=F.element_at(F.split(F.col("name"), " "), -1),
        max_dist=3,
    )


@query(
    "interval_overlap_orders",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS lo,
             CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
               + o_orderkey % 30 + 1 AS hi
      FROM orders
    )
    SELECT a.o_custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS overlap_days
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.lo <= b.hi AND b.lo <= a.hi
    """,
    description="Interval x interval overlap join (co-active orders per "
    "customer): order activity windows [orderdate, orderdate + priority-"
    "dependent duration] overlap-joined via the binned equi-join — both "
    "sides explode to 16-day bins, the overlap predicate runs only inside "
    "matching (customer, bin) buckets, and the first-overlap-bin guard "
    "dedups without a distinct(). The oracle is the direct range self-join.",
    tags=("join", "interval", "custom"),
)
def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    anchor = F.lit("1995-01-01").cast("timestamp_ntz")
    lo = F.datediff(F.col("o_orderdate").cast("date"), anchor.cast("date")).cast("long")
    iv = orders.select(
        "o_custkey",
        "o_orderkey",
        lo.alias("lo"),
        (lo + F.col("o_orderkey") % 30 + 1).alias("hi"),
    )
    a = iv.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("key_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = iv.select(
        F.col("o_custkey"),
        F.col("o_orderkey").alias("key_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    joined = J.interval_overlap_join(
        a,
        b,
        left_lo="lo_a",
        left_hi="hi_a",
        right_lo="lo_b",
        right_hi="hi_b",
        bin_width=16,
        key="o_custkey",
        extra_cond=F.col("key_a") < F.col("key_b"),
    )
    return joined.select(
        "o_custkey",
        "key_a",
        "key_b",
        (
            F.least(F.col("hi_a"), F.col("hi_b"))
            - F.greatest(F.col("lo_a"), F.col("lo_b"))
            + F.lit(1)
        ).alias("overlap_days"),
    )


@query(
    "entity_clusters_parts",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT trim(lower(p_name)) AS name FROM part GROUP BY 1
    ), blocked AS (
      SELECT name, (string_split(name, ' '))[-1] AS block FROM names
    ), pairs AS (
      SELECT a.name AS id_a, b.name AS id_b
      FROM blocked a JOIN blocked b ON a.block = b.block AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), prop AS (
      SELECT DISTINCT src AS id, src AS label FROM edges
      UNION
      SELECT e.dst AS id, p.label
      FROM prop p JOIN edges e ON p.id = e.src
      WHERE p.label < e.dst
    )
    SELECT id, min(label) AS component FROM prop GROUP BY id
    """,
    description="End-to-end entity resolution: blocked fuzzy match "
    "(head-noun blocking, Levenshtein <= 3 on distinct normalized names) "
    "feeding transitive connected components — records linked through a "
    "CHAIN of near-matches canonicalize to one cluster id even when the "
    "endpoints differ by more than the edit threshold. Min-label "
    "propagation, one shuffle per round; oracle is recursive-CTE "
    "reachability over the identical pair set.",
    tags=("join", "fuzzy", "entity-resolution", "iterative", "custom"),
)
def entity_clusters_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.dedup import connected_components

    part = t(spark, sf_dir, "part").select("p_name")
    pairs = J.fuzzy_blocked_pairs(
        part,
        "p_name",
        block=F.element_at(F.split(F.col("name"), " "), -1),
        max_dist=3,
    ).select(F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b"))
    return connected_components(pairs)


@query(
    "bucketed_join_orders",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    description="Shuffle-free co-located join via bucketed layout: orders "
    "and customer are written bucketBy(8, custkey) + sortBy (one shuffle "
    "paid at WRITE time), then the join plans a SortMergeJoin with ZERO "
    "Exchange on either side — the plan is asserted Exchange-free under "
    "the join before the aggregate. At 100 TB this converts every "
    "recurring join on the bucket key from a full two-sided shuffle into "
    "a local merge; the groupBy after the join is the only exchange left. "
    "Revenue is the EXACT split-accumulator sum (queries/tpch.py:31): the "
    "round-9 full-registry sf10 sweep caught the plain double sum off in "
    "the last cent on 3 M-row segments — summation-order drift, the same "
    "class the rollup/revenue-rank fixes closed in round 8.",
    tags=("join", "bucketed", "layout", "scale"),
)
def bucketed_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from healthcare_etl_pipeline_spark.sources.bucketed import (
        bucketed_join,
        ensure_bucketed_layout,
    )

    # Layout build is memoized per (session, sf_dir): the first invocation
    # pays the one bucketing shuffle, every later one is read-only — the
    # query itself performs zero table writes. Catalog entries and temp
    # dirs are removed atexit (see sources/bucketed.py:_cleanup_layouts).
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    layout = ensure_bucketed_layout(
        spark,
        f"oc_{tag}",
        {
            "orders": lambda: t(spark, sf_dir, "orders").select(
                F.col("o_custkey").alias("custkey"), "o_totalprice"
            ),
            "customer": lambda: t(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("custkey"), "c_mktsegment"
            ),
        },
        bucket_col="custkey",
        buckets=8,
    )

    # MERGE hint models the big-big case (at sf0.01 the dim side is small
    # enough that Catalyst would broadcast it and skip bucketed reads;
    # at 100 TB both sides are fact-sized and SMJ is the only option)
    joined = bucketed_join(
        spark, layout["orders"], layout["customer"], "custkey", hint="merge"
    )
    # the scale contract, enforced: the join runs with NO shuffle exchange
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError("bucketed join planned a shuffle:\n" + plan)
    from healthcare_etl_pipeline_spark.queries.tpch import recombine, split_sums

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *split_sums(cents, "revenue"),
        )
        .select("c_mktsegment", "n_orders", recombine("revenue", 2, 2))
    )


@query(
    "jaro_winkler_part_pairs",
    oracle="""
    WITH names AS (
      SELECT trim(lower(p_name)) AS name, count(*) AS n
      FROM part GROUP BY 1
    ), blocked AS (
      SELECT name, n, (string_split(name, ' '))[-1] AS block FROM names
    )
    SELECT a.block, a.name AS name_a, b.name AS name_b,
           round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_sim,
           a.n AS n_a, b.n AS n_b
    FROM blocked a JOIN blocked b ON a.block = b.block AND a.name < b.name
    WHERE jaro_winkler_similarity(a.name, b.name) >= 0.9
    """,
    description="Jaro-Winkler fuzzy matching (the short-string/name "
    "matcher edit distance is wrong for — shared prefixes beat raw "
    "edits): same blocking-then-matching shape as fuzzy_match_part_names "
    "but scored by an Arrow-batched Jaro-Winkler UDF (p=0.1 prefix boost "
    "above the 0.7 Jaro threshold, the Winkler 1990 parameterization). "
    "Spark lacks the expression; the UDF runs only on the block-confined "
    "candidate pairs, verified BIT-EXACT against DuckDB's native "
    "jaro_winkler_similarity over every blocked pair, so threshold "
    "membership and 6-dp rounding agree between engines by construction.",
    tags=("join", "fuzzy", "entity-resolution", "udf"),
)
def jaro_winkler_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part").select("p_name")
    return J.jaro_winkler_blocked_pairs(
        part,
        "p_name",
        block=F.element_at(F.split(F.col("name"), " "), -1),
        min_sim=0.9,
    )


@query(
    "pit_feature_join_events",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    clicks AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    ),
    views AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
                THEN round(c.value, 4) END AS click_value_30m,
           CASE WHEN v.ts >= p.ts - INTERVAL 30 MINUTE
                THEN round(v.value, 4) END AS view_value_30m
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    description="Point-in-time-correct feature join (feature-store "
    "semantics): each purchase label gets the latest click value and the "
    "latest view value at-or-before the label timestamp, nulled when the "
    "matched feature row is staler than a 30-minute horizon. ONE union + "
    "ONE window pass serves BOTH feature tables (operators/joins.py "
    "pit_join) — K chained as-of joins would shuffle the label table K "
    "times; this costs a single shuffle regardless of the feature count. "
    "Oracle: two chained DuckDB ASOF LEFT JOINs + CASE staleness.",
    tags=("join", "asof", "feature-store", "custom"),
)
def pit_feature_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value", "event_type")

    def one_per_instant(typed: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
        return (
            typed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    purchases = one_per_instant(
        ev.filter(F.col("event_type") == "purchase")
    ).select("user_id", "ts", F.col("event_id").alias("purchase_id"))
    clicks = one_per_instant(ev.filter(F.col("event_type") == "click")).select(
        "user_id", "ts", F.round("value", 4).alias("click_value_30m")
    )
    views = one_per_instant(ev.filter(F.col("event_type") == "view")).select(
        "user_id", "ts", F.round("value", 4).alias("view_value_30m")
    )
    joined = J.pit_join(
        purchases,
        [
            ("click", clicks, "ts", ["click_value_30m"]),
            ("view", views, "ts", ["view_value_30m"]),
        ],
        key="user_id",
        label_time="ts",
        horizon=F.expr("INTERVAL 30 MINUTES"),
    )
    return joined.select("purchase_id", "user_id", "click_value_30m", "view_value_30m")
