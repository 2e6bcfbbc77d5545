"""Warehouse-maintenance queries: SCD2 history merge, latest-wins upsert.

Extends the reference's uniqueness-checked sink semantics
(app/etl/load.py conflict handling) to versioned targets — the table
maintenance a production deployment of these pipelines runs nightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.merge import scd2_merge, upsert_latest
from healthcare_etl_pipeline_spark.operators.profile import profile_table
from healthcare_etl_pipeline_spark.operators.sampling import (
    hash_bucket_sql,
    stratified_hash_sample,
)
from healthcare_etl_pipeline_spark.queries.helpers import t
from healthcare_etl_pipeline_spark.queries.registry import query

_HIST_COLS = (
    "c_custkey",
    "c_acctbal",
    "c_mktsegment",
    "effective_from",
    "effective_to",
    "is_current",
)


def _synth_history(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Deterministic SCD2 fixture from `customer` (mirrored in the oracle):
    v1 open rows for every customer, a pre-closed older version for
    c_custkey%7==0, and an update batch where %3==0 changes acctbal (+100)
    and %5==0 (not %3) redelivers identical values (idempotence probe)."""
    base = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    open_v1 = base.selectExpr(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        "TIMESTAMP '2024-01-01' AS effective_from",
        "CAST(NULL AS TIMESTAMP) AS effective_to",
        "TRUE AS is_current",
    )
    closed_old = base.filter("c_custkey % 7 = 0").selectExpr(
        "c_custkey",
        "c_acctbal - 50 AS c_acctbal",
        "c_mktsegment",
        "TIMESTAMP '2023-01-01' AS effective_from",
        "TIMESTAMP '2024-01-01' AS effective_to",
        "FALSE AS is_current",
    )
    history = closed_old.unionByName(open_v1)
    updates = (
        base.filter("c_custkey % 3 = 0")
        .selectExpr("c_custkey", "c_acctbal + 100 AS c_acctbal", "c_mktsegment")
        .unionByName(
            base.filter("c_custkey % 5 = 0 AND c_custkey % 3 <> 0").select(
                "c_custkey", "c_acctbal", "c_mktsegment"
            )
        )
    )
    return history, updates


@query(
    "scd2_merge_customers",
    oracle="""
    WITH base AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
    SELECT c_custkey, c_acctbal - 50 AS c_acctbal, c_mktsegment,
           TIMESTAMP '2023-01-01' AS effective_from,
           TIMESTAMP '2024-01-01' AS effective_to,
           FALSE AS is_current
    FROM base WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_acctbal, c_mktsegment,
           TIMESTAMP '2024-01-01',
           CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '2024-06-01' END,
           c_custkey % 3 <> 0
    FROM base
    UNION ALL
    SELECT c_custkey, c_acctbal + 100, c_mktsegment,
           TIMESTAMP '2024-06-01', NULL, TRUE
    FROM base WHERE c_custkey % 3 = 0
    """,
    description="SCD Type-2 merge: versioned customer history + update "
    "batch → closed-out changed versions, appended new versions, untouched "
    "closed history, idempotent no-op redeliveries. One null-safe equi-join "
    "on the business key; change detection is an expression (<=>), no "
    "windows over history. Oracle recomputes the post-merge table.",
    tags=("merge", "scd2", "maintenance"),
)
def scd2_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    history, updates = _synth_history(spark, sf_dir)
    merged = scd2_merge(
        history,
        updates,
        key_cols=["c_custkey"],
        compare_cols=["c_acctbal", "c_mktsegment"],
        batch_ts=F.lit("2024-06-01").cast("timestamp"),
    )
    return merged.select(*_HIST_COLS)


@query(
    "upsert_latest_customers",
    oracle="""
    WITH tagged AS (
      SELECT c_custkey, c_acctbal, c_mktsegment,
             TIMESTAMP '2024-01-01' AS updated_at, 0 AS src
      FROM customer
      UNION ALL
      SELECT c_custkey, c_acctbal + 100, c_mktsegment,
             TIMESTAMP '2024-06-01', 1
      FROM customer WHERE c_custkey % 3 = 0
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY updated_at DESC, src DESC) AS rn
      FROM tagged
    )
    SELECT c_custkey, c_acctbal, c_mktsegment, updated_at
    FROM ranked WHERE rn = 1
    """,
    description="Latest-wins upsert: one CURRENT row per key, newest "
    "timestamp wins (ties: the update). One shuffle on the key.",
    tags=("merge", "upsert", "maintenance"),
)
def upsert_latest_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    current = base.selectExpr(
        "c_custkey", "c_acctbal", "c_mktsegment",
        "TIMESTAMP '2024-01-01' AS updated_at",
    )
    updates = base.filter("c_custkey % 3 = 0").selectExpr(
        "c_custkey", "c_acctbal + 100 AS c_acctbal", "c_mktsegment",
        "TIMESTAMP '2024-06-01' AS updated_at",
    )
    return upsert_latest(
        current, updates, key_cols=["c_custkey"], ts_col="updated_at"
    )


_PROFILE_NUMERIC = ("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PROFILE_STRING = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUMERIC:
        parts.append(
            f"SELECT '{c}' AS column_name, count(*) AS n_rows, "
            f"count(*) - count({c}) AS n_nulls, count(DISTINCT {c}) AS n_distinct, "
            f"round(CAST(min({c}) AS DOUBLE), 6) AS min_value, "
            f"round(CAST(max({c}) AS DOUBLE), 6) AS max_value FROM lineitem"
        )
    for c in _PROFILE_STRING:
        parts.append(
            f"SELECT '{c}', count(*), count(*) - count({c}), count(DISTINCT {c}), "
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)


@query(
    "profile_lineitem",
    oracle=_profile_oracle(),
    description="One-pass per-column statistics census (the ANALYZE-TABLE "
    "counterpart for data-quality monitoring): null counts, exact distinct "
    "counts, numeric min/max — one agg over one scan, stack-unpivoted to a "
    "row per column. exact_distinct=False swaps in HLL for 100 TB.",
    tags=("profile", "maintenance"),
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return profile_table(li, list(_PROFILE_NUMERIC), list(_PROFILE_STRING))


@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {hash_bucket_sql("doc_id", salt=3)} <
          CASE WHEN lang = 'en' THEN 5000 ELSE 1000 END
    """,
    description="Deterministic per-stratum sampling for corpus re-balancing "
    "(keep 50% of dominant-language docs, 10% of the rest): zero-shuffle "
    "bucket filter, nested subsets across fraction changes.",
    tags=("sampling", "stratified", "llm"),
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_hash_sample(
        docs, "doc_id", "lang",
        fractions={"en": 0.50}, default_fraction=0.10, salt=3,
    )


_PSI_DUCK_SIDE = """
  {name}b AS (
    SELECT least(CAST(floor(o_totalprice / 50000) AS INTEGER), 6) AS bin,
           count(*) AS n_{name}
    FROM orders WHERE year(o_orderdate) = {year}
    GROUP BY 1
  ),
  {name}t AS (SELECT sum(n_{name}) AS t_{name} FROM {name}b),
  {name}p AS (
    SELECT bin, n_{name}, n_{name} / t_{name} AS p_{name}
    FROM {name}b, {name}t
  )
"""


@query(
    "drift_psi_orders",
    oracle=(
        "WITH "
        + _PSI_DUCK_SIDE.format(name="ref", year=1995).strip()
        + ", "
        + _PSI_DUCK_SIDE.format(name="cur", year=1997).strip()
        + """
    SELECT coalesce(r.bin, c.bin) AS bin,
           coalesce(r.n_ref, 0) AS n_ref,
           coalesce(c.n_cur, 0) AS n_cur,
           round(greatest(coalesce(r.p_ref, 0.0), 1e-6), 6) AS p_ref,
           round(greatest(coalesce(c.p_cur, 0.0), 1e-6), 6) AS p_cur,
           round((greatest(coalesce(c.p_cur, 0.0), 1e-6)
                  - greatest(coalesce(r.p_ref, 0.0), 1e-6))
                 * ln(greatest(coalesce(c.p_cur, 0.0), 1e-6)
                      / greatest(coalesce(r.p_ref, 0.0), 1e-6)), 6) AS psi_term
    FROM refp r FULL OUTER JOIN curp c ON r.bin = c.bin
    """
    ),
    description="Population Stability Index drift monitor: o_totalprice "
    "distribution of 1995 orders (reference) vs 1997 orders (current) over "
    "fixed 50k-wide bins (last open-ended). Two map-side-combined "
    "aggregations to 7 partial counts each, broadcast-joined; probabilities "
    "floored at 1e-6 so empty bins stay finite. PSI > 0.25 = action.",
    tags=("profile", "drift", "maintenance"),
)
def drift_psi_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.profile import psi_drift

    orders = t(spark, sf_dir, "orders")
    ref = orders.filter(F.year("o_orderdate") == 1995)
    cur = orders.filter(F.year("o_orderdate") == 1997)
    return psi_drift(ref, cur, "o_totalprice", bin_width=50_000, n_bins=7)


from healthcare_etl_pipeline_spark.operators.layout import zvalue_sql as _zsql

_Z_Y = "(CAST(floor(epoch(ts) / 60) AS BIGINT) & 65535)"
_Z_ORACLE = f"""
    WITH zed AS (
      SELECT (user_id & 65535) AS x,
             {_Z_Y} AS y,
             ({_zsql("(user_id & 65535)", _Z_Y)} >> 22) AS zbucket
      FROM events
    )
    SELECT zbucket, count(*) AS n,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM zed GROUP BY zbucket
"""


@query(
    "zorder_layout_events",
    oracle=_Z_ORACLE,
    description="Z-order (Morton) layout assignment for two-column data "
    "skipping: interleave the low 16 bits of user_id and minute-of-epoch "
    "into a z-value (pure 32-term codegen expression), bucket by the high "
    "bits (the file assignment an OPTIMIZE ZORDER re-layout would use), "
    "and report per-bucket min/max of BOTH dimensions — the footer stats "
    "that make scans filtered on either column skip most buckets.",
    tags=("maintenance", "layout", "zorder"),
)
def zorder_layout_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.layout import zorder_bucket_stats

    events = t(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(65535)
    # ts is TIMESTAMP_NTZ (no direct cast to long); with the session pinned
    # to UTC the TIMESTAMP reinterpretation is the same wall-clock instant
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    y = F.floor(epoch_s / 60).cast("long").bitwiseAND(65535)
    return zorder_bucket_stats(events, x, y, bits=16, bucket_shift=22)


@query(
    "snapshot_diff_customers",
    oracle="""
    WITH old AS (
      SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
      WHERE c_custkey % 11 <> 0
    ), new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
    )
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal
    FROM old o FULL OUTER JOIN new n USING (c_custkey)
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
    """,
    description="CDC by snapshot comparison: classify every key as "
    "insert / delete / update between two table versions (old = all but "
    "keys %11=0, new = all but %13=0 with %5=0 balances bumped — "
    "versions derived in-plan for determinism). ONE full-outer equi-join "
    "on the key with null-safe <=> change detection — the single-shuffle "
    "shape a lakehouse changelog scan (Delta CDF, Iceberg "
    "changelog-scan) materializes; unchanged rows never leave the join.",
    tags=("merge", "cdc", "diff", "maintenance"),
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.merge import snapshot_diff

    base = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    old = base.filter("c_custkey % 11 <> 0")
    new = base.filter("c_custkey % 13 <> 0").selectExpr(
        "c_custkey",
        "CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100 "
        "ELSE c_acctbal END AS c_acctbal",
        "c_mktsegment",
    )
    return snapshot_diff(
        old, new, keys=["c_custkey"], compare_cols=["c_acctbal"]
    ).select(
        "c_custkey", "change_type", "old_c_acctbal", "new_c_acctbal"
    )


@query(
    "drift_ks_orders",
    oracle="""
    WITH ref AS (
      SELECT o_orderpriority,
             least(CAST(floor(o_totalprice / 25000.0) AS INT), 19) AS bin,
             count(*) AS n_ref
      FROM orders WHERE year(o_orderdate) < 1998
      GROUP BY 1, 2
    ), cur AS (
      SELECT o_orderpriority,
             least(CAST(floor(o_totalprice / 25000.0) AS INT), 19) AS bin,
             count(*) AS n_cur
      FROM orders WHERE year(o_orderdate) >= 1998
      GROUP BY 1, 2
    ), both_sides AS (
      SELECT coalesce(r.o_orderpriority, c.o_orderpriority) AS o_orderpriority,
             coalesce(r.bin, c.bin) AS bin,
             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
      FROM ref r FULL OUTER JOIN cur c
        ON r.o_orderpriority = c.o_orderpriority AND r.bin = c.bin
    ), cdf AS (
      SELECT o_orderpriority,
             sum(n_ref) OVER w * 1.0 / sum(n_ref) OVER wp AS cdf_ref,
             sum(n_cur) OVER w * 1.0 / sum(n_cur) OVER wp AS cdf_cur,
             sum(n_ref) OVER wp AS n_ref, sum(n_cur) OVER wp AS n_cur
      FROM both_sides
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY bin
                   ROWS UNBOUNDED PRECEDING),
             wp AS (PARTITION BY o_orderpriority)
    )
    SELECT o_orderpriority, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           round(max(abs(cdf_ref - cdf_cur)), 6) AS ks_stat
    FROM cdf GROUP BY o_orderpriority, n_ref, n_cur
    """,
    description="Two-sample Kolmogorov-Smirnov drift per order priority "
    "(pre-1998 vs 1998+ total-price distributions) over 20 fixed "
    "equal-width bins: each side reduces to n_bins partial counts "
    "map-side (an exact raw-value KS needs a global sort of the pooled "
    "samples — one ordered partition, unusable at 100 TB); the CDF "
    "window runs over bins, not data. Complements PSI: KS reads the "
    "worst single point of divergence, PSI the total.",
    tags=("drift", "ks", "profile", "maintenance"),
)
def drift_ks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.profile import ks_drift

    orders = t(spark, sf_dir, "orders")
    ref = orders.filter(F.year("o_orderdate") < 1998)
    cur = orders.filter(F.year("o_orderdate") >= 1998)
    return ks_drift(
        ref, cur, "o_totalprice", ["o_orderpriority"],
        bin_width=25_000.0, n_bins=20,
    )


@query(
    "dq_checks_orders",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders)
    SELECT 'custkey_not_null' AS check_name, n_rows,
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_violations,
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0 AS passed
    FROM n
    UNION ALL
    SELECT 'price_positive', n_rows,
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0),
           (SELECT count(*) FROM orders WHERE o_totalprice <= 0) = 0 FROM n
    UNION ALL
    SELECT 'price_under_300k', n_rows,
           (SELECT count(*) FROM orders WHERE o_totalprice > 300000),
           (SELECT count(*) FROM orders WHERE o_totalprice > 300000) = 0 FROM n
    UNION ALL
    SELECT 'status_in_enum', n_rows,
           (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')),
           (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P')) = 0 FROM n
    UNION ALL
    SELECT 'orderkey_unique', n_rows,
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders),
           (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0 FROM n
    UNION ALL
    SELECT 'custkey_fk_customer', n_rows,
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0 FROM n
    """,
    description="Data-quality expectations audit over orders (the "
    "Deequ/Great-Expectations operator class, dataset-level sibling of "
    "the row-level collect-ALL-errors validator): four predicate checks "
    "folded into ONE conditional-aggregation scan, PK uniqueness as "
    "count-minus-distinct, FK integrity to customer as a broadcast "
    "anti-join. price_under_300k is deliberately violated — the audit "
    "REPORTS, rows are never dropped. One row per check.",
    tags=("dq", "audit", "maintenance"),
)
def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.profile import dq_checks

    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return dq_checks(
        orders,
        [
            ("custkey_not_null", F.col("o_custkey").isNull()),
            ("price_positive", F.col("o_totalprice") <= 0),
            ("price_under_300k", F.col("o_totalprice") > 300_000),
            ("status_in_enum", ~F.col("o_orderstatus").isin("O", "F", "P")),
        ],
        unique_checks=[("orderkey_unique", ["o_orderkey"])],
        fk_checks=[
            ("custkey_fk_customer", ["o_custkey"], customer, ["c_custkey"])
        ],
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "corr_matrix_lineitem",
    oracle="""
    SELECT * FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_tax', round(corr(l_quantity, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_tax', round(corr(l_extendedprice, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'l_discount', 'l_tax', round(corr(l_discount, l_tax), 6) FROM lineitem
    )
    """,
    description="Pairwise Pearson correlation matrix over four lineitem "
    "measures in ONE aggregation pass (six co-moment aggregates "
    "side-by-side in a single scan; df.stat.corr would run six jobs), "
    "unpivoted to tidy (col_a, col_b, corr) rows. The feature-redundancy "
    "screen before training: O(k^2) scalar state per partition, one "
    "map-side-combined pass at any scale.",
    tags=("profile", "stats", "corr", "maintenance"),
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.profile import corr_matrix

    return corr_matrix(t(spark, sf_dir, "lineitem"), list(_CORR_COLS))
