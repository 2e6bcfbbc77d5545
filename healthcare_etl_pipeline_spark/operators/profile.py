"""Table profiling: one-pass per-column statistics census.

The "ANALYZE TABLE" counterpart for data-quality monitoring: null counts,
distinct counts, numeric min/max per column, emitted as one tidy row per
column. Single aggregation pass over the table (all aggregates in one
``agg``), then a ``stack`` unpivot of the 1-row result — the scan happens
once regardless of how many columns are profiled.

Scale note: ``count(DISTINCT c)`` for several columns makes Catalyst plan
an Expand (one replicated pass per distinct aggregate). Exact distincts
are the oracle-checkable form used here; at 100 TB switch
``exact_distinct=False`` to ``approx_count_distinct`` (HLL, single pass,
~2% error) — same output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column stats: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) — min/max as rounded doubles for numeric columns, NULL for
    string columns."""
    string_cols = string_cols or []
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
        aggs.append(distinct(c).alias(f"__nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.round(F.min(F.col(c)).cast("double"), 6).alias(f"__min_{c}"))
        aggs.append(F.round(F.max(F.col(c)).cast("double"), 6).alias(f"__max_{c}"))
    one = df.agg(*aggs)

    parts = []
    for c in numeric_cols:
        parts.append(
            f"'{c}', __total, __total - __cnt_{c}, __nd_{c}, __min_{c}, __max_{c}"
        )
    for c in string_cols:
        parts.append(
            f"'{c}', __total, __total - __cnt_{c}, __nd_{c}, "
            "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
        )
    n = len(parts)
    stacked = one.selectExpr(
        f"stack({n}, {', '.join(parts)}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
    return stacked


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    *,
    bin_width: float,
    n_bins: int,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution of ``value_col`` over FIXED equal-width bins (last bin
    open-ended) — the standard production drift monitor for a feature or
    metric column (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    action).

    Fixed edges (not quantiles) keep the operator deterministic, mirrorable
    in SQL, and comparable across runs. Each side is ONE map-side-combined
    aggregation to ``n_bins`` partial counts; the join of the two n_bins-row
    frames is a broadcast. Scale cost = two scans, no wide shuffle.

    Output: one row per bin with both proportions and the PSI contribution
    (probabilities floored at ``eps`` so empty bins contribute a finite,
    large term instead of ±inf).
    """

    def binned(df: DataFrame, name: str) -> DataFrame:
        b = F.least(
            F.floor(F.col(value_col) / bin_width), F.lit(n_bins - 1)
        ).cast("int")
        out = df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias(f"n_{name}")
        )
        total = out.agg(F.sum(f"n_{name}").alias(f"tot_{name}"))
        return out.crossJoin(F.broadcast(total)).select(
            "bin",
            F.col(f"n_{name}"),
            (F.col(f"n_{name}") / F.col(f"tot_{name}")).alias(f"p_{name}"),
        )

    r = binned(ref, "ref")
    c = binned(cur, "cur")
    pr = F.greatest(F.coalesce("p_ref", F.lit(0.0)), F.lit(eps))
    pc = F.greatest(F.coalesce("p_cur", F.lit(0.0)), F.lit(eps))
    return (
        r.join(c, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.round(pr, 6).alias("p_ref"),
            F.round(pc, 6).alias("p_cur"),
            F.round((pc - pr) * F.log(pc / pr), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    bin_width: float,
    n_bins: int,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group over FIXED
    equal-width bins: D = max over bin edges of |CDF_ref - CDF_cur|.

    The binned form is the 100 TB shape: each side reduces to n_bins
    partial counts with map-side combine (a raw-value KS needs a global
    sort of the pooled samples — one ordered partition, unusable at
    scale), and the CDF window runs over n_bins rows per group, not over
    the data. Binning makes D a lower bound of the exact statistic with
    resolution bin_width — the same trade PSI makes; fixed edges keep it
    deterministic, SQL-mirrorable, and comparable across runs.

    Output: group_cols..., n_ref, n_cur, ks_stat (rounded 6 dp).
    """
    b = F.least(F.floor(F.col(value_col) / bin_width), F.lit(n_bins - 1)).cast(
        "int"
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(*group_cols, b.alias("bin"))
            .groupBy(*group_cols, "bin")
            .agg(F.count(F.lit(1)).alias(f"n_{name}"))
        )

    both = binned(ref, "ref").join(
        binned(cur, "cur"), [*group_cols, "bin"], "full_outer"
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_r = F.sum(F.coalesce("n_ref", F.lit(0))).over(w)
    cum_c = F.sum(F.coalesce("n_cur", F.lit(0))).over(w)
    wg = Window.partitionBy(*group_cols)
    tot_r = F.sum(F.coalesce("n_ref", F.lit(0))).over(wg)
    tot_c = F.sum(F.coalesce("n_cur", F.lit(0))).over(wg)
    gap = F.abs(cum_r / tot_r - cum_c / tot_c)
    return (
        both.select(*group_cols, tot_r.alias("n_ref"), tot_c.alias("n_cur"),
                    gap.alias("gap"))
        .groupBy(*group_cols, "n_ref", "n_cur")
        .agg(F.round(F.max("gap"), 6).alias("ks_stat"))
    )


def dq_checks(
    df: DataFrame,
    predicate_checks: list[tuple[str, "F.Column"]],
    *,
    unique_checks: list[tuple[str, list[str]]] = (),
    fk_checks: list[tuple[str, list[str], DataFrame, list[str]]] = (),
) -> DataFrame:
    """Data-quality expectations audit (the Deequ/Great-Expectations
    operator class, extending the reference's collect-ALL-errors
    validation tier from rows to datasets).

    - ``predicate_checks``: (name, violation_condition) pairs — ALL
      evaluated in ONE conditional-aggregation pass over the data.
    - ``unique_checks``: (name, cols) — violations = rows beyond the
      first per duplicated key (count - distinct count; one agg each).
    - ``fk_checks``: (name, keys, parent_df, parent_keys) — orphan rows
      via a left-anti join (broadcastable when the parent's key set is
      dimension-sized).

    Every check reports over the same snapshot: name, n_rows,
    n_violations, passed. The union of per-check one-row frames is
    driver-free plan glue — each branch is its own aggregate job, the
    scan-heavy predicate branch runs exactly once.
    """
    spark_sum = F.sum
    total = F.count(F.lit(1))
    aggs = [total.alias("n_rows")] + [
        spark_sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"v{i}")
        for i, (_, cond) in enumerate(predicate_checks)
    ]
    base = df.agg(*aggs)
    frames = []
    for i, (name, _) in enumerate(predicate_checks):
        frames.append(
            base.select(
                F.lit(name).alias("check_name"),
                F.col("n_rows"),
                F.col(f"v{i}").alias("n_violations"),
            )
        )
    for name, cols in unique_checks:
        frames.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
                .cast("long")
                .alias("n_violations"),
            ).select(F.lit(name).alias("check_name"), "n_rows", "n_violations")
        )
    for name, keys, parent, parent_keys in fk_checks:
        pk = parent.select(
            *[F.col(pc).alias(k) for k, pc in zip(keys, parent_keys)]
        ).distinct()
        orphans = df.select(*keys).join(F.broadcast(pk), keys, "left_anti")
        frames.append(
            df.agg(F.count(F.lit(1)).alias("n_rows"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
            .select(F.lit(name).alias("check_name"), "n_rows", "n_violations")
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.withColumn("passed", F.col("n_violations") == 0)


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All pairwise Pearson correlations in ONE aggregation pass: every
    corr(i, j) for i < j is a co-moment aggregate Catalyst evaluates
    side by side in a single scan (no per-pair jobs, no driver loop —
    ``df.stat.corr`` does one pair per call). Unpivoted to tidy
    (col_a, col_b, corr) rows via stack.

    The feature-redundancy screen run before training: at 100 TB it
    costs one map-side-combined pass whatever the column count (state
    is O(k²) scalars per partition).
    """
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"__c_{a}__{b}")
            )
            names.append((a, b))
    one = df.agg(*aggs)
    parts = [f"'{a}', '{b}', __c_{a}__{b}" for a, b in names]
    return one.selectExpr(
        f"stack({len(parts)}, {', '.join(parts)}) AS (col_a, col_b, corr)"
    )
