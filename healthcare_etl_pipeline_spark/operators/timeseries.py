"""Time-series regularization: resample an irregular event stream onto a
fixed grid with gap-filling — the hypertable `time_bucket_gapfill` /
Pandas `resample().ffill()` counterpart, expressed as DataFrame ops.

Shape (all per-key, nothing global):
1. bucket events to the grid step (`date_trunc`) and aggregate per
   (key, bucket) — one map-side-combined shuffle;
2. explode each key's `sequence(min_bucket, max_bucket, step)` — the dense
   grid, generated key-locally (no cross-key range, no driver loop);
3. left-join observed buckets onto the grid (same key+bucket partitioning
   the aggregate just produced);
4. forward-fill carried metrics with `last(ignorenulls)` over a per-key
   ordered window (running frame — Spark evaluates it in one pass per
   partition, no re-sort: the join output is already hash-partitioned by
   key, and the window sorts within partitions only).

At 100 TB the grid explode multiplies rows by (span/step) per key — the
caller bounds the key set or the time range, exactly like a production
gap-fill (a dense grid over every key × all history is not a query, it's
a data-generation job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Regularize ``df`` to one row per (key, bucket) on a dense per-key
    grid from the key's first to last observed bucket.

    Output: key, bucket, n_events (0 on gaps), value_sum (0.0 on gaps),
    last_value_avg (per-bucket mean of ``value_col``, forward-filled
    across gaps — the classic last-observation-carried-forward metric).
    """
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    observed = (
        df.select(F.col(key_col), bucket.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
            F.round(F.avg(value_col), 6).alias("value_avg"),
        )
    )
    grid = (
        observed.groupBy(key_col)
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(observed, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        F.last("value_avg", ignorenulls=True).over(w).alias("last_value_avg"),
    )


def time_decay_agg(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    date_col: str,
    *,
    as_of: str,
    half_life_days: float,
) -> DataFrame:
    """Exponentially time-decayed sum per key: sum of value * 2^(-age/h)
    where age is days before ``as_of`` and h the half-life.

    The recency weighting every feature store applies to behavioral
    aggregates ("spend, but recent spend matters more"). Pure expression
    + ONE map-side-combined aggregation — no window, no order
    sensitivity (each row's weight depends only on its own date), so it
    scales exactly like a plain sum. ``as_of`` is an explicit literal:
    deterministic, re-runnable, oracle-mirrorable (never now()).

    Output: key_cols..., n, total, decayed_total (rounded 4 dp).
    """
    age = F.datediff(F.lit(as_of).cast("date"), F.col(date_col))
    weight = F.pow(F.lit(2.0), -age.cast("double") / half_life_days)
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), 2).alias("total"),
        F.round(F.sum(F.col(value_col) * weight), 4).alias("decayed_total"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts and probabilities over each
    key's ordered state sequence (lead over the per-key window; the last
    state of a sequence has no successor and emits nothing).

    One shuffle on the key; the window partitions are per-key sequences.
    The |S|² output is the behavioral-model summary (next-event
    prediction, anomaly scoring) whose size is vocabulary-, not
    data-bound. Ties in ``order_cols`` must be broken by a unique column
    for determinism — pass one explicitly.

    Output: from_state, to_state, cnt, prob (rounded 6 dp).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wtot = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(wtot), 6).alias("prob"),
    )


def ewma_fold(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    *,
    alpha: float,
    min_points: int = 1,
) -> DataFrame:
    """Per-key exponentially weighted moving average, evaluated as an
    exact left fold: state_1 = x_1, state_i = (1-alpha)*state_{i-1} +
    alpha*x_i over the key's observations ordered by ``order_cols``.

    The recursive definition has no fixed-size window frame, so it is not
    expressible as a built-in window aggregate; the closed form
    sum(x_i*(1-a)^(n-i)) overflows (1-a)^(-i) for long series. Instead the
    per-key sequence is folded JVM-side: sort_array(collect_list(struct))
    fixes the order inside the aggregation buffer and ``aggregate`` (a
    Catalyst higher-order function, whole-stage-codegen'd, no Python) runs
    the recurrence exactly. ONE map-side-combined shuffle on the key; state
    per key is its own observation list, so memory is bounded by per-key
    cardinality — the same bound any per-key sequence model carries (the
    caller bounds keys or time range at 100 TB, not this operator).

    Order ties must be broken by a unique column in ``order_cols`` so the
    fold order (and therefore the float result) is deterministic and
    engine-portable.

    The reported ewma is TRUNCATED to 4 dp (floor(x*1e4)/1e4), not
    rounded: Spark's round() operates on the double's shortest decimal
    repr (BigDecimal.valueOf) while other engines round the exact binary
    value, and a fold result landing on a half boundary of the shortest
    repr (e.g. ...53684999.. printing as ...53685) flips between them.
    floor of the identically-computed product has no half boundary, so
    it is stable across engines for bit-identical inputs.

    Output: key, n_points, last_value (4 dp), ewma (truncated 4 dp).
    """
    seq = df.groupBy(key_col).agg(
        F.sort_array(
            F.collect_list(F.struct(*order_cols, F.col(value_col).alias("x")))
        ).alias("seq")
    )
    xs = F.transform(F.col("seq"), lambda s: s["x"].cast("double"))
    fold = F.aggregate(
        xs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            acc * F.lit(1.0 - alpha) + x * F.lit(alpha)
        ),
    )
    return (
        seq.filter(F.size("seq") >= min_points)
        .select(
            key_col,
            F.size("seq").alias("n_points"),
            F.round(F.element_at(xs, -1), 4).alias("last_value"),
            (F.floor(fold * F.lit(10000.0)) / F.lit(10000.0)).alias("ewma"),
        )
    )


def rolling_window_activity(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    user_col: str,
    *,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window activity metrics per (day, type): event count and
    DISTINCT active users over the last ``window_days`` days — the rolling
    DAU/WAU/MAU family. Sliding distinct-count has no window-function
    form (distinct is not subtractable, so no incremental frame), and the
    naive form is a range join of days x events.

    Instead each event fans out to the <= window_days report days it
    affects (a bounded, shuffle-free explode), report days are restricted
    to days that actually occur via a broadcast semi-join against the
    tiny distinct-days frame (no global min/max scalar pass), and ONE
    aggregation computes count + count(DISTINCT user) per (day, type) —
    partial aggregation runs map-side, and the x{window_days} blowup is
    the explicit, bounded price that replaces the unbounded range join
    at 100 TB.

    Output: day (date), type_col, events_w, active_users_w.
    """
    ed = F.to_date(F.col(ts_col))
    fanned = df.select(
        F.explode(
            F.sequence(ed, F.date_add(ed, window_days - 1))
        ).alias("day"),
        F.col(type_col),
        F.col(user_col).alias("u"),
    )
    days = df.select(ed.alias("day")).distinct()
    return (
        fanned.join(F.broadcast(days), "day")
        .groupBy("day", type_col)
        .agg(
            F.count(F.lit(1)).alias("events_w"),
            F.countDistinct("u").alias("active_users_w"),
        )
    )
