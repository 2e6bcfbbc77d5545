"""Merge / upsert operators: SCD2 history merge, latest-wins upsert.

The warehouse-maintenance tier (extends the reference's uniqueness-checked
sinks, reference app/etl/load.py conflict handling, to versioned targets):

- ``upsert_latest`` — keep one CURRENT row per key (newest timestamp wins).
- ``scd2_merge`` — apply an update batch to a slowly-changing-dimension
  history table: close out changed open rows, append new versions, keep
  unchanged history untouched.

Scale shape: both are ONE equi-join/shuffle on the business key; change
detection is an expression over the compared columns (null-safe <=>); no
windows over the full history, no driver-side loops. On a real lakehouse
the physical apply would be a transactional MERGE INTO (Delta/Iceberg) —
the plan shape (join on key + split + union) is exactly what those engines
execute underneath.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_differs(compare_cols: list[str], left_prefix: str, right_prefix: str) -> Column:
    """True when ANY compared column differs (null-safe)."""
    diffs = [
        ~F.col(f"{left_prefix}.{c}").eqNullSafe(F.col(f"{right_prefix}.{c}"))
        for c in compare_cols
    ]
    return reduce(lambda a, b: a | b, diffs)


def upsert_latest(
    current: DataFrame,
    updates: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Latest-wins upsert: one row per key, newest ``ts_col`` (ties: update
    wins over current). One shuffle on the key."""
    from pyspark.sql.window import Window

    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(ts_col), F.desc("__src")
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_merge(
    history: DataFrame,
    updates: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
    batch_ts: Column,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD Type-2 merge: versioned history + an update batch → new history.

    Semantics per key:
    - no open row (new key)            → insert an open version;
    - open row, compared columns equal → no-op (idempotent re-delivery);
    - open row, any column differs     → close it (``to_col`` = batch_ts,
      ``current_col`` = false) and insert the new open version.
    Closed history rows pass through untouched.

    ``history`` columns: key_cols + compare_cols + from/to/current;
    ``updates`` columns: key_cols + compare_cols.
    """
    closed_hist = history.filter(~F.col(current_col))
    open_hist = history.filter(F.col(current_col))

    # presence flags via marker columns rather than key nullability (keys
    # can be genuinely null under the null-safe join)
    h2 = open_hist.withColumn("__h", F.lit(1)).alias("h")
    u2 = updates.withColumn("__u", F.lit(1)).alias("u")
    joined = h2.join(
        u2, [F.col(f"h.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols], "full_outer"
    )
    in_h = F.col("h.__h").isNotNull()
    in_u = F.col("u.__u").isNotNull()
    changed = in_h & in_u & _any_differs(compare_cols, "h", "u")

    keep_open = joined.filter(in_h & (~in_u | ~changed)).select("h.*").drop("__h")
    closed_now = (
        joined.filter(changed)
        .select("h.*")
        .drop("__h")
        .withColumn(to_col, batch_ts)
        .withColumn(current_col, F.lit(False))
    )
    inserted = (
        joined.filter(in_u & (~in_h | changed))
        .select(
            *[F.coalesce(F.col(f"u.{k}"), F.col(f"h.{k}")).alias(k) for k in key_cols],
            *[F.col(f"u.{c}").alias(c) for c in compare_cols],
        )
        .withColumn(from_col, batch_ts)
        .withColumn(to_col, F.lit(None).cast(history.schema[to_col].dataType))
        .withColumn(current_col, F.lit(True))
    )
    return closed_hist.unionByName(keep_open).unionByName(closed_now).unionByName(
        inserted.select(*history.columns)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC by snapshot comparison: classify every key as insert / delete /
    update between two table versions (unchanged rows are dropped — the
    change feed, not the table).

    Output: keys..., change_type, old_<c>/new_<c> for each compared
    column. ONE full-outer equi-join on the key — the same single-shuffle
    shape a lakehouse table-diff (Delta CDF backfill, Iceberg
    changelog-scan) materializes; change detection is a null-safe <=>
    expression, so NULL-to-value edits classify as updates, not noise.
    """
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    j = o.join(n, keys, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .drop("__in_old", "__in_new")
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
