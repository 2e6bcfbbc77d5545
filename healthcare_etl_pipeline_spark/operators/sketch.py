"""Count–Min sketch: the mergeable frequency sketch for streams and
shuffles too big for exact counting.

A CMS is a d × w counter grid; item x increments cell (r, h_r(x) mod w)
for each of the d row hashes, and its frequency estimate is the MIN over
rows of its d cells — always an OVER-estimate (collisions only add), with
error ≤ ε·N at probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Why it matters at 100 TB: the grid is FIXED SIZE (d·w counters) no matter
the cardinality, and two sketches merge by cell-wise addition — so
executors build partial sketches map-side and the reduce is a d·w-row
aggregation, never a shuffle of the raw key space. (The same contract as
Spark's own HLL/quantile sketches; CMS adds point-frequency queries.)

Construction here is pure DataFrame ops: one explode of the item stream
into its d (row, bucket) coordinates, one map-side-combined groupBy. Row
hashes derive from the portable md5 hash (operators/text.py) so the full
grid — and any estimate read off it — carries an exact DuckDB value
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.text import (
    portable_char_hash,
    portable_char_hash_sql,
)


def _row_hash(item: Column, r: int, w: int) -> Column:
    """Row-r bucket of an item: portable hash of the row-salted string."""
    return portable_char_hash(F.concat(item, F.lit(f"|{r}"))) % w


def row_hash_sql(expr: str, r: int, w: int) -> str:
    """The identical row hash in DuckDB SQL."""
    salted = f"({expr} || '|{r}')"
    return f"({portable_char_hash_sql(salted)} % {w})"


def cms_build(
    items: DataFrame, item_col: str, *, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build the sketch grid from an item stream (one row per occurrence).

    Output: (r, bucket, cnt) — only touched cells are materialized (an
    absent cell is 0). One explode to d coordinates per occurrence, one
    groupBy(r, bucket) with map-side combine: the shuffle carries at most
    d·w rows per map partition regardless of input size.
    """
    coords = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _row_hash(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(coords).alias("c"))
        .select("c.r", "c.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates for the query items: min over the d cells.

    The d (row, bucket) lookups per query item join against the sketch on
    (r, bucket) — the sketch side is at most d·w rows, so it broadcasts.
    Absent cells read as 0 (an item never seen estimates 0).
    """
    coords = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                _row_hash(F.col(item_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    q = queries.select(F.col(item_col), F.explode(coords).alias("c")).select(
        item_col, "c.r", "c.bucket"
    )
    return (
        q.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
