"""Data-layout optimization: Z-order (Morton) interleaving for
multi-dimensional data skipping — the engine-side arithmetic behind
lakehouse `OPTIMIZE ... ZORDER BY (a, b)`.

Sorting by a single column gives perfect min/max pruning on that column
and none on any other; interleaving the BITS of two columns into one sort
key gives every file a narrow range of BOTH dimensions, so scans filtered
on either column (or both) can skip most files from footer statistics
alone.

The z-value is a pure per-row expression (32 shift/mask/or terms, inlined
— whole-stage codegen, zero shuffle); the actual re-layout is then
``repartitionByRange(zval)`` + ``sortWithinPartitions`` + write, which is
one range shuffle — exactly the cost profile of a production OPTIMIZE run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    term: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1)
        t = xb + yb
        term = t if term is None else term + t
    assert term is not None
    return term.cast("long")


def zvalue_n(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of N non-negative ints:
    bit i of column j lands at position ``i*N + j`` (round-robin bit
    interleave — the N-dimensional generalization Delta's multi-column
    ZORDER BY uses). With N columns the key spans ``bits*N`` bits, so
    keep ``bits * len(cols) <= 63``. Still a pure per-row expression
    (``bits*N`` shift/mask/or terms inside whole-stage codegen)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zvalue_n needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*N = {bits * n} exceeds a signed long")
    term: Column | None = None
    for i in range(bits):
        for j, c in enumerate(cols):
            t = F.shiftleft(F.shiftright(c, i).bitwiseAND(1), i * n + j)
            term = t if term is None else term + t
    assert term is not None
    return term.cast("long")


def zvalue_sql(x: str, y: str, *, bits: int = 16) -> str:
    """The identical interleave in DuckDB SQL (same term order)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_bucket_stats(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    *,
    bits: int = 16,
    bucket_shift: int = 22,
) -> DataFrame:
    """Assign rows to z-order buckets (``zval >> bucket_shift`` — the
    file-assignment a re-layout would use) and report per-bucket min/max of
    BOTH dimensions: the footer statistics a z-ordered file would carry.
    Narrow per-bucket ranges in both columns = effective two-column
    skipping; a single-column sort would show full-width ranges on the
    other column.
    """
    z = zvalue(x_col, y_col, bits=bits)
    return (
        df.select(
            x_col.alias("x"),
            y_col.alias("y"),
            F.shiftright(z, bucket_shift).alias("zbucket"),
        )
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
