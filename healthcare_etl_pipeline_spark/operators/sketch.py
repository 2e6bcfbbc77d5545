"""Mergeable sketches: Count–Min (frequency), HyperLogLog (distinct),
and a Bloom-filter join prefilter.

All three share the same 100 TB contract: executor-local partial state of
FIXED size, merged by a tiny aggregation — never a shuffle of the raw key
space — and all hash with the portable md5 hash (operators/text.py), so
every register/cell/bit is bit-identical in DuckDB and carries an exact
value oracle.

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


def cms_merge(*sketches: "DataFrame") -> "DataFrame":
    """Cell-wise addition of CMS grids — the mergeable-sketch contract
    (counters add, unlike HLL registers which max)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


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


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------
#
# Register layout for precision p: bucket = 16 md5 bits (hex chars 1-4)
# mod 2**p, and rho = 1 + leading-zeros of a DISJOINT 60-bit chunk (hex
# chars 5-19), computed exactly on the integer path as 61 - bitlength(v)
# via length(bin(v)) — no floating log anywhere near the registers.
# Flajolet et al., "HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm" (AofA 2007).

HLL_P = 10
HLL_M = 1 << HLL_P


def _hll_coords(item: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one item; exact integer expressions only."""
    h = F.md5(item)
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % HLL_M
    v = F.conv(F.substring(h, 5, 15), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(61)).otherwise(61 - F.length(F.bin(v)))
    return bucket, rho


def hll_coords_sql(expr: str) -> tuple[str, str]:
    """The identical (bucket, rho) expressions in DuckDB SQL."""
    bucket = f"(CAST(('0x' || substr(md5({expr}), 1, 4)) AS BIGINT) % {HLL_M})"
    v = f"CAST(('0x' || substr(md5({expr}), 5, 15)) AS BIGINT)"
    rho = f"(CASE WHEN {v} = 0 THEN 61 ELSE 61 - length(bin({v})) END)"
    return bucket, rho


def hll_build(items: DataFrame, item_col: str, group_cols: list[str]) -> DataFrame:
    """One HLL register set per group: (group..., bucket, rho).

    rho is max'd per bucket, so the shuffle after the map-side combine
    carries at most 2**p rows per group per map partition — fixed size
    regardless of input cardinality. Registers never observed stay
    absent (they read as rho 0 at estimate time).
    """
    bucket, rho = _hll_coords(F.col(item_col).cast("string"))
    return (
        items.select(*group_cols, bucket.alias("bucket"), rho.alias("rho_i"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho_i").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register sets and max per (group..., bucket) — the HLL merge."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality per group from its registers.

    Raw estimate alpha_m * m^2 / sum_j 2^-M_j with absent registers
    contributing 2^0 each; small-range (linear counting) correction
    m*ln(m/V) when E <= 2.5m and some register is zero. The rounding to
    BIGINT keeps the oracle comparison off the float path's last ulp.
    """
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
    )
    zeros = m - F.col("present")
    raw = F.lit(alpha * m * m) / (F.col("s") + zeros.cast("double"))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("hll_est")
    )


def hll_estimate_sql(registers_cte: str, group_cols: str) -> str:
    """DuckDB estimate over a registers CTE (same formula, same rounding)."""
    m = HLL_M
    alpha = 0.7213 / (1 + 1.079 / m)
    return f"""
    SELECT {group_cols},
           CAST(round(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                           THEN {m}.0 * ln({m}.0 / zeros)
                           ELSE raw END) AS BIGINT) AS hll_est
    FROM (
      SELECT {group_cols}, {m} - count(*) AS zeros,
             CAST({alpha!r} AS DOUBLE) * {m} * {m}
               / (sum(pow(2.0, -rho)) + {m} - count(*)) AS raw
      FROM ({registers_cte})
      GROUP BY {group_cols}
    )
    """


# --------------------------------------------------------------------------
# Bloom-filter join prefilter
# --------------------------------------------------------------------------
#
# An explicit, engine-portable runtime filter (sideways information
# passing): hash the build side's keys into k bit positions, ship only the
# SET positions (small), and drop probe rows whose k positions are not all
# set BEFORE the real join pays its shuffle. No false negatives by
# construction, so prefilter + join == plain join exactly; false positives
# are eliminated by the join itself. Spark's AQE injects the same shape as
# InSubqueryExec/bloom runtime filters when statistics allow; this form is
# deterministic and oracle-checkable.

def bloom_build(
    build: DataFrame, key_col: str, *, bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """Distinct set bit positions of the build side: (pos)."""
    key = F.col(key_col).cast("string")
    pos = F.array(
        *[
            (portable_char_hash(F.concat(key, F.lit(f"#{i}"))) % bits).alias(
                f"p{i}"
            )
            for i in range(k)
        ]
    )
    return build.select(F.explode(pos).alias("pos")).distinct()


def bloom_prefilter(
    probe: DataFrame,
    key_col: str,
    bloom_bits: DataFrame,
    *,
    bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep probe rows whose k positions are ALL set in the filter.

    The bit table is at most `bits` rows → broadcast; the all-k test is
    an explode → broadcast semi-shape join → HAVING count = k, then a
    semi join back to the probe rows on the key. Probe columns pass
    through untouched. The membership test runs over DISTINCT probe keys
    (a key occurring r times would otherwise explode to r*k rows and
    fail the count-of-k test).
    """
    key = F.col(key_col).cast("string")
    pos = F.array(
        *[
            portable_char_hash(F.concat(key, F.lit(f"#{i}"))) % bits
            for i in range(k)
        ]
    )
    probed = (
        probe.select(key_col)
        .distinct()
        .select(F.col(key_col), F.explode(pos).alias("pos"))
    )
    hits = (
        probed.join(F.broadcast(bloom_bits), "pos")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("nhit"))
        .where(F.col("nhit") == k)
        .select(key_col)
    )
    return probe.join(F.broadcast(hits), key_col, "left_semi")


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Join-size estimate from two CMS grids over the SAME (depth, width):
    min over rows r of sum_b cntA[r,b]*cntB[r,b] (AMS/CMS inner product,
    Cormode & Muthukrishnan 2005). Estimates |A JOIN B on k| = sum_k
    n_A(k)*n_B(k) without executing the join — the planner's
    "will this blow up" probe; always an over-estimate (collision cross
    terms only add), error <= (e/width)*N_A*N_B per row.

    Cost: a (r,bucket) equi-join of two <= d*w-row grids + a d-row min —
    nothing touches the raw tables.
    """
    a = sketch_a.select("r", "bucket", F.col("cnt").alias("cnt_a"))
    b = sketch_b.select("r", "bucket", F.col("cnt").alias("cnt_b"))
    per_row = (
        a.join(b, ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("join_size_est"))


# --- KMV (k minimum values) distinct-value sketches -----------------------
#
# The set-operation sketch HLL cannot be: KMV keeps the k smallest distinct
# 60-bit hash values of a set. Union sketches merge by "union then re-take
# k smallest" (same algebra as each worker's partial), the kth value d_k
# estimates the distinct count as (k-1)/frac(d_k) (Bar-Yossef et al. 2002,
# Beyer et al. 2007), and — unlike HLL — INTERSECTION estimates fall out:
# rho = |K(A∪B) ∩ A ∩ B| / |K(A∪B)| is an unbiased Jaccard estimate and
# membership of a union-sketch element against A can be tested against
# K(A) alone (x <= d_k(A∪B) <= d_k(A), so x in A implies x in K(A)).
#
# Hashes use the portable md5 60-bit prefix (same convention as the HLL /
# CMS sketches above) so a SQL oracle reproduces every value exactly.

KMV_SCALE = float(16 ** 15)  # 2^60: hash values as fractions of this


def _kmv_hash(item: Column) -> Column:
    return F.conv(F.substring(F.md5(item.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_build(
    df: DataFrame,
    item_col: str,
    set_col: str,
    *,
    k: int = 256,
    safety: int = 32,
) -> DataFrame:
    """One KMV sketch per value of ``set_col``: the k smallest distinct
    item hashes, as a sorted array column.

    Scale path: after the distinct (one map-side-combined shuffle), a
    threshold PREFILTER keeps only hashes below safety*k/approx_distinct —
    by uniform order statistics the k smallest always survive (expected
    survivors = safety*k; the approx count's few-percent error is absorbed
    by the safety factor), so the final per-set collect_list state is
    bounded at ~safety*k longs regardless of input size, never the full
    distinct set. The prefilter provably cannot change the answer while
    >= k distinct hashes survive, so the oracle can ignore it.

    Output: set_col, kmv (array<long>, ascending, len <= k).
    """
    hv = _kmv_hash(F.col(item_col))
    distinct = df.select(
        F.col(set_col).alias("s"), hv.alias("hv")
    ).distinct()
    approx = {
        r["s"]: r["ad"]
        for r in distinct.groupBy("s")
        .agg(F.approx_count_distinct("hv").alias("ad"))
        .collect()  # one row per SET (a handful), never per item
    }
    tau = {
        s: min(1.0, (safety * k) / max(ad, 1)) for s, ad in approx.items()
    }
    tau_df = F.create_map(
        *[x for s, v in tau.items() for x in (F.lit(s), F.lit(v))]
    )
    survivors = distinct.filter(
        (F.col("hv") / F.lit(KMV_SCALE)) <= tau_df[F.col("s")]
    )
    return survivors.groupBy("s").agg(
        F.slice(F.sort_array(F.collect_list("hv")), 1, k).alias("kmv")
    ).select(F.col("s").alias(set_col), "kmv")


def kmv_union(kmv_a: Column, kmv_b: Column, k: int) -> Column:
    """Merge two sorted KMV arrays: k smallest of the distinct union —
    the same algebra a partial aggregate would apply, so sketches merge
    associatively across workers/days/tables."""
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(kmv_a, kmv_b))), 1, k
    )


def kmv_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimate: exact |kmv| while the sketch is unsaturated
    (fewer than k distinct values seen), else (k-1)/frac(d_k)."""
    d_k = F.element_at(kmv, -1) / F.lit(KMV_SCALE)
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(F.lit(float(k - 1)) / d_k)
