"""Distributed table fingerprints: O(buckets) cross-engine value digests.

The scale ladder's full row-set differential (tools/check_oracle.py)
collects BOTH engines' complete results into the driver — fine at the
sf0.01 gate, impossible for 59 M-row outputs at sf10+ (ORACLE_SF01.md's
one excluded query) and wasteful for the 45 M-row window/sessionize
families at sf100. This operator replaces the driver-side compare with an
ENGINE-SIDE aggregation: every row folds to a 30-bit portable hash, rows
group into ``buckets`` classes by hash residue, and the digest is
``(bucket, count, sum-of-hashes)`` — at most ``buckets`` rows to compare
no matter the input size. Equal digests ⇒ equal row multisets up to hash
collision (order-insensitive by construction, multiplicity-sensitive via
count+sum; a colliding pair would need identical fold hashes mod p, and
any single-row difference moves its bucket's (n, s)).

Portability contract (mirrors tools/check_oracle.py's driver canon):
- integral / boolean / date / timestamp columns are exact (mod-p reduce,
  epoch-days / epoch-micros);
- DECIMAL(p,s) is scaled exactly to integer at its own scale;
- DOUBLE/FLOAT canonicalizes as ``floor(fmod(x, 1e12) * 1e6 + 0.5)`` —
  callers must pre-round float columns to ≤ 6 dp in BOTH engines (every
  registered query already does, per the oracle contract); the fmod
  keeps a 1e13-scale money total (sf100's rollup grand total) from
  overflowing int64 after scaling — IEEE fmod of the identical double
  is identical cross-engine, so equality is preserved;
- strings hash through the md5-based ``portable_char_hash`` (identical
  in Spark, DuckDB, and Python);
- arrays of integrals/strings join on an unlikely separator and hash as
  one string;
- float arrays canonicalize per element exactly like scalar doubles
  (fmod 1e12 → 6-dp scale → BIGINT string) then join-and-hash — same
  pre-round-to-≤6dp caller contract, so embedding/distance-valued
  outputs join the sf10+ ladder instead of stopping at sf0.01.

The row fold visits columns in NAME order (same as the driver compare
sorts), ``h = (h * 131 + canon) % p``, so column order differences
between the two engines cannot matter.

Overflow posture: per-bucket ``sum`` adds values < p ≈ 1e9, exact in
int64 to ~9.2e9 rows per bucket — with the default 256 buckets that is
~2.4e12 rows per digested result, 3 orders of magnitude past the sf100
rung's largest output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators.text import (
    MOD,
    portable_char_hash,
    portable_char_hash_sql,
)

FOLD_K = 131
NULL_SENTINEL = MOD - 13
_SEP = "\x1f"
_EPOCH = "1970-01-01"
DEFAULT_BUCKETS = 256


def _canon_column(c: Column, dtype: T.DataType) -> Column:
    """Canonical BIGINT in [0, MOD) for one column value (NULL → sentinel)."""
    if isinstance(dtype, T.BooleanType):
        v = c.cast("long")
    elif isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        v = c.cast("long")
    elif isinstance(dtype, T.DecimalType):
        # Guard the canon's own arithmetic: Spark's c * 10^scale needs
        # precision + scale + 1 digits (nulls out past 38 with ANSI off)
        # while the DuckDB twin CASTs the scaled value to BIGINT (errors
        # past int64 ≈ 9.2e18, i.e. precision ≥ 19). The two engines
        # would fail DIFFERENTLY (silent null vs loud error) — refuse
        # loudly instead, matching the "honest about what it cannot
        # canonicalize" posture. No catalog column hits this today.
        if dtype.precision + dtype.scale + 1 > 38 or dtype.precision > 18:
            raise TypeError(
                f"decimal({dtype.precision},{dtype.scale}) exceeds the "
                "portable canon's exact range (needs precision ≤ 18 and "
                "precision + scale + 1 ≤ 38)"
            )
        v = (c * F.lit(10**dtype.scale)).cast(T.DecimalType(38, 0)) % F.lit(MOD)
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        # fmod BEFORE scaling: a 1e13-scale money total times 1e6 would
        # overflow int64 (caught at sf100 on rollup's grand-total row).
        # IEEE fmod of the identical double is identical in both engines,
        # so equality is preserved; distinct values 1e12 apart may
        # collide, which a hash tolerates.
        v = F.floor(
            (c.cast("double") % F.lit(1.0e12)) * F.lit(1_000_000.0)
            + F.lit(0.5)
        ).cast("long")
    elif isinstance(dtype, T.DateType):
        v = F.datediff(c, F.lit(_EPOCH).cast("date")).cast("long")
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        v = F.unix_micros(c.cast("timestamp"))
    elif isinstance(dtype, T.StringType):
        return F.coalesce(portable_char_hash(c), F.lit(NULL_SENTINEL))
    elif isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType,
         T.BooleanType),
    ):
        joined = F.array_join(
            c.cast("array<string>"), _SEP, null_replacement="\x00"
        )
        return F.coalesce(portable_char_hash(joined), F.lit(NULL_SENTINEL))
    elif isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, (T.DoubleType, T.FloatType)
    ):
        # Float arrays (embeddings, distance lists): canonicalize each
        # element exactly like a scalar double — fmod 1e12 then 6-dp
        # scale — to a BIGINT string, then hash the joined string. Same
        # caller contract as scalar doubles: pre-round elements to ≤6 dp
        # in BOTH engines. NULL elements → sentinel; NULL array →
        # sentinel; empty array → hash('').
        elem = lambda x: F.coalesce(  # noqa: E731
            F.pmod(
                F.floor(
                    (x.cast("double") % F.lit(1.0e12))
                    * F.lit(1_000_000.0)
                    + F.lit(0.5)
                ).cast("long"),
                F.lit(MOD),
            ),
            F.lit(NULL_SENTINEL),
        ).cast("string")
        joined = F.array_join(F.transform(c, elem), _SEP)
        return F.coalesce(portable_char_hash(joined), F.lit(NULL_SENTINEL))
    else:
        raise TypeError(f"no portable canonicalization for {dtype.simpleString()}")
    return F.coalesce(F.pmod(v, F.lit(MOD)), F.lit(NULL_SENTINEL))


def row_fingerprint(df: DataFrame) -> Column:
    """Portable per-row hash over all columns in name order."""
    h = F.lit(0).cast("long")
    for name in sorted(df.columns):
        canon = _canon_column(df[name], df.schema[name].dataType)
        h = F.pmod(h * F.lit(FOLD_K) + canon, F.lit(MOD))
    return h


def table_digest(df: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """O(buckets)-row multiset digest of ``df`` — the scale-ladder compare
    unit. Fully distributed: one map-side-combined aggregation, no
    driver materialization of the input."""
    fp = row_fingerprint(df).alias("__fp")
    return (
        df.select(fp)
        .groupBy(F.pmod(F.col("__fp"), F.lit(buckets)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__fp").alias("s"),
        )
    )


# ---------------------------------------------------------------- SQL twin

def _canon_sql(expr: str, duck_type: str) -> str:
    """The identical canonicalization in DuckDB SQL. ``duck_type`` is the
    upper-cased type string from a DESCRIBE of the oracle query."""
    t = duck_type.upper()
    pm = f"((({{v}}) % {MOD} + {MOD}) % {MOD})"
    if t in ("BOOLEAN",):
        v = f"CAST({expr} AS BIGINT)"
    elif t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
               "USMALLINT", "UINTEGER", "UBIGINT"):
        v = f"CAST({expr} AS BIGINT)"
    elif t.startswith("DECIMAL"):
        if "(" in t:
            prec_s = t[t.index("(") + 1 : t.index(")")]
            prec = int(prec_s.split(",")[0])
            scale = int(prec_s.split(",")[1]) if "," in prec_s else 0
        else:
            prec, scale = 18, 3
        # Mirror the Spark-side guard: past this range Spark nulls out
        # silently while this CAST errors — diverge loudly instead.
        if prec + scale + 1 > 38 or prec > 18:
            raise TypeError(
                f"decimal({prec},{scale}) exceeds the portable canon's "
                "exact range (needs precision ≤ 18 and "
                "precision + scale + 1 ≤ 38)"
            )
        v = f"CAST(({expr}) * {10**scale} AS BIGINT)"
    elif t in ("DOUBLE", "FLOAT", "REAL"):
        # % (truncated remainder, sign of dividend) matches Spark's %;
        # DuckDB's fmod() is FLOORED for negative dividends — measured
        v = (
            f"CAST(FLOOR((CAST({expr} AS DOUBLE) % 1e12)"
            f" * 1000000.0 + 0.5) AS BIGINT)"
        )
    elif t == "DATE":
        v = f"datediff('day', DATE '1970-01-01', {expr})"
    elif t.startswith("TIMESTAMP"):
        v = f"epoch_us({expr})"
    elif t == "VARCHAR":
        return f"COALESCE({portable_char_hash_sql(expr)}, {NULL_SENTINEL})"
    elif t.endswith("[]") and t.startswith(("DOUBLE", "FLOAT", "REAL")):
        # Float-array twin: per-element scalar-double canon to a BIGINT
        # string, join, hash — mirrors the Spark branch exactly.
        elem_canon = (
            "CAST(COALESCE(((CAST(FLOOR((CAST(x AS DOUBLE) % 1e12)"
            f" * 1000000.0 + 0.5) AS BIGINT) % {MOD} + {MOD}) % {MOD}),"
            f" {NULL_SENTINEL}) AS VARCHAR)"
        )
        joined = (
            f"CASE WHEN ({expr}) IS NULL THEN NULL ELSE "
            f"COALESCE(array_to_string(list_transform({expr}, "
            f"x -> {elem_canon}), chr(31)), '') END"
        )
        return f"COALESCE({portable_char_hash_sql(joined)}, {NULL_SENTINEL})"
    elif t.endswith("[]") and not t.startswith(("DOUBLE", "FLOAT", "REAL")):
        # DuckDB's array_to_string([]) is NULL where Spark's array_join
        # is '' — re-split NULL list (→ sentinel) from empty list (→ '')
        joined = (
            f"CASE WHEN ({expr}) IS NULL THEN NULL ELSE "
            f"COALESCE(array_to_string(list_transform({expr}, "
            f"x -> COALESCE(CAST(x AS VARCHAR), chr(0))), chr(31)), '') END"
        )
        return f"COALESCE({portable_char_hash_sql(joined)}, {NULL_SENTINEL})"
    else:
        raise TypeError(f"no portable canonicalization for DuckDB type {t}")
    return f"COALESCE({pm.format(v=v)}, {NULL_SENTINEL})"


def digest_sql(
    inner_sql: str,
    columns: list[tuple[str, str]],
    buckets: int = DEFAULT_BUCKETS,
) -> str:
    """DuckDB digest of an arbitrary query — same fold, same buckets.

    ``columns``: (name, duck_type) pairs, e.g. from
    ``con.execute(f"DESCRIBE {inner_sql}").fetchall()``.
    """
    fold = "0"
    for name, duck_type in sorted(columns, key=lambda nt: nt[0]):
        canon = _canon_sql(f'"{name}"', duck_type)
        fold = f"((({fold}) * {FOLD_K} + {canon}) % {MOD})"
    return (
        f"WITH __digest_src AS ({inner_sql}),\n"
        f" __fp AS (SELECT {fold} AS fp FROM __digest_src)\n"
        f"SELECT fp % {buckets} AS bucket, COUNT(*) AS n, SUM(fp) AS s\n"
        f"FROM __fp GROUP BY 1"
    )
