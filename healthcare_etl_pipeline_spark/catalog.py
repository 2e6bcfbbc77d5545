"""Testdata catalog: schemas and loaders for the driver-provided tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under a
scale-factor directory.

Design notes for 100 TB:
- Explicit schemas (no inference) so plans are stable and the vectorized
  parquet reader engages immediately.
- ``load_table`` returns a lazy DataFrame; filters/projections applied by the
  caller push down to the parquet scan (verify with ``.explain`` →
  PushedFilters / ReadSchema).
- Dimension tables (region, nation, supplier, part at TPC-H ratios) stay
  broadcast-size even at 100 TB lineitem; ``is_dimension`` lets operators pick
  broadcast joins declaratively.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Per-SESSION scan memo (weak keys: a stopped session's entries vanish
# with it). Values are lazy DataFrames — plan templates, not data.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimensions small enough to broadcast at any realistic scale factor.
DIMENSION_TABLES = {"region", "nation", "supplier", "part"}

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def events_ts_is_nanos(sf_dir: str) -> bool:
    """True when the events parquet stores ts as INT64 TIMESTAMP(NANOS).

    Driver-side footer probe (pyarrow reads only file metadata) — testdata
    vintages differ: some store nanos (which Spark's reader rejects without
    the legacy conf), newer ones store standard microsecond timestamps.
    """
    import glob

    import pyarrow.parquet as pq

    path = table_path(sf_dir, "events")
    if os.path.isdir(path):
        # Spark-written table: a directory of part files (plus _SUCCESS)
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return False  # empty write — no data files, nothing nanos-typed
        path = parts[0]
    ts_type = pq.read_schema(path).field("ts").type
    return str(ts_type) == "timestamp[ns]"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table.

    ``events.ts`` is normalized to TIMESTAMP_NTZ at microsecond precision
    regardless of the physical encoding: nanos-vintage files are read as
    nanos-since-epoch (legacy conf) and rebuilt, truncating the same way
    DuckDB does; micros-vintage files are read natively.

    The returned (immutable, lazy) DataFrame is memoized per live
    session + (sf_dir, name): building ``spark.read.parquet`` costs
    ~0.1 s of py4j round-trips + a footer read, and a 20-query bench or
    a multi-table query pays it once per TABLE instead of once per
    REFERENCE. The testdata dirs are read-only, so the cached scan's
    footer schema cannot go stale; the plan itself re-lists files at
    execution like any parquet scan.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    memo_key = (os.path.abspath(sf_dir), name)
    try:
        session_memo = _TABLE_MEMO.setdefault(spark, {})
        if memo_key in session_memo:
            return session_memo[memo_key]
    except TypeError:  # unhashable/mock session in a unit test
        session_memo = None
    df = _load_table_uncached(spark, sf_dir, name)
    if session_memo is not None:
        session_memo[memo_key] = df
    return df


def _load_table_uncached(
    spark: SparkSession, sf_dir: str, name: str
) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F

        if not events_ts_is_nanos(sf_dir):
            raw = spark.read.parquet(table_path(sf_dir, name))
            return raw.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        # The legacy conf is captured into the plan at read time, so it can
        # be restored immediately — a later nanos-typed parquet read
        # elsewhere in the session then still fails loudly instead of
        # silently coming back as bigint.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            raw = spark.read.parquet(table_path(sf_dir, name))
            return raw.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz"),
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def is_dimension(name: str) -> bool:
    return name in DIMENSION_TABLES
