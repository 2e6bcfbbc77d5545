"""Digest operator invariants: the scale ladder's compare unit must be
sensitive (any row/value change moves the digest), portable (Spark and
DuckDB produce identical digests), and honest about what it cannot
canonicalize."""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators.fingerprint import (
    digest_sql,
    table_digest,
)


def _digest_set(df):
    return {(r.bucket, r.n, r.s) for r in table_digest(df).collect()}


@pytest.fixture
def typed_df(spark):
    schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("arr", T.ArrayType(T.StringType())),
        ]
    )
    import datetime

    rows = [
        (1, "alpha", 1.25, True, datetime.datetime(2024, 1, 1), ["x", "y"]),
        (2, "beta", -3.5, False, datetime.datetime(2024, 6, 1), []),
        (3, None, None, None, None, None),
        (4, "", 0.0, True, datetime.datetime(1969, 12, 31), ["x", None]),
    ]
    return spark.createDataFrame(rows, schema)


def test_digest_matches_duckdb_on_all_branches(spark, typed_df):
    """Every canonicalization branch (integral, string incl. empty,
    double incl. negative/zero, boolean, pre-epoch timestamp, array incl.
    empty/NULL-element/NULL) digests identically in both engines."""
    con = duckdb.connect()
    con.register("src_arrow", typed_df.toPandas())
    cols = [
        ("i", "BIGINT"),
        ("s", "VARCHAR"),
        ("d", "DOUBLE"),
        ("b", "BOOLEAN"),
        ("ts", "TIMESTAMP"),
        ("arr", "VARCHAR[]"),
    ]
    duck = {
        tuple(r)
        for r in con.execute(
            digest_sql("SELECT * FROM src_arrow", cols)
        ).fetchall()
    }
    assert _digest_set(typed_df) == duck


def test_digest_distinguishes_null_empty_and_zero(spark):
    """Within a column's type, NULL vs '' / NULL vs [] / NULL vs 0 must
    digest differently — sentinel collapsing would pass wrong results.
    (Cross-TYPE collisions — a NULL string vs a NULL array — are fine:
    both engines see the same fixed result schema, so values of
    different types never compare against each other.)"""
    def one(v, t):
        return _digest_set(
            spark.createDataFrame([(v,)], T.StructType([T.StructField("c", t)]))
        )

    assert one(None, T.StringType()) != one("", T.StringType())
    arr_t = T.ArrayType(T.StringType())
    assert one(None, arr_t) != one([], arr_t)
    assert one(None, T.LongType()) != one(0, T.LongType())
    assert one(None, T.DoubleType()) != one(0.0, T.DoubleType())


def test_digest_sensitive_to_any_row_change(spark):
    base = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    changed_value = base.withColumn(
        "v", F.when(F.col("id") == 513, F.lit("vX")).otherwise(F.col("v"))
    )
    dropped = base.filter(F.col("id") != 513)
    duplicated = base.unionAll(base.filter(F.col("id") == 513))
    d0 = _digest_set(base)
    assert _digest_set(changed_value) != d0
    assert _digest_set(dropped) != d0
    assert _digest_set(duplicated) != d0, "multiplicity must move the digest"


def test_digest_order_and_partitioning_invariant(spark):
    base = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    shuffled = base.orderBy(F.desc("id")).repartition(13)
    assert _digest_set(base) == _digest_set(shuffled)


def test_digest_float_arrays_cross_engine(spark):
    """Float arrays digest portably (per-element scalar-double canon →
    string join → char hash) including NULL element / empty / NULL array."""
    rows = [(1, [0.5, -0.25, None]), (2, []), (3, None), (4, [1.5e11, -2.0])]
    sdf = spark.createDataFrame(rows, "id long, v array<double>")
    con = duckdb.connect()
    con.execute("CREATE TABLE edge(id BIGINT, v DOUBLE[])")
    con.execute(
        "INSERT INTO edge VALUES (1, [0.5, -0.25, NULL]), (2, []), "
        "(3, NULL), (4, [1.5e11, -2.0])"
    )
    cols = [
        (r[0], r[1])
        for r in con.execute("DESCRIBE SELECT * FROM edge").fetchall()
    ]
    duck = {
        (int(a), int(b), int(c))
        for a, b, c in con.execute(
            digest_sql("SELECT * FROM edge", cols)
        ).fetchall()
    }
    assert _digest_set(sdf) == duck
    # Sensitivity: a single-element change moves the digest.
    changed = spark.createDataFrame(
        [(1, [0.5, -0.250001, None]), (2, []), (3, None), (4, [1.5e11, -2.0])],
        "id long, v array<double>",
    )
    assert _digest_set(changed) != _digest_set(sdf)


def test_digest_rejects_unportable_types(spark):
    df = spark.createDataFrame(
        [({"k": 1.0},)],
        T.StructType(
            [T.StructField("m", T.MapType(T.StringType(), T.DoubleType()))]
        ),
    )
    with pytest.raises(TypeError):
        table_digest(df)
    with pytest.raises(TypeError):
        digest_sql("SELECT 1", [("m", "MAP(VARCHAR, DOUBLE)")])


def test_digest_rejects_wide_decimals(spark):
    """DECIMAL(38,6): Spark's scaled multiply would silently null while
    the DuckDB twin's BIGINT cast would error — the canon refuses both
    sides loudly instead of letting the engines diverge."""
    df = spark.range(1).select(
        F.col("id").cast(T.DecimalType(38, 6)).alias("d")
    )
    with pytest.raises(TypeError):
        table_digest(df)
    with pytest.raises(TypeError):
        digest_sql("SELECT 1", [("d", "DECIMAL(38,6)")])
    # Narrow decimals stay supported (TPC-H money is DECIMAL(15,2)).
    ok = spark.range(3).select(
        F.col("id").cast(T.DecimalType(15, 2)).alias("d")
    )
    assert len(_digest_set(ok)) > 0
    digest_sql("SELECT 1", [("d", "DECIMAL(15,2)")])
