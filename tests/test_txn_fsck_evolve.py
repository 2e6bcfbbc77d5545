"""MERGE schema auto-evolution and the fsck integrity audit."""

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "fe_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def test_merge_auto_evolve_adds_source_columns(spark, wh):
    wh.append(_df(spark, [(1, 10), (2, 20)]), "kv")
    wide = spark.createDataFrame(
        [Row(k=2, v=21, note="upd"), Row(k=3, v=30, note="new")],
        T.StructType(
            SCHEMA.fields + [T.StructField("note", T.StringType(), True)]
        ),
    )
    res = wh.merge(wide, "kv", ["k"], auto_evolve=True)
    assert res["committed"]
    assert wh.table_schema("kv").fieldNames() == ["k", "v", "note"]
    got = {r["k"]: (r["v"], r["note"]) for r in wh.read("kv").collect()}
    # untouched row null-fills the new column; merged rows carry it
    assert got == {1: (10, None), 2: (21, "upd"), 3: (30, "new")}


def test_merge_without_auto_evolve_drops_extra_columns(spark, wh):
    wh.append(_df(spark, [(1, 10)]), "kv")
    wide = spark.createDataFrame(
        [Row(k=1, v=11, note="x")],
        T.StructType(
            SCHEMA.fields + [T.StructField("note", T.StringType(), True)]
        ),
    )
    wh.merge(wide, "kv", ["k"])
    assert wh.table_schema("kv").fieldNames() == ["k", "v"]
    assert {r["k"]: r["v"] for r in wh.read("kv").collect()} == {1: 11}


def test_fsck_clean_warehouse_reports_nothing(spark, wh):
    wh.append(_df(spark, [(1, 1)]), "kv")
    assert wh.fsck() == {}


def test_fsck_classifies_missing_dead_and_orphans(spark, wh):
    wh.append(_df(spark, [(1, 1)]), "kv")
    wh.append(_df(spark, [(2, 2)]), "kv")
    wh.compact("kv")  # retires the two appends -> dead runs
    report = wh.fsck()
    assert len(report["kv"]["dead"]) == 2
    assert report["kv"]["missing"] == []

    # an aborted transaction leaves an orphan staging dir
    txn = wh.begin()
    txn.stage(_df(spark, [(9, 9)]), "kv")
    report = wh.fsck()
    assert report["kv"]["orphans"], report
    txn.abort()

    # out-of-band deletion of a LIVE run is real corruption
    live = wh.committed_runs_for("kv")[0]
    shutil.rmtree(wh.run_dir("kv", live))
    report = wh.fsck()
    assert report["kv"]["missing"] == [live]


def test_fsck_clean_after_vacuum(spark, wh):
    wh.append(_df(spark, [(1, 1)]), "kv")
    wh.append(_df(spark, [(2, 2)]), "kv")
    wh.compact("kv")
    wh.vacuum()
    assert wh.fsck() == {}


def test_type_widening_int_to_long_and_float_to_double(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "wide_wh"))
    narrow = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("n", T.IntegerType(), True),
            T.StructField("x", T.FloatType(), True),
        ]
    )
    w.register_table("t", narrow, primary_key=("k",))
    w.create_all()
    w.append(
        spark.createDataFrame([Row(k=1, n=7, x=1.5)], narrow), "t"
    )
    wide = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("n", T.LongType(), True),
            T.StructField("x", T.DoubleType(), True),
        ]
    )
    w.register_table("t", wide, primary_key=("k",))
    assert w.table_schema("t")["n"].dataType == T.LongType()
    # old narrow file upcasts; new wide rows coexist
    w.append(
        spark.createDataFrame([Row(k=2, n=2**40, x=2.25)], wide), "t"
    )
    got = {r["k"]: (r["n"], r["x"]) for r in w.read("t").collect()}
    assert got == {1: (7, 1.5), 2: (2**40, 2.25)}
    # MoR delete still works across the widening (tombstone widened too)
    w.delete_where("t", F.col("k") == 1)
    assert {r["k"] for r in w.read("t").collect()} == {2}


def test_narrowing_and_retype_still_rejected(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "narrow_wh"))
    s = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    w.register_table("t", s)
    with pytest.raises(ValueError, match="widening"):
        w.register_table(
            "t",
            T.StructType(
                [
                    T.StructField("k", T.LongType(), False),
                    T.StructField("v", T.IntegerType(), True),  # narrowing
                ]
            ),
        )
    with pytest.raises(ValueError, match="widening"):
        w.register_table(
            "t",
            T.StructType(
                [
                    T.StructField("k", T.LongType(), False),
                    T.StructField("v", T.StringType(), True),  # retype
                ]
            ),
        )
