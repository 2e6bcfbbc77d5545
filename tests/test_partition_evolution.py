"""Partition evolution (Iceberg evolve-spec): a metadata commit switches
the write-time layout; old and new directory layouts coexist under one
logical table, and compaction migrates data to the current spec."""

import os

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
        T.StructField("bucket", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "pe_wh"))
    w.register_table("m", SCHEMA)
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, bucket=b, v=float(k)) for k, b in rows], SCHEMA
    )


def _state(wh):
    return {r["k"]: (r["bucket"], r["v"]) for r in wh.read("m").collect()}


def test_evolved_spec_applies_to_new_runs_only(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b")]), "m")
    run1 = wh.committed_runs_for("m")[0]
    wh.set_partition_spec("m", ("bucket",))
    assert wh.partition_columns("m") == ["bucket"]
    wh.append(_df(spark, [(3, "a"), (4, "b")]), "m")
    run2 = [r for r in wh.committed_runs_for("m") if r != run1][0]
    # old run: flat layout; new run: hive bucket= dirs
    assert not any(
        d.startswith("bucket=")
        for d in os.listdir(wh.run_dir("m", run1))
    )
    assert any(
        d.startswith("bucket=")
        for d in os.listdir(wh.run_dir("m", run2))
    )
    # one logical table across both layouts
    assert _state(wh) == {
        1: ("a", 1.0), 2: ("b", 2.0), 3: ("a", 3.0), 4: ("b", 4.0),
    }
    assert wh.history()[-2]["operation"] == "set_partition_spec"


def test_compaction_migrates_to_current_spec(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b")]), "m")
    wh.set_partition_spec("m", ("bucket",))
    wh.compact("m")
    live = wh.committed_runs_for("m")
    assert len(live) == 1
    assert any(
        d.startswith("bucket=") for d in os.listdir(wh.run_dir("m", live[0]))
    )
    assert _state(wh) == {1: ("a", 1.0), 2: ("b", 2.0)}


def test_spec_visible_to_fresh_process(spark, wh, tmp_path):
    wh.append(_df(spark, [(1, "a")]), "m")
    wh.set_partition_spec("m", ("bucket",))
    w2 = TransactionalWarehouse(spark, str(tmp_path / "pe_wh"))
    w2.register_table("m", SCHEMA)  # registers the ORIGINAL flat spec
    assert w2.partition_columns("m") == ["bucket"]
    w2.append(_df(spark, [(2, "b")]), "m")
    assert {r["k"] for r in w2.read("m").collect()} == {1, 2}
    # re-registering with the evolved spec is accepted too
    w3 = TransactionalWarehouse(spark, str(tmp_path / "pe_wh"))
    w3.register_table("m", SCHEMA, partition_by=("bucket",))
    assert {r["k"] for r in w3.read("m").collect()} == {1, 2}


def test_spec_composes_with_rename(spark, wh):
    wh.append(_df(spark, [(1, "a")]), "m")
    wh.set_partition_spec("m", ("bucket",))
    wh.append(_df(spark, [(2, "b")]), "m")
    wh.rename_column("m", "v", "val")
    wh.append(
        spark.createDataFrame(
            [Row(k=3, bucket="c", val=3.0)],
            T.StructType(
                [
                    T.StructField("k", T.LongType(), False),
                    T.StructField("bucket", T.StringType(), True),
                    T.StructField("val", T.DoubleType(), True),
                ]
            ),
        ),
        "m",
    )
    got = {r["k"]: (r["bucket"], r["val"]) for r in wh.read("m").collect()}
    assert got == {1: ("a", 1.0), 2: ("b", 2.0), 3: ("c", 3.0)}


def test_spec_rejections_and_noop(spark, wh):
    with pytest.raises(ValueError, match="not in"):
        wh.set_partition_spec("m", ("nope",))
    with pytest.raises(ValueError, match="built-in"):
        wh.set_partition_spec("patients", ("id",))
    n = len(wh.history())
    wh.set_partition_spec("m", ())  # already the current spec -> no-op
    assert len(wh.history()) == n
