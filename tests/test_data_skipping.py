"""File-level data skipping over the transactional warehouse: min/max
stats index builds, prunes files, never loses rows on a stale index."""

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
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "skip_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    return w


def _append_range(spark, wh, lo, hi, n_files=3):
    df = spark.createDataFrame(
        [Row(k=k, v=f"v{k}") for k in range(lo, hi)], SCHEMA
    ).repartitionByRange(n_files, "k")
    wh.append(df, "kv")


def test_skipping_prunes_files_and_matches_full_read(spark, wh):
    _append_range(spark, wh, 0, 60)
    _append_range(spark, wh, 60, 120)
    n = wh.build_stats_index("kv", ["k"])
    assert n >= 4  # multiple files per run

    df, report = wh.read_skipping("kv", {"k": (10, 20)})
    assert report["files_read"] < report["files_total"]
    assert report["runs_uncovered"] == []
    got = sorted(r["k"] for r in df.filter(F.col("k").between(10, 20)).collect())
    assert got == list(range(10, 21))
    # the skipped frame is a superset of the exact result, never a subset
    assert df.filter(F.col("k").between(10, 20)).count() == 11


def test_stale_index_falls_back_to_full_read_of_new_runs(spark, wh):
    _append_range(spark, wh, 0, 50)
    wh.build_stats_index("kv", ["k"])
    # commit AFTER the build: index is stale for this run
    _append_range(spark, wh, 50, 100)
    df, report = wh.read_skipping("kv", {"k": (40, 60)})
    assert len(report["runs_uncovered"]) == 1
    got = sorted(r["k"] for r in df.filter(F.col("k").between(40, 60)).collect())
    assert got == list(range(40, 61))  # rows from BOTH runs, none lost


def test_out_of_range_bounds_select_no_covered_files(spark, wh):
    _append_range(spark, wh, 0, 50)
    wh.build_stats_index("kv", ["k"])
    df, report = wh.read_skipping("kv", {"k": (1000, 2000)})
    assert report["files_read"] == 0
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_index_excludes_compacted_away_runs(spark, wh):
    """Stats rows whose files were superseded by a compaction must not be
    served: the compacted run is uncovered (full read), old entries dead."""
    _append_range(spark, wh, 0, 50)
    _append_range(spark, wh, 50, 100)
    wh.build_stats_index("kv", ["k"])
    wh.compact("kv")
    df, report = wh.read_skipping("kv", {"k": (10, 20)})
    assert report["files_read"] == 0  # all covered entries retired
    assert len(report["runs_uncovered"]) == 1
    got = sorted(r["k"] for r in df.filter(F.col("k").between(10, 20)).collect())
    assert got == list(range(10, 21))


def test_unindexed_column_raises(spark, wh):
    _append_range(spark, wh, 0, 10)
    wh.build_stats_index("kv", ["k"])
    with pytest.raises(KeyError):
        wh.read_skipping("kv", {"v": (None, "x")})
