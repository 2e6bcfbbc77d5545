"""Merge-on-read deletes (key tombstones): no data rewrite on delete,
sequence-aware visibility (re-inserts resurrect), physical application
on compact, and interaction with merge/overwrite/skipping reads."""

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
    w = TransactionalWarehouse(spark, str(tmp_path / "mor_wh"))
    w.register_table("kv", SCHEMA, primary_key=("k",))
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def _state(wh):
    return {r["k"]: r["v"] for r in wh.read("kv").collect()}


def test_delete_hides_rows_without_rewriting_data(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "kv")
    data_runs_before = wh.committed_runs_for("kv")
    n = wh.delete_where("kv", F.col("k") == 2)
    assert n == 1
    assert _state(wh) == {1: "a", 3: "c"}
    # merge-on-read: the data runs are untouched — only a tombstone commit
    assert wh.committed_runs_for("kv") == data_runs_before
    assert wh.history()[-1]["operation"] == "delete"


def test_delete_requires_primary_key(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "nopk_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    with pytest.raises(ValueError, match="primary_key"):
        w.delete_where("kv", F.col("k") == 1)


def test_reinsert_after_delete_is_visible(spark, wh):
    """Sequence-aware tombstones: a row committed AFTER the delete wins —
    append, then delete, then re-append the same key."""
    wh.append(_df(spark, [(1, "old")]), "kv")
    wh.delete_where("kv", F.col("k") == 1)
    assert _state(wh) == {}
    wh.append(_df(spark, [(1, "new")]), "kv")
    assert _state(wh) == {1: "new"}
    # and deleting again hides the new row too
    wh.delete_where("kv", F.col("k") == 1)
    assert _state(wh) == {}


def test_time_travel_sees_pre_delete_rows(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b")]), "kv")
    pre = wh.snapshots()[-1]["seq"]
    wh.delete_where("kv", F.col("k") == 1)
    assert {r["k"] for r in wh.read("kv", as_of=pre).collect()} == {1, 2}
    assert _state(wh) == {2: "b"}


def test_compact_applies_and_retires_tombstones(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "kv")
    wh.delete_where("kv", F.col("k").isin(1, 3))
    wh.compact("kv")
    tomb = wh._tombstone_table("kv")
    assert wh.committed_runs_for(tomb) == []  # applied + retired
    assert _state(wh) == {2: "b"}
    # a fresh re-insert of a formerly deleted key is plainly visible
    wh.append(_df(spark, [(1, "back")]), "kv")
    assert _state(wh) == {1: "back", 2: "b"}


def test_merge_and_overwrite_do_not_resurrect_deleted_rows(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), "kv")
    wh.delete_where("kv", F.col("k") == 1)
    # merge touches the run containing k=1; its rewrite must not revive it
    wh.merge(_df(spark, [(2, "B")]), "kv", ["k"])
    assert _state(wh) == {2: "B", 3: "c"}
    # overwrite_where on a range excluding the deleted key: same contract
    wh.delete_where("kv", F.col("k") == 3)
    wh.overwrite_where(_df(spark, [(2, "B2")]), "kv", F.col("k") == 2)
    assert _state(wh) == {2: "B2"}


def test_skipping_read_respects_tombstones(spark, wh):
    rows = [(k, f"v{k}") for k in range(40)]
    wh.append(_df(spark, rows), "kv")
    wh.build_stats_index("kv", ["k"])
    wh.delete_where("kv", F.col("k") == 15)
    df, _ = wh.read_skipping("kv", {"k": (10, 20)})
    got = sorted(r["k"] for r in df.filter(F.col("k").between(10, 20)).collect())
    assert got == [10, 11, 12, 13, 14, 16, 17, 18, 19, 20]
