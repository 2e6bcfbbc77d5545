"""Copy-on-write UPDATE ... SET on the transactional warehouse.

Covers: predicate-scoped assignment, old-row semantics (SET a=b, b=a
swaps), run-granularity pruning, SQL NULL-predicate behavior, unknown
columns, batch_id idempotency, and interplay with merge-on-read
tombstones.
"""

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
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.LongType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "upd_wh"))
    w.register_table("kv", SCHEMA, primary_key=("k",))
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, a=a, b=b) for k, a, b in rows], SCHEMA)


def _state(wh):
    return {r["k"]: (r["a"], r["b"]) for r in wh.read("kv").collect()}


def test_update_applies_only_to_matching_rows(spark, wh):
    wh.append(_df(spark, [(1, 10, 0), (2, 20, 0), (3, 30, 0)]), "kv")
    res = wh.update_where("kv", F.col("k") >= 2, {"a": F.col("a") + 1})
    assert res["committed"]
    assert _state(wh) == {1: (10, 0), 2: (21, 0), 3: (31, 0)}


def test_update_assignments_see_old_row(spark, wh):
    # SQL UPDATE semantics: SET a=b, b=a swaps (both read the OLD row)
    wh.append(_df(spark, [(1, 1, 2)]), "kv")
    wh.update_where("kv", F.lit(True), {"a": F.col("b"), "b": F.col("a")})
    assert _state(wh) == {1: (2, 1)}


def test_update_null_predicate_rows_untouched(spark, wh):
    # k=2 has a NULL in the predicate column -> NULL predicate -> no update
    wh.append(_df(spark, [(1, 5, 0), (2, None, 0)]), "kv")
    wh.update_where("kv", F.col("a") > 0, {"b": F.lit(9)})
    assert _state(wh) == {1: (5, 9), 2: (None, 0)}


def test_update_run_granularity_pruning(spark, wh):
    for label, rows in (("r1", [(1, 1, 0)]), ("r2", [(2, 2, 0)])):
        txn = wh.begin(label)
        txn.stage(_df(spark, rows), "kv")
        txn.commit()
    res = wh.update_where("kv", F.col("k") == 2, {"b": F.lit(7)})
    assert res["rewritten_runs"] == ["r2"]
    assert res["untouched_runs"] == ["r1"]
    assert _state(wh) == {1: (1, 0), 2: (2, 7)}
    # history records the verb
    assert wh.history()[-1]["operation"] == "update"


def test_update_no_matches_rewrites_nothing(spark, wh):
    wh.append(_df(spark, [(1, 1, 1)]), "kv")
    live = wh.committed_runs_for("kv")
    res = wh.update_where("kv", F.col("k") == 99, {"a": F.lit(0)})
    assert res["rewritten_runs"] == []
    assert wh.committed_runs_for("kv") == live
    assert _state(wh) == {1: (1, 1)}


def test_update_unknown_column_raises(spark, wh):
    wh.append(_df(spark, [(1, 1, 1)]), "kv")
    with pytest.raises(ValueError, match="unknown column"):
        wh.update_where("kv", F.lit(True), {"nope": F.lit(1)})
    assert _state(wh) == {1: (1, 1)}


def test_update_batch_id_idempotent(spark, wh):
    wh.append(_df(spark, [(1, 1, 0)]), "kv")
    r1 = wh.update_where("kv", F.col("k") == 1, {"a": F.col("a") + 1},
                         batch_id="upd-1")
    assert r1["committed"]
    # replay: no-op, value unchanged (not incremented twice)
    r2 = wh.update_where("kv", F.col("k") == 1, {"a": F.col("a") + 1},
                         batch_id="upd-1")
    assert not r2["committed"]
    assert _state(wh) == {1: (2, 0)}


def test_update_respects_mor_tombstones(spark, wh):
    # a MoR-deleted row must not be resurrected by an update rewrite
    wh.append(_df(spark, [(1, 1, 0), (2, 2, 0)]), "kv")
    wh.delete_where("kv", F.col("k") == 1)
    wh.update_where("kv", F.lit(True), {"b": F.lit(5)})
    assert _state(wh) == {2: (2, 5)}


def test_update_time_travel_sees_pre_update_state(spark, wh):
    wh.append(_df(spark, [(1, 1, 0)]), "kv")
    before = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.lit(True), {"a": F.lit(99)})
    assert _state(wh) == {1: (99, 0)}
    old = {
        r["k"]: (r["a"], r["b"])
        for r in wh.read("kv", as_of=before).collect()
    }
    assert old == {1: (1, 0)}
