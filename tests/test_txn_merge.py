"""Copy-on-write MERGE (upsert) on the transactional warehouse:
run-granularity pruning, atomicity, idempotent replay, and optimistic
conflict detection.

(Value correctness of the end-to-end shape is the registered
``txn_merge_upsert`` oracle; these tests pin the physical and
failure-path semantics an oracle can't reach.)
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    ConcurrentMergeError,
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
    w = TransactionalWarehouse(spark, str(tmp_path / "merge_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def _state(wh):
    return {r["k"]: r["v"] for r in wh.read("kv").collect()}


def test_merge_updates_and_inserts(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b")]), "kv")
    res = wh.merge(_df(spark, [(2, "B"), (3, "C")]), "kv", ["k"])
    assert res["committed"] is True
    assert _state(wh) == {1: "a", 2: "B", 3: "C"}


def test_merge_rewrites_only_runs_containing_matched_keys(spark, wh):
    """The copy-on-write pruning contract: a run with no matched key keeps
    its files — only runs containing a source key are retired/rewritten."""
    txn = wh.begin("run-a")
    txn.stage(_df(spark, [(1, "a"), (2, "b")]), "kv")
    txn.commit()
    txn = wh.begin("run-b")
    txn.stage(_df(spark, [(3, "c"), (4, "d")]), "kv")
    txn.commit()

    res = wh.merge(_df(spark, [(3, "C"), (9, "I")]), "kv", ["k"])
    assert res["rewritten_runs"] == ["run-b"]
    assert res["untouched_runs"] == ["run-a"]
    # run-a is still live (its files were never touched); run-b retired
    live = wh.committed_runs_for("kv")
    assert "run-a" in live and "run-b" not in live
    assert _state(wh) == {1: "a", 2: "b", 3: "C", 4: "d", 9: "I"}


def test_merge_into_empty_table_is_pure_insert(spark, wh):
    res = wh.merge(_df(spark, [(1, "a")]), "kv", ["k"])
    assert res["committed"] is True and res["rewritten_runs"] == []
    assert _state(wh) == {1: "a"}


def test_merge_batch_id_replay_is_noop(spark, wh):
    wh.append(_df(spark, [(1, "a")]), "kv")
    r1 = wh.merge(_df(spark, [(1, "A")]), "kv", ["k"], batch_id="m1")
    assert r1["committed"] is True
    r2 = wh.merge(_df(spark, [(1, "XXX")]), "kv", ["k"], batch_id="m1")
    assert r2["committed"] is False
    assert _state(wh) == {1: "A"}


def test_merge_time_travel_sees_pre_merge_state(spark, wh):
    wh.append(_df(spark, [(1, "a"), (2, "b")]), "kv")
    pre = wh.snapshots()[-1]["seq"]
    wh.merge(_df(spark, [(2, "B")]), "kv", ["k"])
    old = {r["k"]: r["v"] for r in wh.read("kv", as_of=pre).collect()}
    assert old == {1: "a", 2: "b"}
    assert _state(wh) == {1: "a", 2: "B"}


def test_overwrite_where_replaces_matching_rows_atomically(spark, wh):
    """replaceWhere semantics: matching rows deleted + source inserted in
    one commit; runs the predicate never touches keep their files."""
    from pyspark.sql import functions as F

    txn = wh.begin("low")
    txn.stage(_df(spark, [(1, "a"), (2, "b")]), "kv")
    txn.commit()
    txn = wh.begin("high")
    txn.stage(_df(spark, [(10, "x"), (11, "y")]), "kv")
    txn.commit()

    res = wh.overwrite_where(
        _df(spark, [(10, "X"), (12, "Z")]), "kv", F.col("k") >= 10
    )
    assert res["rewritten_runs"] == ["high"]
    assert res["untouched_runs"] == ["low"]
    # 11 deleted by the predicate (not re-inserted), 10 replaced, 12 new
    assert _state(wh) == {1: "a", 2: "b", 10: "X", 12: "Z"}
    # idempotent backfill: replaying under the same batch_id is a no-op
    wh.overwrite_where(
        _df(spark, [(10, "X2")]), "kv", F.col("k") >= 10, batch_id="bf"
    )
    r2 = wh.overwrite_where(
        _df(spark, [(10, "LOST")]), "kv", F.col("k") >= 10, batch_id="bf"
    )
    assert r2["committed"] is False
    assert _state(wh)[10] == "X2"


def test_merge_on_partitioned_table(spark, tmp_path):
    """Run-granularity merge must survive hive-partitioned table layout:
    partition values live in directory names, and the surviving-rows read
    over bare run dirs must still recover them."""
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
            T.StructField("part", T.StringType(), True),
        ]
    )
    w = TransactionalWarehouse(spark, str(tmp_path / "pmerge_wh"))
    w.register_table("pkv", schema, partition_by=("part",))
    w.create_all()

    def df(rows):
        return spark.createDataFrame(
            [Row(k=k, v=v, part=p) for k, v, p in rows], schema
        )

    w.append(df([(1, "a", "x"), (2, "b", "y")]), "pkv")
    res = w.merge(df([(2, "B", "y"), (3, "C", "x")]), "pkv", ["k"])
    assert res["committed"] is True
    got = {r["k"]: (r["v"], r["part"]) for r in w.read("pkv").collect()}
    assert got == {1: ("a", "x"), 2: ("B", "y"), 3: ("C", "x")}
    # partition pruning still applies on the partition column
    assert {
        r["k"] for r in w.read("pkv").filter(F.col("part") == "x").collect()
    } == {1, 3}


def test_optimize_zorder_rewrites_atomically_preserving_data(spark, wh):
    """OPTIMIZE ZORDER as a transactional rewrite: same rows, one new
    clustered run replacing the old ones, pre-optimize snapshot still
    time-travelable."""
    rows = [(i, f"v{i}") for i in range(100)]
    wh.append(_df(spark, rows[:50]), "kv")
    wh.append(_df(spark, rows[50:]), "kv")
    pre = wh.snapshots()[-1]["seq"]

    n_files = wh.optimize("kv", zorder_by=("k", "k"), target_file_mb=1)
    assert n_files >= 1
    assert _state(wh) == dict(rows)
    # one live run now (the rewrite), old runs retired
    assert len(wh.committed_runs_for("kv")) == 1
    # time travel to the pre-optimize snapshot still serves the old runs
    assert {
        r["k"] for r in wh.read("kv", as_of=pre).collect()
    } == {k for k, _ in rows}


def test_concurrent_append_during_merge_raises_and_publishes_nothing(
    spark, wh, monkeypatch
):
    """A commit landing between the merge's key scan and its own commit
    must abort the merge (its replaces set is stale) with zero effect."""
    wh.append(_df(spark, [(1, "a")]), "kv")

    original = TransactionalWarehouse.begin

    def begin_and_race(self, batch_id=None, **kw):
        txn = original(self, batch_id, **kw)
        # interleave a concurrent append AFTER the merge read its live set
        monkeypatch.setattr(TransactionalWarehouse, "begin", original)
        wh.append(_df(spark, [(5, "e")]), "kv")
        return txn

    monkeypatch.setattr(TransactionalWarehouse, "begin", begin_and_race)
    with pytest.raises(ConcurrentMergeError):
        wh.merge(_df(spark, [(1, "A")]), "kv", ["k"])
    # nothing from the merge is visible; the concurrent append is intact
    assert _state(wh) == {1: "a", 5: "e"}
