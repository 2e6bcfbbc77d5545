"""Round-4 hardening of the transactional warehouse: concurrent
committers, crash-between-claim-and-marker, same-batch_id races, CDC
window expiry after vacuum, and additive schema evolution.

The reference sidesteps all of this by delegating to Postgres
(app/api/routes.py:148 — one session.commit()); a file-backed table
format must provide it explicitly, the way Iceberg/Delta do.
"""

import json
import os
import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    IncrementalWindowExpiredError,
    TransactionalWarehouse,
)


@pytest.fixture
def twh(spark, tmp_path):
    wh = TransactionalWarehouse(spark, str(tmp_path / "txn_warehouse"))
    wh.create_all()
    return wh


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)


def _commit_one(wh, spark, i, results):
    txn = wh.begin(f"writer-{i}")
    df = spark.createDataFrame([Row(k=f"w{i}", v=i)], EVENTS_SCHEMA)
    txn.stage(df, "events")
    results[i] = txn.commit()


def test_concurrent_committers_serialize_seqs(spark, twh):
    """N threads committing at once: every commit wins, seqs are strictly
    serialized (no ties, no gaps among winners beyond crash holes), and
    time travel to each snapshot is stable."""
    twh.register_table("events", EVENTS_SCHEMA)
    n = 8
    results = {}
    threads = [
        threading.Thread(target=_commit_one, args=(twh, spark, i, results))
        for i in range(n)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(results[i] for i in range(n)), results

    snaps = twh.snapshots()
    seqs = [s["seq"] for s in snaps]
    assert len(seqs) == n
    assert len(set(seqs)) == n, f"tied snapshot seqs: {seqs}"
    assert seqs == sorted(seqs)

    # the full table has exactly one row per writer
    rows = {r["k"]: r["v"] for r in twh.read("events").collect()}
    assert rows == {f"w{i}": i for i in range(n)}

    # as_of each snapshot prefix is stable: k rows at snapshot k
    for idx, s in enumerate(snaps, start=1):
        assert twh.read("events", as_of=s["seq"]).count() == idx


def test_crash_between_claim_and_marker_leaves_hole_not_corruption(spark, twh):
    """A committer that claims a seq and dies before the marker leaves an
    unused seq — later commits skip past it and readers never notice."""
    twh.register_table("events", EVENTS_SCHEMA)
    df = spark.createDataFrame([Row(k="a", v=1)], EVENTS_SCHEMA)
    twh.append(df, "events")
    # simulate the crash: claim a seq with no marker ever written
    orphan_seq = twh._claim_seq("dead-writer")
    twh.append(spark.createDataFrame([Row(k="b", v=2)], EVENTS_SCHEMA), "events")
    seqs = [s["seq"] for s in twh.snapshots()]
    assert orphan_seq not in seqs  # the hole
    assert seqs == sorted(seqs) and len(set(seqs)) == 2
    assert seqs[-1] > orphan_seq  # later commit skipped past the claim
    assert twh.read("events").count() == 2


def test_same_batch_id_race_exactly_one_winner(spark, twh):
    """Two transactions for the SAME batch_id staged concurrently: exactly
    one commit wins, and the table holds exactly one copy of the batch
    (no interleaved/doubled files)."""
    twh.register_table("events", EVENTS_SCHEMA)
    df = spark.createDataFrame([Row(k="dup", v=7)], EVENTS_SCHEMA)
    # both txns stage BEFORE either commits — the worst interleaving
    t1 = twh.begin("batch-X")
    t2 = twh.begin("batch-X")
    t1.stage(df, "events")
    t2.stage(df, "events")
    r1 = t1.commit()
    r2 = t2.commit()
    assert sorted([r1, r2]) == [False, True]
    assert twh.read("events").count() == 1
    # exactly one marker, one seq
    assert twh.committed_run_ids() == ["batch-X"]
    assert len(twh.snapshots()) == 1
    # the loser's staging is cleaned up
    staging = os.path.join(twh.path("events"), ".staging")
    assert os.listdir(staging) == []


def test_marker_is_never_overwritten(spark, twh):
    """The marker publish is create-if-absent: a straggler committing the
    same run_id after the winner cannot replace the winner's manifest."""
    twh.register_table("events", EVENTS_SCHEMA)
    t1 = twh.begin("batch-Y")
    t1.stage(spark.createDataFrame([Row(k="a", v=1)], EVENTS_SCHEMA), "events")
    assert t1.commit() is True
    with open(twh.marker_path("batch-Y"), encoding="utf-8") as fh:
        manifest_before = json.load(fh)
    t2 = twh.begin("batch-Y")  # already committed: begin marks it done
    assert t2.commit() is False
    with open(twh.marker_path("batch-Y"), encoding="utf-8") as fh:
        assert json.load(fh) == manifest_before


def test_read_changes_raises_after_vacuum_expires_window(spark, twh):
    """compact + vacuum expire incremental windows over the superseded
    runs: read_changes must raise, not silently return an empty frame."""
    twh.register_table("events", EVENTS_SCHEMA)
    twh.append(spark.createDataFrame([Row(k="a", v=1)], EVENTS_SCHEMA), "events")
    seq0 = twh.snapshots()[-1]["seq"]
    twh.append(spark.createDataFrame([Row(k="b", v=2)], EVENTS_SCHEMA), "events")
    twh.append(spark.createDataFrame([Row(k="c", v=3)], EVENTS_SCHEMA), "events")

    # pre-vacuum: the incremental window is readable
    assert twh.read_changes("events", since=seq0).count() == 2

    twh.compact("events")
    # compaction alone does NOT expire the window (old files still on disk)
    assert twh.read_changes("events", since=seq0).count() == 2

    twh.vacuum()
    with pytest.raises(IncrementalWindowExpiredError):
        twh.read_changes("events", since=seq0)
    # recovery path: a full snapshot read is intact
    assert twh.read("events").count() == 3


def test_schema_evolution_additive_roundtrip(spark, twh):
    """Additive evolution: commit under v1 schema, evolve, commit under v2;
    reads null-fill the old snapshot, and an old-schema producer can still
    stage (write-side null-fill)."""
    twh.register_table("events", EVENTS_SCHEMA)
    twh.append(spark.createDataFrame([Row(k="a", v=1)], EVENTS_SCHEMA), "events")

    v2 = T.StructType(
        EVENTS_SCHEMA.fields + [T.StructField("tag", T.StringType(), True)]
    )
    twh.register_table("events", v2)

    twh.append(
        spark.createDataFrame([("b", 2, "new")], schema=v2), "events"
    )
    rows = {r["k"]: (r["v"], r["tag"]) for r in twh.read("events").collect()}
    assert rows == {"a": (1, None), "b": (2, "new")}

    # an old producer without the new column can still stage: null-filled
    twh.append(spark.createDataFrame([Row(k="c", v=3)], EVENTS_SCHEMA), "events")
    rows = {r["k"]: r["tag"] for r in twh.read("events").collect()}
    assert rows == {"a": None, "b": "new", "c": None}

    # time travel across the evolution boundary reads with the new schema
    first = twh.snapshots()[0]["seq"]
    old = twh.read("events", as_of=first)
    assert [f.name for f in old.schema.fields] == ["k", "v", "tag"]
    assert old.collect() == [Row(k="a", v=1, tag=None)]


def test_schema_evolution_rejects_non_additive(spark, twh):
    twh.register_table("events", EVENTS_SCHEMA)
    # drop a column
    with pytest.raises(ValueError, match="drops column"):
        twh.register_table(
            "events",
            T.StructType([T.StructField("k", T.StringType(), False)]),
        )
    # retype a column
    with pytest.raises(ValueError, match="changes column"):
        twh.register_table(
            "events",
            T.StructType(
                [
                    T.StructField("k", T.StringType(), False),
                    T.StructField("v", T.DoubleType(), True),
                ]
            ),
        )
    # new required column
    with pytest.raises(ValueError, match="must be nullable"):
        twh.register_table(
            "events",
            T.StructType(
                EVENTS_SCHEMA.fields
                + [T.StructField("req", T.StringType(), False)]
            ),
        )
    # required column genuinely missing from a staged frame still raises
    txn = twh.begin()
    with pytest.raises(ValueError, match="required column"):
        txn.stage(
            spark.createDataFrame([Row(v=1)], "v long"), "events"
        )
    txn.abort()


def test_vacuum_retention_protects_inflight_staging(spark, twh):
    """With a retention window, vacuum leaves fresh uncommitted staging
    alone (it may belong to a live writer) but still reclaims committed
    leftovers."""
    twh.register_table("events", EVENTS_SCHEMA)
    txn = twh.begin("inflight")
    txn.stage(
        spark.createDataFrame([Row(k="x", v=9)], EVENTS_SCHEMA), "events"
    )
    reclaimed = twh.vacuum(staging_retention_sec=3600)
    assert "inflight" not in reclaimed
    assert txn.commit() is True  # the live writer completes unharmed
    assert twh.read("events").count() == 1
