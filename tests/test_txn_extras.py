"""CHECK constraints, TIMESTAMP AS OF resolution, and pinned snapshot
readers on the transactional warehouse."""

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    ConstraintViolationError,
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
    w = TransactionalWarehouse(spark, str(tmp_path / "extras_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def test_check_constraint_blocks_bad_stage_atomically(spark, wh):
    wh.add_constraint("kv", "v_nonneg", "v >= 0")
    wh.append(_df(spark, [(1, 5)]), "kv")
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        wh.append(_df(spark, [(2, 3), (3, -1)]), "kv")
    # nothing from the failed batch is visible — not even the valid row
    assert {r["k"] for r in wh.read("kv").collect()} == {1}
    # NULL predicate results are violations (strict CHECK)
    with pytest.raises(ConstraintViolationError):
        wh.append(_df(spark, [(4, None)]), "kv")
    wh.drop_constraint("kv", "v_nonneg")
    wh.append(_df(spark, [(5, -9)]), "kv")
    assert {r["k"] for r in wh.read("kv").collect()} == {1, 5}


def test_constraint_declaration_validates_expression(spark, wh):
    with pytest.raises(Exception):
        wh.add_constraint("kv", "broken", "v >=== 0")
    with pytest.raises(KeyError):
        wh.add_constraint("nope", "c", "v >= 0")


def test_timestamp_as_of_resolves_to_marker_time(spark, wh):
    wh.append(_df(spark, [(1, 1)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    time.sleep(0.05)
    between = time.time()
    time.sleep(0.05)
    wh.append(_df(spark, [(2, 2)]), "kv")

    assert wh.resolve_timestamp(between) == s1
    assert wh.resolve_timestamp(time.time()) == wh.snapshots()[-1]["seq"]
    assert wh.resolve_timestamp(between - 10) == 0
    got = {
        r["k"]
        for r in wh.read("kv", as_of=wh.resolve_timestamp(between)).collect()
    }
    assert got == {1}


def test_history_records_operations_in_order(spark, wh):
    """DESCRIBE HISTORY: every commit carries its operation label, the
    commit instant, and its replaces/restores metadata."""
    from pyspark.sql import functions as F

    wh.append(_df(spark, [(1, 1), (2, 2)]), "kv")
    wh.merge(_df(spark, [(2, 20)]), "kv", ["k"])
    wh.overwrite_where(_df(spark, [(1, 10)]), "kv", F.col("k") == 1)
    wh.compact("kv")
    pre = wh.history()[0]["seq"]
    wh.rollback("kv", pre)

    hist = wh.history()
    ops = [h["operation"] for h in hist]
    assert ops == ["append", "merge", "overwrite", "compact", "rollback"]
    assert all(h["committed_at"] is not None for h in hist)
    assert [h["seq"] for h in hist] == sorted(h["seq"] for h in hist)
    # the compact entry retires prior runs; the rollback entry restores one
    assert hist[3]["replaces"]["kv"]
    assert hist[4]["restores"]["kv"]


def test_log_checkpoint_consolidates_and_stays_correct(spark, wh):
    """Log compaction: after CHECKPOINT_INTERVAL commits the marker tail
    is folded into one checkpoint file; manifests served through it must
    equal a full marker scan, later commits stay visible, and a corrupt
    checkpoint degrades to the full scan instead of wrong answers."""
    import json
    import os

    n = wh.CHECKPOINT_INTERVAL + 3
    for i in range(n):
        wh.append(_df(spark, [(i, i)]), "kv")
    assert os.path.exists(wh._checkpoint_path())
    full = wh._read_manifests(use_checkpoint=False)
    assert wh._manifests() == full
    assert len(full) == n
    # commits after the checkpoint are picked up from the tail
    wh.append(_df(spark, [(999, 9)]), "kv")
    assert len(wh._manifests()) == n + 1
    assert {r["k"] for r in wh.read("kv").collect()} == set(range(n)) | {999}
    # corrupt checkpoint: readers fall back to the full marker scan
    with open(wh._checkpoint_path(), "w", encoding="utf-8") as fh:
        fh.write("{broken")
    assert len(wh._manifests()) == n + 1
    # explicit re-checkpoint repairs it
    assert wh.checkpoint_log() == n + 1
    assert json.load(open(wh._checkpoint_path()))["covered"]


def test_snapshot_reader_is_repeatable_across_commits(spark, wh):
    wh.append(_df(spark, [(1, 1)]), "kv")
    reader = wh.snapshot_reader()
    wh.append(_df(spark, [(2, 2)]), "kv")
    # the pinned reader still serves the old snapshot; a fresh read moves on
    assert {r["k"] for r in reader.read("kv").collect()} == {1}
    assert {r["k"] for r in wh.read("kv").collect()} == {1, 2}
    # re-reading through the same reader is stable (repeatable read)
    assert {r["k"] for r in reader.read("kv").collect()} == {1}
