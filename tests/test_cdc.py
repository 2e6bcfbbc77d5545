"""CDC consumer over the transactional warehouse: exactly-once resume
after a kill, idempotent window replay, and full-refresh recovery after
vacuum expires the incremental window.

(Value correctness of the happy path is the registered ``stream_txn_cdc``
oracle; these tests pin the failure-path semantics an oracle can't reach.)
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)
from healthcare_etl_pipeline_spark.streaming.cdc import (
    cdc_cursor,
    cdc_sync,
    cdc_sync_once,
    source_watermark,
)

SRC_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)
AGG_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("value_sum", T.DoubleType(), True),
    ]
)
PREFIX = "cdc_src_agg"


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "cdc_wh"))
    w.register_table("src", SRC_SCHEMA)
    w.register_table("agg", AGG_SCHEMA)
    w.create_all()
    return w


def _append(spark, wh, rows):
    wh.append(spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SRC_SCHEMA), "src")


def _sync(wh):
    return cdc_sync(wh, "src", "agg", group_cols=["k"], value_col="v")


def _view(wh):
    return {r["k"]: (r["n"], r["value_sum"]) for r in wh.read("agg").collect()}


def test_incremental_folding_matches_batch(spark, wh):
    _append(spark, wh, [("a", 1), ("b", 2)])
    assert _sync(wh) == 1
    _append(spark, wh, [("a", 10)])
    assert _sync(wh) == 1
    assert _view(wh) == {"a": (2, 11.0), "b": (1, 2.0)}
    # drained consumer does nothing
    assert _sync(wh) == 0


def test_kill_and_restart_resumes_without_double_count(spark, wh):
    """Crash immediately after the view commit (before any other action):
    a fresh consumer recovers the cursor from the txn log and does NOT
    reprocess the window."""
    _append(spark, wh, [("a", 1)])
    window = cdc_sync_once(wh, "src", "agg", group_cols=["k"], value_col="v")
    assert window == (0, 1)
    # "restart": new consumer state is derived purely from the warehouse
    restarted = TransactionalWarehouse(spark, wh.root)
    restarted.register_table("src", SRC_SCHEMA)
    restarted.register_table("agg", AGG_SCHEMA)
    assert cdc_cursor(restarted, PREFIX) == source_watermark(restarted, "src")
    assert _sync(restarted) == 0
    assert _view(restarted) == {"a": (1, 1.0)}
    # new data after the restart is picked up exactly once
    _append(spark, restarted, [("a", 5)])
    assert _sync(restarted) == 1
    assert _view(restarted) == {"a": (2, 6.0)}


def test_replayed_window_commit_is_idempotent(spark, wh):
    """Two consumers racing on the same window (stale retry): the second
    publish is a no-op — the view holds exactly one fold of the window."""
    _append(spark, wh, [("a", 1), ("a", 2)])
    assert cdc_sync_once(
        wh, "src", "agg", group_cols=["k"], value_col="v"
    ) == (0, 1)
    # replay the identical window through the low-level publish path: the
    # batch_id matches the committed one, so begin() marks it already done
    txn = wh.begin(f"{PREFIX}__0__1")
    assert txn._already_committed
    assert txn.commit() is False
    assert _view(wh) == {"a": (2, 3.0)}


def test_enriched_sync_joins_only_the_delta(spark, tmp_path):
    """cdc_sync_enriched folds fact deltas joined to the dimension; a
    dimension row added between syncs enriches only facts that arrive
    after it (append-only referential pattern)."""
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_sync_enriched

    w = TransactionalWarehouse(spark, str(tmp_path / "en_wh"))
    w.register_table(
        "f",
        T.StructType(
            [T.StructField("uid", T.LongType()), T.StructField("v", T.LongType())]
        ),
    )
    w.register_table(
        "d",
        T.StructType(
            [T.StructField("uid", T.LongType()), T.StructField("g", T.StringType())]
        ),
    )
    w.register_table("agg", AGG_SCHEMA_G)
    w.create_all()

    def fdf(rows):
        return spark.createDataFrame([Row(uid=u, v=v) for u, v in rows],
                                     w.table_schema("f"))

    w.append(spark.createDataFrame([Row(uid=1, g="a"), Row(uid=2, g="b")],
                                   w.table_schema("d")), "d")
    sync = lambda: cdc_sync_enriched(  # noqa: E731
        w, "f", "d", "agg", join_key="uid", group_cols=["g"], value_col="v"
    )
    w.append(fdf([(1, 10), (2, 20)]), "f")
    assert sync() == 1
    w.append(fdf([(1, 5)]), "f")
    assert sync() == 1
    got = {r["g"]: (r["n"], r["value_sum"]) for r in w.read("agg").collect()}
    assert got == {"a": (2, 15.0), "b": (1, 20.0)}
    assert sync() == 0


AGG_SCHEMA_G = T.StructType(
    [
        T.StructField("g", T.StringType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("value_sum", T.DoubleType(), True),
    ]
)


def test_rollback_of_source_documented_divergence_then_refresh(spark, wh):
    """A source rollback is NOT an append: the incremental consumer skips
    it (no double-count, no crash), keeps serving the pre-rollback
    aggregate (documented divergence), folds post-rollback appends
    normally, and an explicit full refresh reconverges with the source."""
    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_full_refresh

    _append(spark, wh, [("a", 1)])
    assert _sync(wh) == 1
    pre = wh.snapshots()[-1]["seq"]
    _append(spark, wh, [("a", 10)])
    assert _sync(wh) == 1
    assert _view(wh) == {"a": (2, 11.0)}

    wh.rollback("src", pre)  # the (a, 10) append is rolled back
    # no pending appends: the consumer does nothing and keeps its state
    assert _sync(wh) == 0
    assert _view(wh) == {"a": (2, 11.0)}  # diverged, as documented
    # post-rollback appends fold exactly once
    _append(spark, wh, [("b", 5)])
    assert _sync(wh) == 1
    assert _view(wh) == {"a": (2, 11.0), "b": (1, 5.0)}
    # explicit refresh reconverges with the rolled-back source
    cdc_full_refresh(wh, "src", "agg", group_cols=["k"], value_col="v")
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 5.0)}
    assert _sync(wh) == 0


def test_vacuum_expired_window_triggers_full_refresh(spark, wh):
    """Consumer offline across compact+vacuum: the incremental window is
    gone, so cdc_sync must fall back to a full snapshot rebuild instead of
    silently losing the gap."""
    _append(spark, wh, [("a", 1)])
    assert _sync(wh) == 1
    # consumer goes offline; writes + compaction + vacuum happen meanwhile
    _append(spark, wh, [("b", 2)])
    _append(spark, wh, [("a", 3)])
    wh.compact("src")
    wh.vacuum()
    rounds = _sync(wh)
    assert rounds >= 1  # the refresh round
    assert _view(wh) == {"a": (2, 4.0), "b": (1, 2.0)}
    # and the consumer is current afterwards
    assert _sync(wh) == 0


def test_non_append_changes_raise_under_strict(spark, tmp_path):
    """An incremental window containing logical rewrites or MoR deletes
    raises instead of silently serving only the appends."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.sources.warehouse import (
        NonAppendChangeError,
        TransactionalWarehouse,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    wh = TransactionalWarehouse(spark, str(tmp_path / "na_wh"))
    wh.register_table("src", schema, primary_key=("k",))
    wh.create_all()

    def df(rows):
        return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], schema)

    wh.append(df([(1, 1)]), "src")
    s1 = wh.snapshots()[-1]["seq"]

    # merge rewrite inside the window -> strict raises, non-strict skips
    wh.merge(df([(1, 10), (2, 2)]), "src", ["k"])
    with pytest.raises(NonAppendChangeError, match="merge"):
        wh.read_changes("src", since=s1)
    assert wh.read_changes("src", since=s1, strict=False).count() == 0
    s2 = wh.snapshots()[-1]["seq"]

    # MoR delete inside the window -> strict raises
    wh.delete_where("src", F.col("k") == 1)
    with pytest.raises(NonAppendChangeError, match="delete"):
        wh.read_changes("src", since=s2)
    s3 = wh.snapshots()[-1]["seq"]

    # compaction stays quietly skippable; plain appends flow as before
    wh.append(df([(3, 3)]), "src")
    wh.compact("src")
    got = {r["k"] for r in wh.read_changes("src", since=s3).collect()}
    assert got == {3}


def test_cdc_sync_recovers_from_non_append_changes(spark, tmp_path):
    """A source UPDATE + MoR delete inside the pending window makes the
    appends-only fold impossible; cdc_sync must recover (round 5: via the
    NET change-feed incremental apply, since count/sum is invertible and
    src has a primary key) and converge to the batch recomputation."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.sources.warehouse import (
        TransactionalWarehouse,
    )
    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_sync

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    view_schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("value_sum", T.DoubleType(), True),
        ]
    )
    wh = TransactionalWarehouse(spark, str(tmp_path / "narec_wh"))
    wh.register_table("src", schema, primary_key=("k",))
    wh.register_table("view", view_schema)
    wh.create_all()

    def df(rows):
        return spark.createDataFrame(
            [Row(k=k, grp=g, v=float(v)) for k, g, v in rows], schema
        )

    wh.append(df([(1, "a", 1), (2, "a", 2), (3, "b", 3)]), "src")
    assert cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v") == 1

    # non-append churn lands AFTER the consumer's cursor
    wh.update_where("src", F.col("k") == 1, {"v": F.lit(10.0)})
    wh.delete_where("src", F.col("k") == 3)
    wh.append(df([(4, "b", 4)]), "src")

    rounds = cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v")
    assert rounds >= 1
    got = {
        r["grp"]: (r["n"], r["value_sum"])
        for r in wh.read("view").collect()
    }
    # equals the from-scratch recomputation over the CURRENT snapshot
    assert got == {"a": (2, 12.0), "b": (1, 4.0)}


def _churn_wh(spark, tmp_path, name):
    """src table WITH a primary key (change-feed capable) + view table."""
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.sources.warehouse import (
        TransactionalWarehouse,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    view_schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("value_sum", T.DoubleType(), True),
        ]
    )
    w = TransactionalWarehouse(spark, str(tmp_path / name))
    w.register_table("src", schema, primary_key=("k",))
    w.register_table("view", view_schema)
    w.create_all()

    def df(rows):
        from pyspark.sql import Row

        return spark.createDataFrame(
            [Row(k=k, grp=g, v=float(v)) for k, g, v in rows], schema
        )

    return w, df


def test_non_append_window_applies_change_feed_not_refresh(spark, tmp_path):
    """Update+delete churn with an INVERTIBLE algebra (count/sum): cdc_sync
    must apply the NET change feed incrementally — no full-refresh commit —
    and still equal the batch recomputation, including DROPPING a group
    whose rows were all deleted."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_sync

    wh, df = _churn_wh(spark, tmp_path, "feed_wh")
    wh.append(df([(1, "a", 1), (2, "a", 2), (3, "b", 3), (4, "c", 4)]), "src")
    assert cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v") == 1

    wh.update_where("src", F.col("k") == 1, {"v": F.lit(10.0)})  # a: 1→10
    wh.delete_where("src", F.col("grp") == "b")  # group b emptied
    wh.append(df([(5, "c", 5)]), "src")

    rounds = cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v")
    assert rounds >= 1
    run_ids = [r for r in wh.committed_run_ids() if r.startswith("cdc_src_view")]
    assert run_ids, "consumer committed nothing"
    assert not any("__refresh__" in r for r in run_ids), (
        "invertible algebra must use the change feed, not full refresh: "
        f"{run_ids}"
    )
    got = {r["grp"]: (r["n"], r["value_sum"]) for r in wh.read("view").collect()}
    assert got == {"a": (2, 12.0), "c": (2, 9.0)}  # b dropped entirely


def test_non_invertible_algebra_still_full_refreshes(spark, tmp_path):
    """max is not invertible (deleting the max needs the runner-up the
    state discarded): the same churn must take the full-refresh path and
    still converge."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.operators.incremental_agg import (
        AggSpec,
        supports_incremental_apply,
    )
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        TransactionalWarehouse,
    )
    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_sync

    specs = [AggSpec("n", "count"), AggSpec("v_max", "max", "v")]
    assert not supports_incremental_apply(specs)
    assert supports_incremental_apply(
        [AggSpec("n", "count"), AggSpec("s", "sum", "v"), AggSpec("a", "avg", "v")]
    )
    # sum alone cannot witness retracted-to-empty groups either
    assert not supports_incremental_apply([AggSpec("s", "sum", "v")])

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    view_schema = T.StructType(
        [
            T.StructField("grp", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
            T.StructField("v_max", T.DoubleType(), True),
        ]
    )
    wh = TransactionalWarehouse(spark, str(tmp_path / "maxwh"))
    wh.register_table("src", schema, primary_key=("k",))
    wh.register_table("view", view_schema)
    wh.create_all()
    from pyspark.sql import Row

    def df(rows):
        return spark.createDataFrame(
            [Row(k=k, grp=g, v=float(v)) for k, g, v in rows], schema
        )

    sync = lambda: cdc_sync(  # noqa: E731
        wh, "src", "view", group_cols=["grp"], value_col="v", aggs=specs
    )
    wh.append(df([(1, "a", 1), (2, "a", 9), (3, "b", 3)]), "src")
    assert sync() == 1
    wh.delete_where("src", F.col("k") == 2)  # removes group a's max
    assert sync() >= 1
    run_ids = [r for r in wh.committed_run_ids() if r.startswith("cdc_src_view")]
    assert any("__refresh__" in r for r in run_ids), (
        f"non-invertible algebra must refresh: {run_ids}"
    )
    got = {r["grp"]: (r["n"], r["v_max"]) for r in wh.read("view").collect()}
    assert got == {"a": (1, 1.0), "b": (1, 3.0)}


def test_trailing_mor_delete_advances_watermark(spark, tmp_path):
    """A merge-on-read delete stages only the tombstone sidecar; the
    watermark must still advance so the delete syncs without waiting for
    a later append."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.streaming.cdc import cdc_sync

    wh, df = _churn_wh(spark, tmp_path, "trail_wh")
    wh.append(df([(1, "a", 1), (2, "a", 2)]), "src")
    assert cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v") == 1
    wh.delete_where("src", F.col("k") == 2)  # tombstone-only commit
    assert cdc_sync(wh, "src", "view", group_cols=["grp"], value_col="v") == 1
    got = {r["grp"]: (r["n"], r["value_sum"]) for r in wh.read("view").collect()}
    assert got == {"a": (1, 1.0)}


def test_cdc_sync_on_branch_view_is_isolated(spark, tmp_path):
    """The whole CDC consumer runs unchanged against a BRANCH view (the
    ref filter is below _manifests, so cursors, watermarks, windows, and
    view commits all stay branch-local), and nothing leaks to main until
    a merge publishes both src and agg together."""
    wh = TransactionalWarehouse(spark, str(tmp_path / "cdc_br_wh"))
    wh.register_table("src", SRC_SCHEMA)
    wh.register_table("agg", AGG_SCHEMA)
    wh.create_all()
    _append(spark, wh, [("a", 1), ("b", 2)])
    _sync(wh)
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 2.0)}

    dev = wh.create_branch("dev")
    _append(spark, dev, [("a", 10)])
    assert _sync(dev) >= 1
    assert _view(dev) == {"a": (2, 11.0), "b": (1, 2.0)}
    # main's source AND view are untouched
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 2.0)}
    assert wh.read("src").count() == 2

    # merge adopts src + agg + the consumer's cursor table atomically
    wh.merge_branch("dev")
    assert _view(wh) == {"a": (2, 11.0), "b": (1, 2.0)}
    assert wh.read("src").count() == 3
    # post-merge main sync sees the merge window and FULL-REFRESHES —
    # idempotent content (a signed feed apply would double-count the
    # adopted runs, which the merged cursor already folded)
    _sync(wh)
    assert _view(wh) == {"a": (2, 11.0), "b": (1, 2.0)}
    # and the round after that is a true no-op
    before = len(wh.committed_run_ids())
    _sync(wh)
    assert len(wh.committed_run_ids()) == before


def test_merge_branch_window_is_non_append_and_feed_recovers(spark, tmp_path):
    """A branch merge ADOPTS runs the appends-only feed would silently
    skip — strict read_changes must refuse the window, and the net
    change feed must surface the adopted rows as inserts (the standard
    recovery path a cdc_sync consumer takes automatically)."""
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        NonAppendChangeError,
        TransactionalWarehouse,
    )

    wh = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    wh.register_table("src", SRC_SCHEMA, primary_key=("k",))
    wh.register_table("agg", AGG_SCHEMA)
    wh.create_all()
    _append(spark, wh, [("a", 1)])
    s0 = wh.snapshots()[-1]["seq"]
    dev = wh.create_branch("dev")
    _append(spark, dev, [("b", 2)])
    wh.merge_branch("dev")
    with pytest.raises(NonAppendChangeError, match="branch merge"):
        wh.read_changes("src", since=s0)
    feed = wh.read_change_feed("src", since=s0)
    rows = {(r.k, r._change_type) for r in feed.collect()}
    assert rows == {("b", "insert")}
    # and the full consumer folds it correctly end-to-end
    assert cdc_sync(wh, "src", "agg", group_cols=["k"], value_col="v") >= 1
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 2.0)}


# -- round-6: the watermark must not race in-flight committers ----------------


def _claim(wh, seq, content="inflight"):
    import os

    d = wh._seq_dir()
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{seq:020d}.claim"), "w") as fh:
        fh.write(content)


def test_watermark_capped_by_inflight_claim(spark, wh):
    """A committer that claimed the next seq but hasn't published yet
    caps source_watermark: consuming past it would close a window over
    the unpublished seq and skip its rows forever."""
    _append(spark, wh, [("a", 1)])
    s1 = wh.snapshots()[-1]["seq"]
    hole = s1 + 1
    _claim(wh, hole)
    _append(spark, wh, [("b", 2)])  # claims hole+1, publishes FIRST
    assert wh.published_frontier() == s1
    assert source_watermark(wh, "src") == s1
    # sync folds only the safe prefix
    assert cdc_sync_once(
        wh, "src", "agg", group_cols=["k"], value_col="v", prefix=PREFIX
    ) == (0, s1)
    assert _view(wh) == {"a": (1, 1.0)}


def test_late_published_commit_is_folded_not_skipped(spark, wh):
    """End-to-end: the late committer finally publishes its marker — the
    frontier advances and the NEXT sync folds its rows plus everything
    after it. No commit is ever skipped."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    _append(spark, wh, [("a", 1)])
    s1 = wh.snapshots()[-1]["seq"]
    hole = s1 + 1
    _claim(wh, hole, "late")
    _append(spark, wh, [("b", 2)])
    cdc_sync_once(
        wh, "src", "agg", group_cols=["k"], value_col="v", prefix=PREFIX
    )
    assert _view(wh) == {"a": (1, 1.0)}

    # the late peer completes: data dir + marker for the held seq
    run_dir = wh.run_dir("src", "late")
    os.makedirs(run_dir)
    pq.write_table(
        pa.table({"k": pa.array(["c"]), "v": pa.array([3], pa.int64())}),
        os.path.join(run_dir, "part-0.parquet"),
    )
    with open(wh.marker_path("late"), "w") as fh:
        json.dump({"run_id": "late", "tables": ["src"], "seq": hole}, fh)

    assert wh.published_frontier() >= hole + 1
    cdc_sync_once(
        wh, "src", "agg", group_cols=["k"], value_col="v", prefix=PREFIX
    )
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 2.0), "c": (1, 3.0)}


def test_clear_stale_claims_unblocks_a_crash_hole(spark, wh):
    _append(spark, wh, [("a", 1)])
    s1 = wh.snapshots()[-1]["seq"]
    _claim(wh, s1 + 1, "dead")
    _append(spark, wh, [("b", 2)])
    assert wh.published_frontier() == s1
    assert wh.clear_stale_claims(max_age_seconds=1e9) == []  # too young
    assert wh.clear_stale_claims(max_age_seconds=0.0) == [s1 + 1]
    assert wh.published_frontier() == wh.snapshots()[-1]["seq"]
    cdc_sync_once(
        wh, "src", "agg", group_cols=["k"], value_col="v", prefix=PREFIX
    )
    assert _view(wh) == {"a": (1, 1.0), "b": (1, 2.0)}
