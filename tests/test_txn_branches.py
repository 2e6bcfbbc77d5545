"""Branches and tags over the transactional warehouse's commit log.

A branch is a named ref (one conditional-PUT JSON) whose reads fold main's
commit prefix up to the fork seq plus the branch's own commits; merge is a
single metadata-only fast-forward commit on main (restores/replaces — the
rollback verbs). Nothing here exists in the reference (its Postgres store
has no refs); this is warehouse surface beyond parity, modeled on
Nessie/LakeFS ref semantics.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    BranchConflictError,
    TransactionalWarehouse,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture
def twh(spark, tmp_path):
    wh = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    wh.register_table("tbl", SCHEMA, primary_key=["k"])
    wh.create_all()
    return wh


def _frame(spark, pairs):
    return spark.createDataFrame(pairs, SCHEMA)


def _commit(wh, batch, pairs, table="tbl"):
    txn = wh.begin(batch)
    txn.stage(_frame(wh.spark, pairs), table)
    assert txn.commit()


def _keys(df):
    return sorted(r.k for r in df.collect())


def test_branch_isolation_both_directions(spark, twh):
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(3, "c")])
    _commit(twh, "main2", [(10, "z")])  # after the fork: invisible on dev
    assert _keys(twh.read("tbl")) == [1, 2, 10]
    assert _keys(dev.read("tbl")) == [1, 2, 3]


def test_branch_fork_at_historic_snapshot(spark, twh):
    _commit(twh, "s1", [(1, "a")])
    s1 = twh.snapshots()[-1]["seq"]
    _commit(twh, "s2", [(2, "b")])
    old = twh.create_branch("from-s1", as_of=s1)
    assert _keys(old.read("tbl")) == [1]


def test_branch_time_travel_within_branch(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(dev, "dev2", [(3, "c")])
    assert _keys(dev.read("tbl", as_of="dev1")) == [1, 2]


def test_duplicate_and_invalid_branch_names(twh):
    twh.create_branch("dev")
    with pytest.raises(ValueError, match="already exists"):
        twh.create_branch("dev")
    with pytest.raises(ValueError, match="invalid ref name"):
        twh.create_branch("a/b")
    with pytest.raises(KeyError):
        twh.branch("nope")
    dev = twh.branch("dev")
    with pytest.raises(ValueError, match="fork from main"):
        dev.create_branch("dev2")


def test_fast_forward_merge_is_metadata_only(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    run_dirs_before = {
        e
        for e in os.listdir(twh.path("tbl"))
        if e.startswith("__run_id=")
    }
    rep = twh.merge_branch("dev")
    assert rep["merged"] and rep["tables"]["tbl"]["adds"] == ["dev1"]
    run_dirs_after = {
        e
        for e in os.listdir(twh.path("tbl"))
        if e.startswith("__run_id=")
    }
    assert run_dirs_after == run_dirs_before  # zero copy: no new run dirs
    assert _keys(twh.read("tbl")) == [1, 2]
    # merge commit provenance lands in the marker
    marker = json.load(
        open(twh.marker_path(rep["run_id"]), encoding="utf-8")
    )
    assert marker["operation"] == "merge_branch"
    assert marker["merged_branch"] == "dev"


def test_merge_conflict_on_touched_table(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(twh, "main2", [(3, "c")])  # main advanced on tbl
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")
    # nothing committed: main unchanged, branch intact
    assert _keys(twh.read("tbl")) == [1, 3]
    assert _keys(dev.read("tbl")) == [1, 2]


def test_merge_no_conflict_on_untouched_table(spark, twh):
    twh.register_table("other", SCHEMA)
    twh.create_all()
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(twh, "mo", [(9, "x")], table="other")  # disjoint table
    rep = twh.merge_branch("dev")
    assert rep["merged"]
    assert _keys(twh.read("tbl")) == [1, 2]


def test_second_merge_conflicts_with_first(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    assert twh.merge_branch("dev")["merged"]
    _commit(dev, "dev2", [(3, "c")])
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")


def test_merge_empty_branch_is_noop(twh):
    _commit(twh, "base", [(1, "a")])
    twh.create_branch("dev")
    assert twh.merge_branch("dev") == {"merged": False, "tables": {}}


def test_branch_mor_delete_merges_with_correct_seq_order(spark, twh):
    """Tombstones committed on a branch must replay in true commit order
    after the merge — the run->seq map is built from the unfiltered log
    precisely because the merged runs' manifests stay branch-tagged."""
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    dev.delete_where("tbl", F.col("k") == 1)
    _commit(dev, "dev-reinsert", [(1, "a2")])  # re-insert AFTER the delete
    assert _keys(dev.read("tbl")) == [1, 2]
    twh.merge_branch("dev")
    out = {r.k: r.v for r in twh.read("tbl").collect()}
    assert out == {1: "a2", 2: "b"}  # resurrected row visible, old one dead


def test_branch_compaction_merges_as_replaces(spark, twh):
    _commit(twh, "b1", [(1, "a")])
    _commit(twh, "b2", [(2, "b")])
    dev = twh.create_branch("dev")
    dev.compact("tbl")
    rep = twh.merge_branch("dev")
    assert sorted(rep["tables"]["tbl"]["removes"]) == ["b1", "b2"]
    assert len(rep["tables"]["tbl"]["adds"]) == 1
    assert _keys(twh.read("tbl")) == [1, 2]


def test_vacuum_protects_unmerged_branch_and_reclaims_deleted(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    twh.vacuum()
    assert _keys(dev.read("tbl")) == [1, 2]  # branch work survives
    twh.delete_branch("dev")
    assert "dev1" in twh.vacuum()
    assert _keys(twh.read("tbl")) == [1]


def test_vacuum_called_on_branch_view_protects_main(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(twh, "main2", [(2, "b")])  # after fork: invisible on dev
    dev.vacuum()
    assert _keys(twh.read("tbl")) == [1, 2]  # main run not reclaimed


def test_merged_branch_delete_then_vacuum_keeps_main_data(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    twh.merge_branch("dev")
    twh.delete_branch("dev")
    reclaimed = twh.vacuum()
    assert "dev1" not in reclaimed  # adopted by the merge commit's restores
    assert _keys(twh.read("tbl")) == [1, 2]


def test_fsck_clean_with_branches(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    report = twh.fsck()
    assert report == {}, report  # branch run is neither orphan nor dead


def test_tags_pin_snapshots(spark, twh):
    _commit(twh, "s1", [(1, "a")])
    twh.create_tag("v1")
    _commit(twh, "s2", [(2, "b")])
    assert _keys(twh.read("tbl", as_of="tag:v1")) == [1]
    assert _keys(twh.read("tbl")) == [1, 2]
    with pytest.raises(ValueError, match="already exists"):
        twh.create_tag("v1")
    with pytest.raises(KeyError):
        twh.read("tbl", as_of="tag:nope")
    assert twh.list_tags() == ["v1"]
    twh.delete_tag("v1")
    assert twh.list_tags() == []


def test_tag_on_branch_resolves_branch_snapshot(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    dev.create_tag("dev-v1")
    _commit(dev, "dev2", [(3, "c")])
    assert _keys(dev.read("tbl", as_of="tag:dev-v1")) == [1, 2]


def test_change_feed_on_branch(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    s0 = dev.snapshots()[-1]["seq"]
    _commit(dev, "dev1", [(2, "b")])
    feed = dev.read_change_feed("tbl", since=s0)
    rows = [(r.k, r._change_type) for r in feed.collect()]
    assert rows == [(2, "insert")]


def test_list_branches(twh):
    assert twh.list_branches() == []
    twh.create_branch("a")
    twh.create_branch("b")
    assert twh.list_branches() == ["a", "b"]
    twh.delete_branch("a")
    assert twh.list_branches() == ["b"]
    with pytest.raises(KeyError):
        twh.delete_branch("a")


# -- rebase (append-only fast-forward of the fork point) ----------------------


def test_rebase_append_only_branch_then_merge(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(twh, "main2", [(3, "c")])  # main advanced: plain merge conflicts
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")
    new_base = twh.rebase_branch("dev")
    assert new_base == 3
    # the rebased branch now sees main's interim commit AND its own work
    dev = twh.branch("dev")
    assert _keys(dev.read("tbl")) == [1, 2, 3]
    rep = twh.merge_branch("dev")
    assert rep["merged"]
    assert _keys(twh.read("tbl")) == [1, 2, 3]


def test_rebase_refuses_branch_compaction(spark, twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    dev.compact("tbl")
    _commit(twh, "main2", [(2, "b")])
    with pytest.raises(ValueError, match="not append-only"):
        twh.rebase_branch("dev")


def test_rebase_refuses_mor_deletes(spark, twh):
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    dev.delete_where("tbl", F.col("k") == 1)
    _commit(twh, "main2", [(3, "c")])
    with pytest.raises(ValueError, match="merge-on-read delete"):
        twh.rebase_branch("dev")


def test_rebase_noop_when_branch_empty(spark, twh):
    _commit(twh, "base", [(1, "a")])
    twh.create_branch("dev")
    _commit(twh, "main2", [(2, "b")])
    assert twh.rebase_branch("dev") == 2
    assert _keys(twh.branch("dev").read("tbl")) == [1, 2]


# -- tombstone-aware conflict detection (round-6 advice fixes) -----------------
# A merge-on-read delete commits only to __tomb_<t>, so conflict scans
# must compare BASE table names: main's delete_where(t) advances t even
# though its manifest never lists t.


def test_merge_refuses_main_mor_delete_on_branch_table(spark, twh):
    """Main delete_where after the fork leaves a tombstone whose seq
    EXCEEDS the branch's append seqs — a fast-forward merge would adopt
    the branch rows below the tombstone and silently hide them."""
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(3, "c")])
    twh.delete_where("tbl", F.col("k") == 1)  # touches only __tomb_tbl
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")
    # refusal committed nothing: main unchanged, branch intact
    assert _keys(twh.read("tbl")) == [2]
    assert _keys(twh.branch("dev").read("tbl")) == [1, 2, 3]


def test_merge_refuses_main_delete_of_branch_reinserted_key(spark, twh):
    """The exact lost-row scenario: branch re-inserts a key main deleted
    after the fork. Before the base-name conflict scan this merged and
    the branch row vanished under main's higher-seq tombstone."""
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    dev.delete_where("tbl", F.col("k") == 1)
    _commit(dev, "dev-re", [(1, "a2")])  # branch: delete then re-insert
    twh.delete_where("tbl", F.col("k") == 1)  # main deletes the same key
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")


def test_merge_refuses_branch_mor_delete_when_main_appended(spark, twh):
    """Symmetric direction: branch touched only __tomb_tbl; main
    appends to the plain table after the fork — not a fast-forward."""
    _commit(twh, "base", [(1, "a"), (2, "b")])
    dev = twh.create_branch("dev")
    dev.delete_where("tbl", F.col("k") == 1)
    _commit(twh, "main2", [(3, "c")])
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")


def test_merge_allows_main_mor_delete_on_unrelated_table(spark, twh):
    twh.register_table("other", SCHEMA, primary_key=["k"])
    twh.create_all()
    _commit(twh, "base", [(1, "a")])
    _commit(twh, "other-base", [(9, "z")], table="other")
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    twh.delete_where("other", F.col("k") == 9)  # unrelated base table
    rep = twh.merge_branch("dev")
    assert rep["merged"]
    assert _keys(twh.read("tbl")) == [1, 2]


def test_rebase_refuses_main_mor_delete_on_branch_table(spark, twh):
    """Appends do not commute with main MoR deletes: after a rebase the
    branch's earlier-seq appends would fall below main's tombstone."""
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    twh.delete_where("tbl", F.col("k") == 1)
    with pytest.raises(ValueError, match="merge-on-read deletes"):
        twh.rebase_branch("dev")
    # fork point untouched by the refusal
    assert _keys(twh.branch("dev").read("tbl")) == [1, 2]


def test_rebase_allows_main_mor_delete_on_unrelated_table(spark, twh):
    twh.register_table("other", SCHEMA, primary_key=["k"])
    twh.create_all()
    _commit(twh, "base", [(1, "a")])
    _commit(twh, "other-base", [(9, "z")], table="other")
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    twh.delete_where("other", F.col("k") == 9)
    new_base = twh.rebase_branch("dev")
    assert new_base == twh.snapshots()[-1]["seq"]
    rep = twh.merge_branch("dev")
    assert rep["merged"]
    assert _keys(twh.read("tbl")) == [1, 2]


# -- three-way (union) merge of append-only divergence -------------------------


def test_union_merge_of_diverged_appends(spark, twh):
    """Both sides appended since the fork: ff refuses, union adopts the
    branch runs and keeps main's — the row union, still metadata-only."""
    import os

    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(twh, "main2", [(3, "c")])
    twh.create_tag("pre-merge")
    with pytest.raises(BranchConflictError):
        twh.merge_branch("dev")
    runs_before = {
        e for e in os.listdir(twh.path("tbl")) if e.startswith("__run_id=")
    }
    rep = twh.merge_branch("dev", strategy="union")
    assert rep["merged"] and rep["strategy"] == "union"
    assert rep["tables"]["tbl"] == {"adds": ["dev1"], "removes": []}
    assert _keys(twh.read("tbl")) == [1, 2, 3]
    runs_after = {
        e for e in os.listdir(twh.path("tbl")) if e.startswith("__run_id=")
    }
    assert runs_after == runs_before  # metadata-only
    assert _keys(twh.read("tbl", as_of="tag:pre-merge")) == [1, 3]


def test_union_merge_unknown_strategy(twh):
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(2, "b")])
    _commit(twh, "main2", [(3, "c")])
    with pytest.raises(ValueError, match="unknown merge strategy"):
        twh.merge_branch("dev", strategy="theirs")


def test_union_merge_refuses_pk_overlap(spark, twh):
    """Same primary key inserted on both sides since the fork is a TRUE
    conflict — union refuses instead of silently doubling the key."""
    _commit(twh, "base", [(1, "a")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(5, "branch-5")])
    _commit(twh, "main2", [(5, "main-5")])
    with pytest.raises(BranchConflictError, match="same primary key"):
        twh.merge_branch("dev", strategy="union")
    assert _keys(twh.read("tbl")) == [1, 5]  # refusal committed nothing


def test_union_merge_refuses_nonappend_divergence(spark, twh):
    _commit(twh, "b1", [(1, "a")])
    _commit(twh, "b2", [(2, "b")])
    dev = twh.create_branch("dev")
    _commit(dev, "dev1", [(3, "c")])
    twh.compact("tbl")  # main rewrote runs since the fork
    with pytest.raises(BranchConflictError, match="not append-only"):
        twh.merge_branch("dev", strategy="union")
    # and a branch-side MoR delete is equally refused
    dev2 = twh.create_branch("dev2")
    dev2.delete_where("tbl", F.col("k") == 1)
    _commit(dev2, "dev2a", [(9, "z")])
    _commit(twh, "main3", [(8, "y")])
    with pytest.raises(BranchConflictError, match="merge-on-read delete"):
        twh.merge_branch("dev2", strategy="union")


def test_sequential_union_merges_keep_earlier_merge_rows(spark, twh):
    """Two branches forked from the same base, each appending distinct
    keys: the SECOND union merge must treat the first merge commit as
    append-equivalent — neither refusing it nor retiring its adopted
    runs."""
    _commit(twh, "base", [(1, "a")])
    d1 = twh.create_branch("d1")
    d2 = twh.create_branch("d2")
    _commit(d1, "d1a", [(2, "b")])
    _commit(d2, "d2a", [(3, "c")])
    _commit(twh, "main2", [(4, "d")])
    assert twh.merge_branch("d1", strategy="union")["merged"]
    rep2 = twh.merge_branch("d2", strategy="union")
    assert rep2["merged"]
    assert rep2["tables"]["tbl"]["removes"] == []  # d1a survives
    assert _keys(twh.read("tbl")) == [1, 2, 3, 4]


def test_union_merge_detects_pk_overlap_with_merged_branch(spark, twh):
    """Keys adopted from an earlier branch merge count as main-side
    post-fork inserts for the overlap check."""
    _commit(twh, "base", [(1, "a")])
    d1 = twh.create_branch("d1")
    d2 = twh.create_branch("d2")
    _commit(d1, "d1a", [(7, "from-d1")])
    _commit(d2, "d2a", [(7, "from-d2")])
    assert twh.merge_branch("d1", strategy="union")["merged"]
    with pytest.raises(BranchConflictError, match="same primary key"):
        twh.merge_branch("d2", strategy="union")
