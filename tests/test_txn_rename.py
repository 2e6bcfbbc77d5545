"""Metadata-only column renames (column mapping) on the transactional
warehouse: physical names stay in old files, readers remap per epoch,
writers use the new logical name, a fresh process sees the rename from
the markers alone."""

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
        T.StructField("price", T.DoubleType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "ren_wh"))
    w.register_table("items", SCHEMA)
    w.create_all()
    return w


def _append(spark, wh, rows, col="price"):
    df = spark.createDataFrame(
        [Row(k=k, **{col: v}) for k, v in rows],
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField(col, T.DoubleType(), True),
            ]
        ),
    )
    wh.append(df, "items")


def test_rename_remaps_old_files_and_accepts_new_writes(spark, wh):
    _append(spark, wh, [(1, 10.0), (2, 20.0)])
    wh.rename_column("items", "price", "amount")
    assert wh.table_schema("items").fieldNames() == ["k", "amount"]
    # old files (physical name 'price') read under the new logical name
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 10.0, 2: 20.0}
    # a post-rename producer stages under the new name
    _append(spark, wh, [(3, 30.0)], col="amount")
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0}
    assert wh.history()[-2]["operation"] == "rename_column"


def test_chained_renames_compose(spark, wh):
    _append(spark, wh, [(1, 1.0)])
    wh.rename_column("items", "price", "cost")
    _append(spark, wh, [(2, 2.0)], col="cost")
    wh.rename_column("items", "cost", "amount")
    _append(spark, wh, [(3, 3.0)], col="amount")
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}


def test_fresh_process_sees_rename_from_markers(spark, wh, tmp_path):
    _append(spark, wh, [(1, 5.0)])
    wh.rename_column("items", "price", "amount")
    # simulate a new driver registering the ORIGINAL schema
    w2 = TransactionalWarehouse(spark, str(tmp_path / "ren_wh"))
    w2.register_table("items", SCHEMA)
    assert w2.table_schema("items").fieldNames() == ["k", "amount"]
    assert {r["k"]: r["amount"] for r in w2.read("items").collect()} == {1: 5.0}
    # and one registering the POST-rename schema is accepted too
    w3 = TransactionalWarehouse(spark, str(tmp_path / "ren_wh"))
    w3.register_table(
        "items",
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("amount", T.DoubleType(), True),
            ]
        ),
    )
    assert {r["k"]: r["amount"] for r in w3.read("items").collect()} == {1: 5.0}


def test_time_travel_presents_current_logical_schema(spark, wh):
    _append(spark, wh, [(1, 5.0)])
    before = wh.snapshots()[-1]["seq"]
    wh.rename_column("items", "price", "amount")
    old = wh.read("items", as_of=before)
    assert old.columns == ["k", "amount"]  # mapping is table metadata
    assert old.collect()[0]["amount"] == 5.0


def test_rename_interacts_with_update_and_additive_evolution(spark, wh):
    _append(spark, wh, [(1, 5.0), (2, 6.0)])
    wh.rename_column("items", "price", "amount")
    wh.update_where("items", F.col("k") == 1, {"amount": F.lit(50.0)})
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 50.0, 2: 6.0}
    # additive evolution on top of the renamed schema
    wh.register_table(
        "items",
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("amount", T.DoubleType(), True),
                T.StructField("note", T.StringType(), True),
            ]
        ),
    )
    got = {(r["k"], r["amount"], r["note"]) for r in wh.read("items").collect()}
    assert got == {(1, 50.0, None), (2, 6.0, None)}


def test_rename_rejections(spark, wh):
    with pytest.raises(KeyError):
        wh.rename_column("items", "nope", "x")
    with pytest.raises(ValueError, match="already has"):
        wh.rename_column("items", "price", "k")
    with pytest.raises(ValueError, match="bad column name"):
        wh.rename_column("items", "price", "bad name")
    with pytest.raises(ValueError, match="built-in"):
        wh.rename_column("patients", "id", "patient_id")


def test_dml_predicates_on_renamed_column_reach_pre_rename_files(spark, wh):
    """The DML semi-scans must read pre-rename files through the column
    mapping — a logical-schema scan would null the renamed column and
    silently miss every pre-rename run."""
    _append(spark, wh, [(1, 10.0), (2, 20.0)])
    wh.rename_column("items", "price", "amount")
    # update predicate on the RENAMED column must hit the old run
    res = wh.update_where(
        "items", F.col("amount") >= 20.0, {"amount": F.lit(99.0)}
    )
    assert len(res["rewritten_runs"]) == 1
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 10.0, 2: 99.0}
    # overwrite_where on the renamed column too
    big = spark.createDataFrame(
        [Row(k=5, amount=55.0)],
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("amount", T.DoubleType(), True),
            ]
        ),
    )
    wh.overwrite_where(big, "items", F.col("amount") > 50.0)
    got = {r["k"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 10.0, 5: 55.0}


def test_merge_keyed_on_renamed_column_rewrites_old_runs(spark, wh):
    _append(spark, wh, [(1, 1.0), (2, 2.0)])
    wh.rename_column("items", "k", "item_id")
    src = spark.createDataFrame(
        [Row(item_id=2, amount=22.0), Row(item_id=3, amount=33.0)],
        T.StructType(
            [
                T.StructField("item_id", T.LongType(), False),
                T.StructField("amount", T.DoubleType(), True),
            ]
        ),
    )
    wh.rename_column("items", "price", "amount")
    res = wh.merge(src, "items", ["item_id"])
    assert len(res["rewritten_runs"]) == 1  # the pre-rename run held item_id=2
    got = {r["item_id"]: r["amount"] for r in wh.read("items").collect()}
    assert got == {1: 1.0, 2: 22.0, 3: 33.0}


def test_stats_index_and_skipping_across_rename(spark, wh):
    _append(spark, wh, [(1, 10.0), (2, 20.0)])
    wh.rename_column("items", "price", "amount")
    _append(spark, wh, [(3, 30.0)], col="amount")
    wh.build_stats_index("items", ["amount"], bloom_cols=["k"])
    df, report = wh.read_skipping(
        "items", {"amount": (15.0, 35.0)}, equals={"k": 3}
    )
    assert report["files_read"] >= 1
    rows = df.filter(F.col("k") == 3).collect()
    assert rows[0]["amount"] == 30.0
    # min/max over the renamed column indexed BOTH epochs' files
    stats_cols = spark.read.parquet(
        wh._stats_dir("items") + "/files"
    ).columns
    assert "min_amount" in stats_cols


def test_read_changes_across_rename(spark, wh):
    _append(spark, wh, [(1, 1.0)])
    s1 = wh.snapshots()[-1]["seq"]
    wh.rename_column("items", "price", "amount")
    _append(spark, wh, [(2, 2.0)], col="amount")
    # window spanning the rename: pre-rename runs excluded by the window,
    # but a window STARTING before it must still read old files correctly
    all_changes = wh.read_changes("items", since=0)
    got = {r["k"]: r["amount"] for r in all_changes.collect()}
    assert got == {1: 1.0, 2: 2.0}
    tail = wh.read_changes("items", since=s1)
    assert {r["k"] for r in tail.collect()} == {2}


def test_rename_blocked_by_referencing_constraint(spark, wh):
    wh.add_constraint("items", "price_nonneg", "price >= 0")
    _append(spark, wh, [(1, 1.0)])
    with pytest.raises(ValueError, match="price_nonneg"):
        wh.rename_column("items", "price", "amount")
    # unrelated constraints don't block
    wh.drop_constraint("items", "price_nonneg")
    wh.add_constraint("items", "k_pos", "k >= 0")
    wh.rename_column("items", "price", "amount")
    _append(spark, wh, [(2, 2.0)], col="amount")
    assert {r["k"] for r in wh.read("items").collect()} == {1, 2}


def test_merged_branch_runs_read_in_their_rename_epoch(spark, wh):
    """Round-6 advice: the schema-epoch run->seq map must come from the
    UNFILTERED log — a run adopted from a merged branch keeps its
    branch-tagged manifest (invisible to the ref-filtered view), so the
    filtered map sent it to seq 0 = the PRE-rename epoch and its files
    (written with the post-rename physical name) read back null."""
    _append(spark, wh, [(1, 10.0)])                  # seq 1: physical 'price'
    wh.rename_column("items", "price", "amount")     # seq 2: epoch boundary
    dev = wh.create_branch("dev")
    _append(spark, dev, [(2, 99.0)], col="amount")   # seq 3: physical 'amount'
    rep = wh.merge_branch("dev")
    assert rep["merged"]
    out = {r.k: r.amount for r in wh.read("items").collect()}
    assert out == {1: 10.0, 2: 99.0}  # branch run decoded in POST-rename epoch


def test_merged_branch_runs_skip_read_in_their_rename_epoch(spark, wh):
    """Same epoch bug in the data-skipping path (read_skipping groups
    selected files by the run->seq epoch map)."""
    _append(spark, wh, [(1, 10.0)])
    wh.rename_column("items", "price", "amount")
    dev = wh.create_branch("dev")
    _append(spark, dev, [(2, 99.0)], col="amount")
    wh.merge_branch("dev")
    wh.build_stats_index("items", ["k"])
    df, report = wh.read_skipping("items", {"k": (None, None)})
    out = {r.k: r.amount for r in df.collect()}
    assert out == {1: 10.0, 2: 99.0}
