"""SCD2 merge / upsert operator tests."""

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators.merge import scd2_merge, upsert_latest

HIST_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("effective_from", T.TimestampType()),
        T.StructField("effective_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
    ]
)
UPD_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("val", T.StringType())]
)

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 6, 1)
T2 = datetime(2024, 9, 1)


def _merge(spark, hist_rows, upd_rows, ts):
    hist = spark.createDataFrame(hist_rows, HIST_SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    return scd2_merge(
        hist,
        upd,
        key_cols=["k"],
        compare_cols=["val"],
        batch_ts=F.lit(ts).cast("timestamp"),
    )


def test_scd2_full_lifecycle(spark):
    # start: key 1 open@a, key 2 open@x
    hist = [(1, "a", T0, None, True), (2, "x", T0, None, True)]
    # batch 1: key 1 changes, key 2 redelivered unchanged, key 3 is new
    out1 = _merge(spark, hist, [(1, "b"), (2, "x"), (3, "n")], T1)
    rows1 = {(r.k, r.val, r.is_current): r for r in out1.collect()}
    assert (1, "a", False) in rows1  # closed
    assert rows1[(1, "a", False)].effective_to == T1
    assert (1, "b", True) in rows1   # new version
    assert rows1[(1, "b", True)].effective_from == T1
    assert (2, "x", True) in rows1   # idempotent no-op kept open
    assert rows1[(2, "x", True)].effective_to is None
    assert (3, "n", True) in rows1   # brand-new key
    assert out1.count() == 4

    # batch 2 applied on top: key 3 changes; closed history passes through
    hist2 = [tuple(r) for r in out1.select(*HIST_SCHEMA.names).collect()]
    out2 = _merge(spark, hist2, [(3, "m")], T2)
    rows2 = {(r.k, r.val, r.is_current): r for r in out2.collect()}
    assert (1, "a", False) in rows2          # old closed row untouched
    assert rows2[(1, "a", False)].effective_to == T1
    assert (3, "n", False) in rows2
    assert rows2[(3, "n", False)].effective_to == T2
    assert (3, "m", True) in rows2
    assert out2.count() == 5


def test_scd2_idempotent_redelivery(spark):
    hist = [(1, "a", T0, None, True)]
    once = _merge(spark, hist, [(1, "a")], T1)
    assert once.count() == 1
    r = once.collect()[0]
    assert r.is_current and r.effective_to is None and r.effective_from == T0


def test_upsert_latest_tie_prefers_update(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("val", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    current = spark.createDataFrame([(1, "old", T0), (2, "keep", T1)], schema)
    updates = spark.createDataFrame([(1, "new", T0), (3, "ins", T0)], schema)
    out = {r.k: r.val for r in upsert_latest(current, updates, key_cols=["k"], ts_col="ts").collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}  # tie at T0 → update wins


def test_snapshot_diff_classifies_all_change_types(spark):
    from healthcare_etl_pipeline_spark.operators.merge import snapshot_diff

    schema = "k long, v string"
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "same")], schema
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "same"), (5, "e")], schema
    )
    out = {
        r.k: (r.change_type, r.old_v, r.new_v)
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert out[1] == ("delete", "a", None)
    assert out[2] == ("update", "b", "B")
    assert out[3] == ("update", None, "c")  # NULL -> value is an update
    assert out[5] == ("insert", None, "e")
    assert 4 not in out  # unchanged rows never appear
