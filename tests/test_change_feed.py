"""Net change-data feed (read_change_feed): row-level diffs between two
snapshots — insert/delete/update pre+post — with rewritten-but-unchanged
rows suppressed."""

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
        T.StructField("v", T.LongType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "cdf_wh"))
    w.register_table("kv", SCHEMA, primary_key=("k",))
    w.create_all()
    return w


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def _feed(wh, since, until=None):
    return {
        (r["k"], r["v"], r["_change_type"])
        for r in wh.read_change_feed("kv", since, until).collect()
    }


def test_feed_classifies_insert_update_delete(spark, wh):
    wh.append(_df(spark, [(1, 10), (2, 20), (3, 30)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(11)})
    wh.delete_where("kv", F.col("k") == 2)
    wh.append(_df(spark, [(4, 40)]), "kv")
    assert _feed(wh, s1) == {
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
        (2, 20, "delete"),
        (4, 40, "insert"),
    }


def test_feed_is_net_over_the_window(spark, wh):
    wh.append(_df(spark, [(1, 10), (2, 20)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    # updated then deleted -> net delete with the WINDOW-START preimage
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(99)})
    wh.delete_where("kv", F.col("k") == 1)
    # deleted then re-inserted with a new value -> net update pair
    wh.delete_where("kv", F.col("k") == 2)
    wh.append(_df(spark, [(2, 21)]), "kv")
    assert _feed(wh, s1) == {
        (1, 10, "delete"),
        (2, 20, "update_preimage"),
        (2, 21, "update_postimage"),
    }


def test_rewritten_unchanged_rows_are_suppressed(spark, wh):
    wh.append(_df(spark, [(1, 10), (2, 20), (3, 30)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(11)})
    wh.compact("kv")  # every surviving row rewritten into a new run
    assert _feed(wh, s1) == {
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
    }


def test_feed_window_endpoints_and_empty_window(spark, wh):
    wh.append(_df(spark, [(1, 10)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(11)})
    s2 = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(12)})
    # bounded window sees only its slice
    assert _feed(wh, s1, s2) == {
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
    }
    assert _feed(wh, s2, s2) == set()


def test_feed_requires_primary_key(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "nopk_wh"))
    w.register_table("t", SCHEMA)
    w.create_all()
    with pytest.raises(ValueError, match="primary_key"):
        w.read_change_feed("t", 0)


def test_feed_composes_with_rename(spark, wh):
    wh.append(_df(spark, [(1, 10)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    wh.rename_column("kv", "v", "val")
    wh.update_where("kv", F.col("k") == 1, {"val": F.lit(11)})
    got = {
        (r["k"], r["val"], r["_change_type"])
        for r in wh.read_change_feed("kv", s1).collect()
    }
    assert got == {
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
    }


def test_feed_over_vacuumed_window_raises_expired(spark, wh):
    """Snapshot expiry: when a run the diff must read was compacted away
    and vacuumed, the feed REFUSES (IncrementalWindowExpiredError) instead
    of returning a silently partial changeset — the consumer's recovery is
    a full refresh."""
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        IncrementalWindowExpiredError,
    )

    wh.append(_df(spark, [(1, 10), (2, 20)]), "kv")
    s1 = wh.snapshots()[-1]["seq"]
    wh.update_where("kv", F.col("k") == 1, {"v": F.lit(11)})
    # compaction supersedes the pre-update runs; vacuum reclaims them
    wh.compact("kv")
    wh.vacuum()
    with pytest.raises(IncrementalWindowExpiredError):
        wh.read_change_feed("kv", since=s1).collect()
