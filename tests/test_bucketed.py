"""Bucketed-layout tests: the co-located join must plan without a shuffle."""

import pytest

from healthcare_etl_pipeline_spark.catalog import load_table
from healthcare_etl_pipeline_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def bucketed_tables(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, "b_lineitem", bucket_col="l_orderkey", buckets=4)
    write_bucketed(orders, "b_orders", bucket_col="l_orderkey", buckets=4)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # force a non-broadcast join so the shuffle (if any) would be visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_ensure_layout_memoizes_and_cleans_up(spark):
    import os

    from healthcare_etl_pipeline_spark.sources import bucketed as B

    builds = {"n": 0}

    def make():
        builds["n"] += 1
        return load_table(spark, SF, "orders").select(
            "o_custkey", "o_totalprice"
        )

    layout1 = B.ensure_bucketed_layout(
        spark, "memo_test", {"orders": make}, bucket_col="o_custkey", buckets=4
    )
    assert builds["n"] == 1
    table = layout1["orders"]
    assert spark.catalog.tableExists(table)
    loc = os.path.join(B._tmp_root(), table)
    mtimes = {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    }

    # second call: pure catalog lookup — no builder call, no file rewrite
    layout2 = B.ensure_bucketed_layout(
        spark, "memo_test", {"orders": make}, bucket_col="o_custkey", buckets=4
    )
    assert layout2 == layout1
    assert builds["n"] == 1
    assert {
        f: os.path.getmtime(os.path.join(loc, f)) for f in os.listdir(loc)
    } == mtimes

    # cleanup drops catalog entries and removes the temp root
    B._cleanup_layouts()
    assert not spark.catalog.tableExists(table)
    assert not os.path.exists(loc)
    # and the memo is cold again: next call rebuilds
    layout3 = B.ensure_bucketed_layout(
        spark, "memo_test", {"orders": make}, bucket_col="o_custkey", buckets=4
    )
    assert builds["n"] == 2
    B._cleanup_layouts()
    assert not spark.catalog.tableExists(layout3["orders"])


def test_bucketed_join_orders_query_no_writes_on_repeat(spark):
    import os

    from healthcare_etl_pipeline_spark.queries.join_ops import (
        bucketed_join_orders,
    )
    from healthcare_etl_pipeline_spark.sources import bucketed as B

    first = bucketed_join_orders(spark, SF).collect()
    root = B._tmp_root()
    snapshot = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
    }
    second = bucketed_join_orders(spark, SF).collect()
    after = {
        os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(root)
        for f in fs
    }
    assert after == snapshot, "repeat invocation rewrote layout files"
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    B._cleanup_layouts()


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "l_orderkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()
