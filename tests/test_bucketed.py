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


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "l_orderkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert joined.count() == plain.count()
