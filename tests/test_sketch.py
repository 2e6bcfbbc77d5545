"""Count-Min sketch properties: estimates never undercount, and sketches
merge by cell-wise addition (the property that makes them work map-side)."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.sketch import cms_build, cms_estimate


def _items(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "tok string")


def test_cms_never_undercounts_and_is_tight_for_heavy(spark):
    rows = ["hot"] * 500 + [f"rare{i}" for i in range(200)]
    items = _items(spark, rows)
    sketch = cms_build(items, "tok", depth=4, width=64)
    true = {r.tok: r.cnt for r in items.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    est = {r.tok: r.cms_est for r in cms_estimate(
        sketch, items.distinct(), "tok", depth=4, width=64).collect()}
    assert set(est) == set(true)
    for tok, t in true.items():
        assert est[tok] >= t  # collisions only ever ADD
    # the heavy hitter's estimate is tight: 200 rares over 4x64 cells can
    # collide with it by at most a small margin in SOME row; min over 4
    # rows keeps the error far below the true count
    assert est["hot"] - true["hot"] < 50


def test_cms_merges_by_cellwise_addition(spark):
    a = _items(spark, ["x"] * 10 + ["y"] * 3)
    b = _items(spark, ["x"] * 5 + ["z"] * 7)
    sa = cms_build(a, "tok", depth=2, width=16)
    sb = cms_build(b, "tok", depth=2, width=16)
    merged = (
        sa.unionByName(sb)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), "tok", depth=2, width=16)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
