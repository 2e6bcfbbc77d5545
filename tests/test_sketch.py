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


def test_hll_merge_equals_union_build(spark):
    from healthcare_etl_pipeline_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    a = _items(spark, [f"u{i}" for i in range(0, 400)]).withColumn(
        "g", F.lit("g1")
    )
    b = _items(spark, [f"u{i}" for i in range(200, 700)]).withColumn(
        "g", F.lit("g1")
    )
    merged = hll_merge(
        hll_build(a, "tok", ["g"]), hll_build(b, "tok", ["g"])
    )
    direct = hll_build(a.unionByName(b), "tok", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # estimate from the merged registers tracks |A ∪ B| = 700
    est = hll_estimate(merged, ["g"]).collect()[0].hll_est
    assert abs(est - 700) / 700 < 0.15


def test_hll_rho_handles_degenerate_buckets(spark):
    from healthcare_etl_pipeline_spark.operators.sketch import hll_build

    one = _items(spark, ["solo"]).withColumn("g", F.lit("g"))
    rows = hll_build(one, "tok", ["g"]).collect()
    assert len(rows) == 1
    assert 1 <= rows[0].rho <= 61


def test_bloom_prefilter_no_false_negatives_and_selective(spark):
    from healthcare_etl_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_prefilter,
    )

    build = _items(spark, [f"k{i}" for i in range(50)])
    # probe: every build key twice (duplicate-key regression) + 1000 misses
    probe = _items(
        spark,
        [f"k{i}" for i in range(50)] * 2 + [f"m{i}" for i in range(1000)],
    )
    bits = bloom_build(build, "tok", bits=1 << 12, k=3)
    kept = bloom_prefilter(probe, "tok", bits, bits=1 << 12, k=3)
    kept_toks = [r.tok for r in kept.collect()]
    # every true member survives, with its original multiplicity
    for i in range(50):
        assert kept_toks.count(f"k{i}") == 2
    # false-positive rate for 50 keys in 4096 bits, k=3 is well under 5%
    fp = len([x for x in kept_toks if x.startswith("m")])
    assert fp < 50


def test_cms_inner_product_overestimates_join_size(spark):
    from healthcare_etl_pipeline_spark.operators.sketch import (
        cms_build,
        cms_inner_product,
    )

    rows = ["a"] * 50 + ["b"] * 20 + [f"r{i}" for i in range(30)]
    items = _items(spark, rows)
    sketch = cms_build(items, "tok", depth=4, width=256)
    est = cms_inner_product(sketch, sketch).collect()[0].join_size_est
    truth = 50 * 50 + 20 * 20 + 30  # sum n(k)^2
    assert est >= truth            # collisions only ever add
    assert est <= truth * 1.5      # and stay tight at this width
