"""Custom join operator tests: as-of, binned range join, salted join."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators import joins as J


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (2, 15, "t3")],
        ["key", "t", "trade"],
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 101.0), (1, 18, 102.0), (2, 30, 200.0)],
        ["key", "qt", "px"],
    )
    return trades, quotes


def test_asof_join_inclusive(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
    )
    got = {r.trade: r.px for r in out.collect()}
    # t1@10: quote@10 visible (inclusive); t2@20: quote@18; t3@15: no quote yet
    assert got == {"t1": 101.0, "t2": 102.0, "t3": None}


def test_asof_join_strict(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
        strict=True,
    )
    got = {r.trade: r.px for r in out.collect()}
    # strict: quote@10 NOT visible to trade@10 → falls back to quote@5
    assert got == {"t1": 100.0, "t2": 102.0, "t3": None}


def test_asof_join_keeps_all_left_rows(spark):
    trades, quotes = _frames(spark)
    out = J.asof_join(
        trades,
        quotes.select("key", "qt", "px"),
        key="key",
        left_time="t",
        right_time="qt",
        payload_cols=["px"],
    )
    assert out.count() == trades.count()


def test_range_join_binned_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(100, 3.0, 9.0), (200, 8.5, 20.0), (300, 45.0, 60.0)],
        ["iid", "lo", "hi"],
    )
    binned = J.range_join_binned(
        points, intervals, left_point="x", right_lo="lo", right_hi="hi", bin_width=5.0
    )
    naive = points.crossJoin(intervals).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    )
    assert {(r.pid, r.iid) for r in binned.collect()} == {
        (r.pid, r.iid) for r in naive.collect()
    }


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], ["k", "v"]
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "name"])
    salted = J.salted_join(big, small, key="k", salt_buckets=4)
    plain = big.join(small, "k")
    assert salted.count() == plain.count() == 100
    assert {(r.k, r.v, r.name) for r in salted.collect()} == {
        (r.k, r.v, r.name) for r in plain.collect()
    }


def test_asof_join_random_sweep_vs_naive(spark):
    """Union-merge as-of join == naive join+rank on randomized inputs
    (seeded): keys with no matches, ties at identical timestamps, multiple
    rights between lefts, empty right side for some keys."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(7)
    for trial in range(6):
        n_keys = rng.randint(1, 4)
        lefts = [
            (k, rng.randint(0, 30), f"L{trial}_{i}")
            for i, k in enumerate(rng.choices(range(n_keys), k=rng.randint(1, 12)))
        ]
        rights = [
            (k, rng.randint(0, 30), float(i))
            for i, k in enumerate(rng.choices(range(n_keys + 1), k=rng.randint(0, 12)))
        ]
        left = spark.createDataFrame(lefts, ["key", "t", "tag"])
        if rights:
            right = spark.createDataFrame(rights, ["key", "rt", "px"])
        else:
            right = spark.createDataFrame([], "key int, rt int, px double")
        # naive: all (left, earlier-right) pairs, keep latest right (ties →
        # max px, mirroring deterministic max-tie-break after dedup)
        right_dedup = (
            right.groupBy("key", "rt").agg(F.max("px").alias("px"))
        )
        got = {
            (r.tag, r.px)
            for r in J.asof_join(
                left,
                right_dedup,
                key="key",
                left_time="t",
                right_time="rt",
                payload_cols=["px"],
            ).collect()
        }
        w = Window.partitionBy("tag").orderBy(F.desc("rt"))
        naive = (
            left.join(
                right_dedup,
                (left.key == right_dedup.key) & (right_dedup.rt <= left.t),
                "left",
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        want = {(r.tag, r.px) for r in naive.collect()}
        assert got == want, (trial, sorted(got), sorted(want))
