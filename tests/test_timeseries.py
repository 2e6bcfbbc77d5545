"""Gap-fill resample + incremental view edge cases on synthetic fixtures."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.timeseries import resample_ffill
from healthcare_etl_pipeline_spark.streaming.incremental import IncrementalAggView


def test_resample_fills_interior_gap_and_carries_value(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), 10.0),
        (1, datetime(2024, 1, 1, 0, 50), 30.0),
        # hours 1 and 2 are silent
        (1, datetime(2024, 1, 1, 3, 5), 7.0),
        (2, datetime(2024, 1, 1, 5, 0), 1.0),  # single-hour key
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {(r.user_id, r.bucket.hour): r for r in resample_ffill(
        df, "user_id", "ts", "value").collect()}

    # dense grid: user 1 has hours 0..3, user 2 only hour 5
    assert sorted(k for k in out if k[0] == 1) == [(1, 0), (1, 1), (1, 2), (1, 3)]
    assert sorted(k for k in out if k[0] == 2) == [(2, 5)]
    # observed hour aggregates
    assert out[(1, 0)].n_events == 2 and out[(1, 0)].value_sum == 40.0
    # gap hours: zeros + forward-filled mean from hour 0
    for h in (1, 2):
        assert out[(1, h)].n_events == 0
        assert out[(1, h)].value_sum == 0.0
        assert out[(1, h)].last_value_avg == 20.0
    # hour 3 overwrites the carried value with its own mean
    assert out[(1, 3)].last_value_avg == 7.0


def test_incremental_view_merge_equals_batch(spark):
    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, value double"
    )
    b2 = spark.createDataFrame(
        [("b", 1.0), ("c", 4.0)], "k string, value double"
    )
    view = IncrementalAggView(["k"], "value")
    view.merge_batch(b1, 0)
    view.merge_batch(b2, 1)
    out = {r.k: (r.n, r.value_sum) for r in view.result().collect()}
    assert out == {"a": (2, 3.0), "b": (2, 6.0), "c": (1, 4.0)}
    assert view.n_batches == 2


def test_incremental_view_full_mergeable_algebra(spark):
    """min/max/avg/HLL-distinct maintained incrementally must equal the
    batch recomputation — including the merge paths where a group is
    absent from one side (state-only and partial-only groups)."""
    from healthcare_etl_pipeline_spark.operators.incremental_agg import AggSpec

    b1 = spark.createDataFrame(
        [("a", 1.0, 10), ("a", 5.0, 11), ("b", 2.0, 10)],
        "k string, value double, uid long",
    )
    b2 = spark.createDataFrame(
        [("a", 3.0, 10), ("c", 7.0, 12)], "k string, value double, uid long"
    )
    specs = [
        AggSpec("n", "count"),
        AggSpec("lo", "min", "value"),
        AggSpec("hi", "max", "value"),
        AggSpec("mean", "avg", "value"),
        AggSpec("users", "approx_distinct", "uid"),
    ]
    view = IncrementalAggView(["k"], "value", aggs=specs)
    view.merge_batch(b1, 0)
    view.merge_batch(b2, 1)
    out = {r.k: r for r in view.result().collect()}
    assert out["a"].n == 3 and out["a"].lo == 1.0 and out["a"].hi == 5.0
    assert out["a"].mean == pytest.approx(3.0)
    assert out["b"].n == 1 and out["b"].lo == out["b"].hi == 2.0
    assert out["c"].n == 1 and out["c"].mean == pytest.approx(7.0)
    # tiny cardinalities: the HLL estimate is exact in practice; allow
    # the sketch's error bound anyway
    assert abs(out["a"].users - 2) <= 1
    assert abs(out["c"].users - 1) <= 1


@pytest.mark.parametrize("seed", [3, 41])
def test_mergeable_algebra_is_split_invariant(spark, seed):
    """The algebra's defining property: folding a dataset in ANY batch
    split must equal the single-batch aggregate — including null values,
    empty batches, and groups confined to one side of the split."""
    import random

    from healthcare_etl_pipeline_spark.operators.incremental_agg import AggSpec

    rng = random.Random(seed)
    rows = [
        (
            rng.choice(["a", "b", "c", "d"]),
            rng.choice([None, float(rng.randint(-50, 50))]),
            rng.randint(1, 6),
        )
        for _ in range(60)
    ]
    schema = "k string, value double, uid long"
    specs = [
        AggSpec("n", "count"),
        AggSpec("total", "sum", "value"),
        AggSpec("lo", "min", "value"),
        AggSpec("hi", "max", "value"),
        AggSpec("users", "approx_distinct", "uid"),
    ]

    whole = IncrementalAggView(["k"], "value", aggs=specs)
    whole.merge_batch(spark.createDataFrame(rows, schema), 0)
    expect = {r.k: r for r in whole.result().collect()}

    split = IncrementalAggView(["k"], "value", aggs=specs)
    cut1, cut2 = sorted(rng.sample(range(len(rows)), 2))
    for i, chunk in enumerate((rows[:cut1], rows[cut1:cut2], rows[cut2:])):
        split.merge_batch(spark.createDataFrame(chunk, schema), i)
    got = {r.k: r for r in split.result().collect()}

    assert set(got) == set(expect)
    for k in expect:
        assert got[k].n == expect[k].n, k
        assert got[k].total == expect[k].total, k
        assert got[k].lo == expect[k].lo and got[k].hi == expect[k].hi, k
        assert got[k].users == expect[k].users, k  # HLL merge is exact-split-invariant


def test_time_decay_halves_per_half_life(spark):
    from healthcare_etl_pipeline_spark.operators.timeseries import (
        time_decay_agg,
    )

    df = spark.createDataFrame(
        [(1, 100.0, "2023-01-01"), (1, 100.0, "2022-01-01")],
        "k long, v double, d string",
    ).withColumn("d", F.col("d").cast("date"))
    out = time_decay_agg(
        df, ["k"], "v", "d", as_of="2023-01-01", half_life_days=365.0
    ).collect()[0]
    # today's 100 at weight 1.0; the 365-day-old 100 at exactly 0.5
    assert out.total == 200.0
    assert abs(out.decayed_total - 150.0) < 1e-6


def test_transition_matrix_counts_and_rowwise_probs(spark):
    from healthcare_etl_pipeline_spark.operators.timeseries import (
        transition_matrix,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
        (2, 1, "a"), (2, 2, "b"),                 # a->b
        (3, 1, "c"),                              # lone state: no pair
    ]
    df = spark.createDataFrame(rows, "u long, seq long, s string")
    out = {
        (r.from_state, r.to_state): (r.cnt, r.prob)
        for r in transition_matrix(df, "u", [F.col("seq")], "s").collect()
    }
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")] == (1, 1.0)
    assert not any(f == "c" for f, _ in out)
