"""Unit tests for the round-4 extension wave: per-key EWMA fold,
sequential-pattern support, and KMV set sketches."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


class TestEwmaFold:
    def test_matches_pandas_ewm_recurrence(self, spark):
        from healthcare_etl_pipeline_spark.operators.timeseries import ewma_fold

        rows = [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)]
        df = spark.createDataFrame(rows, "k long, o long, x double")
        out = {r.k: r for r in ewma_fold(df, "k", ["o"], "x", alpha=0.5).collect()}
        # state: 10 -> 15 -> 22.5
        assert out[1].ewma == 22.5
        assert out[1].n_points == 3
        assert out[1].last_value == 30.0
        # single point: ewma == the point
        assert out[2].ewma == 5.0

    def test_order_column_controls_fold_order(self, spark):
        from healthcare_etl_pipeline_spark.operators.timeseries import ewma_fold

        # same values, reversed order column -> different fold result
        rows = [(1, 2, 10.0), (1, 1, 20.0)]
        df = spark.createDataFrame(rows, "k long, o long, x double")
        (r,) = ewma_fold(df, "k", ["o"], "x", alpha=0.5).collect()
        assert r.ewma == 15.0  # 20 then 10: 20 -> 15

    def test_min_points_filters_short_series(self, spark):
        from healthcare_etl_pipeline_spark.operators.timeseries import ewma_fold

        rows = [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 9.0)]
        df = spark.createDataFrame(rows, "k long, o long, x double")
        ks = {r.k for r in ewma_fold(df, "k", ["o"], "x", alpha=0.3, min_points=2).collect()}
        assert ks == {1}


class TestSequentialPatternSupport:
    def _df(self, spark, events):
        return spark.createDataFrame(
            [(u, _ts(m), t) for u, m, t in events],
            "user_id long, ts timestamp, event_type string",
        )

    def test_containment_allows_gaps(self, spark):
        from healthcare_etl_pipeline_spark.operators.mining import (
            sequential_pattern_support,
        )

        df = self._df(spark, [
            (1, 0, "a"), (1, 1, "x"), (1, 2, "b"),   # a..b with a gap
            (2, 0, "b"), (2, 1, "a"),                 # wrong order
        ])
        out = {r.pattern: r for r in sequential_pattern_support(
            df, "user_id", "ts", "event_type", {"a>b": ["a", "b"]}
        ).collect()}
        assert out["a>b"].n_users == 1
        assert out["a>b"].n_total_users == 2
        assert out["a>b"].support == 0.5

    def test_strictly_increasing_ts_required(self, spark):
        from healthcare_etl_pipeline_spark.operators.mining import (
            sequential_pattern_support,
        )

        # a and b at the SAME timestamp: not a valid a-before-b embedding
        df = self._df(spark, [(1, 0, "a"), (1, 0, "b")])
        (r,) = sequential_pattern_support(
            df, "user_id", "ts", "event_type", {"a>b": ["a", "b"]}
        ).collect()
        assert r.n_users == 0

    def test_three_step_pattern_and_greedy_nonblocking(self, spark):
        from healthcare_etl_pipeline_spark.operators.mining import (
            sequential_pattern_support,
        )

        # a a b c: greedy takes the FIRST a; embedding still found.
        df = self._df(spark, [
            (1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
            (2, 0, "a"), (2, 1, "c"), (2, 2, "b"),   # c before b: no
        ])
        out = {r.pattern: r.n_users for r in sequential_pattern_support(
            df, "user_id", "ts", "event_type",
            {"abc": ["a", "b", "c"], "ab": ["a", "b"]}
        ).collect()}
        assert out["abc"] == 1
        assert out["ab"] == 2


class TestKmvSketch:
    def test_exact_below_k_and_union_membership(self, spark):
        from healthcare_etl_pipeline_spark.operators.sketch import (
            kmv_build,
            kmv_estimate,
            kmv_union,
        )

        rows = [("A", i) for i in range(40)] + [("B", i) for i in range(20, 70)]
        df = spark.createDataFrame(rows, "s string, item long")
        sk = kmv_build(df, "item", "s", k=256)
        got = {r.s: r.kmv for r in sk.collect()}
        # below saturation the sketch IS the distinct hash set
        assert len(got["A"]) == 40 and len(got["B"]) == 50
        assert got["A"] == sorted(got["A"])
        merged = (
            sk.filter(F.col("s") == "A").select(F.col("kmv").alias("ka"))
            .crossJoin(sk.filter(F.col("s") == "B").select(F.col("kmv").alias("kb")))
            .select(
                kmv_union(F.col("ka"), F.col("kb"), 256).alias("ku"),
                kmv_estimate(kmv_union(F.col("ka"), F.col("kb"), 256), 256).alias("est"),
            )
            .collect()[0]
        )
        assert len(merged.ku) == 70  # |A ∪ B| = |0..69| exactly, unsaturated
        assert merged.est == 70.0

    def test_saturated_estimate_within_tolerance(self, spark):
        from healthcare_etl_pipeline_spark.operators.sketch import (
            kmv_build,
            kmv_estimate,
        )

        n, k = 20000, 128
        df = spark.createDataFrame([("A", i) for i in range(n)], "s string, item long")
        sk = kmv_build(df, "item", "s", k=k)
        (r,) = sk.select(kmv_estimate(F.col("kmv"), k).alias("est")).collect()
        assert abs(r.est - n) / n < 0.3  # ~1/sqrt(128) = 8.8%; 3.4 sigma

    def test_prefilter_does_not_change_answer(self, spark):
        from healthcare_etl_pipeline_spark.operators.sketch import kmv_build

        df = spark.createDataFrame([("A", i) for i in range(5000)], "s string, item long")
        tight = kmv_build(df, "item", "s", k=64, safety=4)
        loose = kmv_build(df, "item", "s", k=64, safety=1000)
        assert tight.collect()[0].kmv == loose.collect()[0].kmv
