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


class TestJaroWinkler:
    def test_known_values_and_threshold(self, spark):
        from healthcare_etl_pipeline_spark.operators.joins import (
            jaro_winkler_blocked_pairs,
        )

        # one block; martha/marhta is the canonical Winkler example
        df = spark.createDataFrame(
            [("martha x",), ("marhta x",), ("zzzz x",)], "nm string"
        )
        out = jaro_winkler_blocked_pairs(
            df,
            "nm",
            block=F.element_at(F.split(F.col("name"), " "), -1),
            min_sim=0.9,
        ).collect()
        assert len(out) == 1
        (r,) = out
        assert {r.name_a, r.name_b} == {"martha x", "marhta x"}
        # jw("martha x","marhta x"): matches 8, transpo 1, prefix 3
        assert 0.9 < r.jw_sim < 1.0

    def test_identical_strings_collapse_to_one_name(self, spark):
        from healthcare_etl_pipeline_spark.operators.joins import (
            jaro_winkler_blocked_pairs,
        )

        # duplicates dedup into one distinct name with n=2: no self-pair
        df = spark.createDataFrame([("abc k",), ("abc k",)], "nm string")
        out = jaro_winkler_blocked_pairs(
            df, "nm", block=F.lit("k"), min_sim=0.0
        ).collect()
        assert out == []


class TestUnicodeNormalize:
    def test_nfc_composes_and_nfd_decomposes(self, spark):
        from healthcare_etl_pipeline_spark.operators.text import (
            unicode_normalize_col,
        )

        df = spark.createDataFrame([("é",), ("é",), (None,)], "s string")
        out = df.select(
            F.length(unicode_normalize_col(F.col("s"), "NFC")).alias("nfc_len"),
            F.length(unicode_normalize_col(F.col("s"), "NFD")).alias("nfd_len"),
        ).collect()
        assert [r.nfc_len for r in out] == [1, 1, None]
        assert [r.nfd_len for r in out] == [2, 2, None]

    def test_rejects_unknown_form(self, spark):
        from healthcare_etl_pipeline_spark.operators.text import (
            unicode_normalize_col,
        )

        with pytest.raises(ValueError):
            unicode_normalize_col(F.col("s"), "NFX")


class TestPhraseMatch:
    def test_counts_and_positions(self, spark):
        from healthcare_etl_pipeline_spark.operators.text import (
            phrase_match,
            positional_index,
        )

        df = spark.createDataFrame(
            [
                (1, "a b c a b"),     # "a b" at 1 and 4
                (2, "b a"),            # reversed: no match
                (3, "a a b"),          # "a b" at 2
            ],
            "doc_id long, text string",
        )
        idx = positional_index(df, "doc_id", "text")
        out = {r.doc_id: r for r in phrase_match(idx, "doc_id", ["a", "b"]).collect()}
        assert out[1].n_occurrences == 2 and out[1].first_pos == 1
        assert out[3].n_occurrences == 1 and out[3].first_pos == 2
        assert 2 not in out

    def test_trigram_requires_adjacency(self, spark):
        from healthcare_etl_pipeline_spark.operators.text import (
            phrase_match,
            positional_index,
        )

        df = spark.createDataFrame(
            [(1, "x a b c y"), (2, "a b x c")], "doc_id long, text string"
        )
        idx = positional_index(df, "doc_id", "text")
        out = {r.doc_id for r in phrase_match(idx, "doc_id", ["a", "b", "c"]).collect()}
        assert out == {1}

    def test_empty_phrase_rejected(self, spark):
        from healthcare_etl_pipeline_spark.operators.text import (
            phrase_match,
            positional_index,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            phrase_match(positional_index(df, "doc_id", "text"), "doc_id", [])
