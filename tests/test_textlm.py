"""Edge-case tests for the round-3 text/LM wave: classifier scoring,
perplexity buckets, intra-document dedup, CDC chunking.

(Value correctness vs DuckDB is covered by the registered oracles; these
tests pin the edge semantics oracles can't reach: empty documents, exact
self-repetition, CDC boundary invariants.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.dedup import (
    cdc_chunk_census,
    intra_doc_segment_dedup,
)
from healthcare_etl_pipeline_spark.operators.scoring import (
    hashed_linear_score,
    perplexity_buckets,
)


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta alpha beta gamma delta"),
            Row(doc_id=2, text="one two three four five six seven eight nine"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text="x"),
        ]
    )


def test_classifier_empty_doc_scores_half(spark, docs):
    rows = {r["doc_id"]: r for r in hashed_linear_score(docs).collect()}
    assert rows[3]["n_tokens"] == 0
    assert rows[3]["quality_score"] == 0.5
    assert rows[3]["keep"] is True
    # non-empty docs get a score strictly inside (0, 1)
    assert 0.0 < rows[1]["quality_score"] < 1.0


def test_classifier_is_deterministic(spark, docs):
    a = sorted(hashed_linear_score(docs).collect())
    b = sorted(hashed_linear_score(docs).collect())
    assert a == b


def test_intra_doc_dedup_removes_exact_repeat(spark, docs):
    rows = {r["doc_id"]: r for r in intra_doc_segment_dedup(docs).collect()}
    # doc 1 is the same 4-token segment twice -> second occurrence dropped
    assert rows[1]["n_segments"] == 2
    assert rows[1]["n_unique_segments"] == 1
    assert rows[1]["dedup_text"] == "alpha beta gamma delta"
    assert rows[1]["intra_dup_ratio"] == 0.5
    # doc 2 has no repeats -> text unchanged
    assert rows[2]["dedup_text"] == "one two three four five six seven eight nine"
    assert rows[2]["n_segments"] == rows[2]["n_unique_segments"] == 3
    # empty doc: zero segments, empty text, ratio 0
    assert rows[3]["n_segments"] == 0
    assert rows[3]["dedup_text"] == ""
    assert rows[3]["intra_dup_ratio"] == 0.0
    # single-token doc survives as its own (short) segment
    assert rows[4]["dedup_text"] == "x"


def test_cdc_chunks_cover_text_and_realign(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    shifted = "PREFIX! " + base
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=shifted)]
    )
    census = cdc_chunk_census(df)
    # content-defined boundaries realign after the prefix insertion, so
    # the two docs must share at least one duplicated chunk
    shared = census.filter(F.col("n_docs") == 2).count()
    assert shared >= 1
    # every census row is a genuine duplicate
    assert census.filter(F.col("n_occurrences") < 2).count() == 0


def test_cdc_short_doc_is_single_chunk(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="tiny"), Row(doc_id=2, text="tiny")]
    )
    rows = cdc_chunk_census(df).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_len"] == 4
    assert rows[0]["n_occurrences"] == 2
    assert rows[0]["n_docs"] == 2


def test_perplexity_buckets_partition_corpus(spark):
    # 9 docs over a skewed vocabulary: common-word docs must out-rank
    # rare-word docs
    rows = [
        Row(doc_id=i, text=" ".join(["common"] * 5))
        for i in range(3)
    ] + [
        Row(doc_id=10 + i, text="common mid mid common mid") for i in range(3)
    ] + [
        Row(doc_id=20 + i, text=f"rare{i}a rare{i}b rare{i}c rare{i}d rare{i}e")
        for i in range(3)
    ]
    out = perplexity_buckets(spark.createDataFrame(rows))
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert all(got[i] == "head" for i in range(3))
    assert all(got[20 + i] == "tail" for i in range(3))
    # each tier is non-empty and the assignment is exhaustive
    assert set(got.values()) == {"head", "middle", "tail"}
    assert len(got) == 9
