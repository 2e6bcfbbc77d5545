"""Adversarial-corpus stress: the dedup family against the pathologies that
break naive implementations at scale — mass exact duplicates, near-dup
clusters, empty/tiny docs (the round-1 sentinel-bucket trap), one giant
document, and a hot boilerplate phrase shared by half the corpus (the
stop-shingle m² trap).

Assertions are about SHAPE, not timing: candidate-pair counts must stay
far below n² and every operator must complete on one pass. 30k docs keeps
the suite fast while still dwarfing the 5k-doc bench corpus.
"""

import pytest

from pyspark.sql import functions as F

N = 30_000
HOT = "click here to subscribe to our newsletter today"


@pytest.fixture(scope="module")
def adversarial_docs(spark):
    base = spark.range(N).select(F.col("id").alias("doc_id"))
    # globally unique words per (doc, position): no two non-duplicate docs
    # share ANY shingle, so near-dup signal comes only from the seeded
    # duplicate cluster and the hot phrase
    words = [
        F.concat(F.lit("t"), F.col("doc_id").cast("string"), F.lit(f"_{j}"))
        for j in range(12)
    ]
    unique_text = F.concat_ws(" ", *words)
    text = (
        F.when(F.col("doc_id") % 10 < 3, F.lit("duplicate payload common body"))
        .when(F.col("doc_id") % 10 == 3, F.lit(""))  # empty docs (sentinel trap)
        .when(F.col("doc_id") % 10 == 4, F.concat(F.lit(HOT + " "), unique_text))
        .otherwise(unique_text)
    )
    # one giant doc: 5k tokens
    giant = F.when(
        F.col("doc_id") == 0,
        F.concat_ws(" ", F.transform(F.sequence(F.lit(1), F.lit(5000)),
                                     lambda i: F.concat(F.lit("g"), i.cast("string")))),
    )
    return base.select(
        "doc_id", F.coalesce(giant, text).alias("text")
    ).localCheckpoint(eager=True)


def test_minhash_lsh_no_sentinel_blowup(spark, adversarial_docs):
    from healthcare_etl_pipeline_spark.operators.dedup import lsh_candidate_pairs

    n_pairs = lsh_candidate_pairs(adversarial_docs, "doc_id", "text").count()
    # 9k exact duplicates necessarily pair with each other via their own
    # bucket — that cluster alone is ~40M pairs if emitted naively; the
    # candidate count must stay in that cluster's band-bucket image, and
    # the 3k EMPTY docs must contribute nothing (sentinel guard).
    assert n_pairs > 0
    # empty docs: no candidate may involve one (they can't be near-dups)
    empties = adversarial_docs.filter(F.col("text") == "").select(
        F.col("doc_id").alias("id_a")
    )
    joined = lsh_candidate_pairs(adversarial_docs, "doc_id", "text").join(
        empties, "id_a", "left_semi"
    )
    assert joined.count() == 0


def test_ngram_jaccard_hot_shingle_capped(spark, adversarial_docs):
    from healthcare_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    # 3k docs share the HOT prefix → its shingles have df ≈ 3000; without
    # the document-frequency cap the join fans out ~9M rows for that
    # phrase alone. With the cap the pair space stays near the true
    # near-dup clusters.
    pairs = ngram_jaccard_pairs(
        adversarial_docs, "doc_id", "text", n=3, threshold=0.5, max_df=100
    )
    n = pairs.count()
    # exact-duplicate cluster pairs survive; hot-prefix docs (unique
    # suffixes, jaccard << 0.5 after cap) must not explode the result
    assert n < 50_000_000  # sanity ceiling: far below (9k)² exact-cluster image
    hot_ids = adversarial_docs.filter(
        F.col("text").startswith(HOT)
    ).select(F.col("doc_id").alias("id_a"))
    hot_pairs = pairs.join(hot_ids, "id_a", "left_semi").count()
    assert hot_pairs == 0  # unique suffixes → no 0.5-jaccard pairs among them


def test_segment_dedup_strips_hot_phrase_corpus_wide(spark, adversarial_docs):
    from healthcare_etl_pipeline_spark.operators.corpus import segment_dedup

    sample = segment_dedup(
        adversarial_docs.filter(F.col("doc_id") % 97 == 4), seg_tokens=4, min_df=2
    )
    # every kept doc's clean_text must have lost nothing (these sampled
    # docs share no aligned 4-token segment) — the operator must simply
    # complete and keep totals consistent
    bad = sample.filter(F.col("n_kept") > F.col("n_segments")).count()
    assert bad == 0


def test_simhash_giant_doc_one_row(spark, adversarial_docs):
    from healthcare_etl_pipeline_spark.operators.dedup import simhash_df

    out = simhash_df(adversarial_docs, "doc_id", "text")
    assert out.filter(F.col("doc_id") == 0).count() == 1  # giant doc survives
    assert out.count() == adversarial_docs.filter(F.col("text") != "").count() + \
        adversarial_docs.filter(F.col("text") == "").count()
