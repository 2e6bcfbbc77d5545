"""Edge-case tests for operators/corpus.py (the sf corpora are uniform
word-salad, so degenerate shapes — empty docs, hot tokens, repetition —
need synthetic fixtures)."""

import math

import pytest
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.corpus import (
    inverted_index,
    pack_sequences,
    repetition_stats,
    tfidf_top_terms,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_flags_spam_and_tolerates_empty(spark):
    df = _docs(
        spark,
        [
            (1, "buy buy buy buy buy buy buy buy buy buy"),  # one token dominates
            (2, "the quick brown fox jumps over a lazy dog tonight"),
            (3, ""),  # empty: no grams at all
            (4, "ab"),  # single token: no bigrams/trigrams
        ],
    )
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert out[1].top_unigram_frac == 1.0 and not out[1].keep
    assert out[2].top_unigram_frac == 0.1 and out[2].keep
    # gram orders that don't exist contribute 0.0 (no repetition evidence)
    for d in (3, 4):
        assert out[d].top_bigram_frac == 0.0
        assert out[d].dup_trigram_frac == 0.0
    # empty doc: no unigrams either -> passes the gate
    assert out[3].top_unigram_frac == 0.0 and out[3].keep
    # single-token doc: its one unigram occupies 100% -> gated out
    assert out[4].top_unigram_frac == 1.0 and not out[4].keep


def test_unigram_logprob_hand_computed(spark):
    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    df = _docs(spark, [(1, "a a a"), (2, "b")])
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert out[1].avg_token_logprob == pytest.approx(round(math.log(0.75), 6))
    assert out[2].avg_token_logprob == pytest.approx(round(math.log(0.25), 6))
    assert out[1].n_tokens == 3


def test_pack_sequences_contiguous_per_shard(spark):
    df = _docs(spark, [(i, " ".join(["w"] * 100)) for i in range(40)])
    out = pack_sequences(df, context=256, shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) and all(0 <= s < 4 for s in by_shard)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.doc_id)
        # offsets are the running sum of preceding docs in the shard stream
        expect = 0
        for r in rows:
            assert r.start_offset == expect
            assert r.offset_in_pack == expect % 256
            assert r.pack_id == r.shard * (1 << 40) + expect // 256
            # 100 tokens, 256 context: spans 1 or 2 packs
            assert r.n_packs_spanned == (expect + 99) // 256 - expect // 256 + 1
            expect += r.n_tokens


def test_tfidf_rare_term_wins_and_ties_break_by_token(spark):
    df = _docs(
        spark,
        [
            (1, "common rare common common"),
            (2, "common common zeta alpha"),
            (3, "common filler filler"),
        ],
    )
    out = tfidf_top_terms(df, k=2).collect()
    top1 = {r.doc_id: r.tok for r in out if r.rank == 1}
    # 'common' appears in every doc -> idf=0 -> never outranks a rare term
    assert top1[1] == "rare"
    assert top1[3] == "filler"
    # doc 2: alpha and zeta tie on tfidf (tf=1, df=1) -> token order breaks it
    doc2 = sorted((r.rank, r.tok) for r in out if r.doc_id == 2)
    assert doc2 == [(1, "alpha"), (2, "zeta")]


def test_inverted_index_caps_hot_token_postings(spark):
    rows = [(i, "hot unique%d" % i) for i in range(50)]
    df = _docs(spark, rows)
    out = {r.tok: r for r in inverted_index(df, min_df=5, max_postings=10).collect()}
    assert list(out) == ["hot"]  # unique tokens have df=1 < 5
    assert out["hot"].df == 50  # df counts ALL docs...
    assert out["hot"].postings == list(range(10))  # ...postings capped at 10 smallest


def test_bm25_ranks_term_dense_doc_first_and_caps_k(spark):
    from healthcare_etl_pipeline_spark.operators.corpus import bm25_topk

    docs = _docs(
        spark,
        [(1, "alpha beta alpha beta alpha"), (2, "alpha gamma delta"),
         (3, "gamma delta epsilon zeta"), (4, "beta beta beta beta")]
        + [(10 + i, "filler words only here") for i in range(6)],
    )
    out = bm25_topk(docs, ["alpha", "beta"], k=3).collect()
    assert len(out) == 3
    assert out[0].doc_id == 1          # densest in query terms
    assert out[0].terms_matched == 2
    ids = {r.doc_id for r in out}
    assert 3 not in ids and 10 not in ids  # no-match docs never score


def test_hashed_features_preserve_signed_counts(spark):
    from healthcare_etl_pipeline_spark.operators.corpus import hashed_features

    docs = _docs(spark, [(1, "x x x y"), (2, "x y")])
    out = hashed_features(docs, dim=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.idx] = r.val
    # same tokens -> same buckets across docs; |val| bounded by token count
    assert set(by_doc[2]).issubset(set(by_doc[1]))
    assert sum(abs(v) for v in by_doc[1].values()) <= 4
    # doc 1 has 3 'x' and 1 'y': bucket magnitudes are 3 and 1 (or 2 if
    # x and y collide with opposite signs); total L1 >= 2 regardless
    assert sum(abs(v) for v in by_doc[1].values()) >= 2


def test_segment_dedup_strips_repeated_segments(spark):
    from healthcare_etl_pipeline_spark.operators.corpus import segment_dedup

    boiler = "subscribe to our newsletter now"  # 5 tokens = one segment
    # prefixes are exactly seg_tokens long so the boilerplate aligns to a
    # segment boundary in every document (the non-overlapping split is
    # alignment-sensitive by design — same as line-keyed CCNet dedup)
    rows = [
        (1, f"alpha beta gamma delta five {boiler} unique one text here"),
        (2, f"epsilon zeta eta theta iota {boiler} unique two text there"),
        (3, boiler),  # boilerplate-only doc: must drop out entirely
        (4, "totally original content with no repeats at all ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=5, min_df=2).collect()}

    assert 3 not in out  # every segment was boilerplate
    assert boiler not in out[1].clean_text
    assert boiler not in out[2].clean_text
    assert "alpha beta gamma delta five" in out[1].clean_text
    assert out[4].n_kept == out[4].n_segments  # untouched doc keeps all
    # survivors reassemble in original segment order
    assert out[1].clean_text.startswith("alpha beta gamma delta")


def test_importance_weights_separates_domains(spark):
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.corpus import importance_weights

    # target domain speaks only 'aa bb', raw domain only 'zz yy' — a target
    # doc must score positive, a raw doc negative, and a mixed doc between
    rows = [
        (1, "t", "aa bb aa bb aa"),
        (2, "t", "bb aa bb"),
        (3, "r", "zz yy zz yy"),
        (4, "r", "yy zz yy"),
        (5, "r", "aa bb zz yy"),  # mixed
        (6, "r", ""),             # empty: must drop out
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "dom", "text"])
    out = {
        r.doc_id: r
        for r in importance_weights(
            docs, F.col("dom") == "t", buckets=64
        ).collect()
    }
    assert 6 not in out
    assert out[1].n_tokens == 5
    assert out[1].importance > 0
    assert out[2].importance > 0
    assert out[3].importance < 0
    assert out[4].importance < 0
    assert out[3].importance < out[5].importance < out[1].importance


def test_bm25_stats_incremental_equals_bootstrap(spark):
    """N signed increments (+ one retraction) of the maintained stats
    view must equal a single-batch bootstrap over the surviving corpus —
    token df rows identical (retracted-to-zero tokens GONE, not df=0),
    global (n_docs, avgdl) identical."""
    from healthcare_etl_pipeline_spark.operators.corpus import Bm25CorpusStats

    rows = [
        (1, "alpha beta beta gamma"),
        (2, "beta gamma delta"),
        (3, "unique_tok alpha"),
        (4, "gamma gamma gamma"),
        (5, "epsilon beta alpha"),
        (6, "zeta unique_tok"),
    ]
    docs = _docs(spark, rows)

    inc = Bm25CorpusStats()
    for i in (0, 1, 2):
        inc.apply_batch(docs.filter(F.col("doc_id") % 3 == i))
    inc.apply_batch(docs.filter(F.col("doc_id") % 3 == 0), sign=-1)

    boot = Bm25CorpusStats()
    boot.apply_batch(docs.filter(F.col("doc_id") % 3 != 0))

    tok_inc = {(r.tok, r.df) for r in inc.token_stats().collect()}
    tok_boot = {(r.tok, r.df) for r in boot.token_stats().collect()}
    assert tok_inc == tok_boot
    # docs 3 and 6 (doc_id%3==0) were retracted — the only two carrying
    # unique_tok, so its df hit zero and the row must be GONE
    assert not any(tok == "unique_tok" for tok, _ in tok_inc)
    assert ("delta", 1) in tok_inc
    g_inc = inc.global_stats().collect()[0]
    g_boot = boot.global_stats().collect()[0]
    assert (g_inc.n_docs, g_inc.avgdl) == (g_boot.n_docs, g_boot.avgdl)


def test_bm25_from_stats_equals_recompute(spark):
    """Serving from the maintained view is value-identical to the
    from-scratch bm25_topk over the same corpus."""
    from healthcare_etl_pipeline_spark.operators.corpus import (
        Bm25CorpusStats,
        bm25_topk,
        bm25_topk_from_stats,
    )

    rows = [
        (i, f"hash join scan {'hash ' * (i % 4)}tail{i}") for i in range(40)
    ]
    docs = _docs(spark, rows)
    stats = Bm25CorpusStats()
    for i in (0, 1):
        stats.apply_batch(docs.filter(F.col("doc_id") % 2 == i))

    terms = ["hash", "join", "scan"]
    direct = [tuple(r) for r in bm25_topk(docs, terms, k=15).collect()]
    via = [
        tuple(r)
        for r in bm25_topk_from_stats(docs, stats, terms, k=15).collect()
    ]
    assert direct == via
