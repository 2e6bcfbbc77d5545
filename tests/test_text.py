"""Text-analysis operator tests: tokens, quality, lang-ID, fingerprint."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators import text as X


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a  b\tc   d"), (2, ""), (3, "solo")], ["i", "text"])
    out = {r.i: r for r in df.select("i", X.token_count("text").alias("n"),
                                     X.distinct_token_count("text").alias("d")).collect()}
    assert out[1].n == 4
    assert out[2].n == 0
    assert out[3].n == 1


def test_type_token_ratio(spark):
    df = spark.createDataFrame([(1, "a a a b")], ["i", "text"])
    r = df.select(X.type_token_ratio("text").alias("ttr")).collect()[0]
    assert r.ttr == 0.5


def test_stopword_and_punct_ratio(spark):
    df = spark.createDataFrame([(1, "the cat!!! sat")], ["i", "text"])
    r = df.select(
        X.stopword_ratio("text").alias("sw"), X.punct_ratio("text").alias("p")
    ).collect()[0]
    assert abs(r.sw - 1 / 3) < 1e-9
    assert abs(r.p - 3 / 14) < 1e-9


def test_lang_id_real_stopwords(spark):
    df = spark.createDataFrame(
        [
            (1, "the house of the king and a dog"),
            (2, "der hund und die katze ist ein tier"),
            (3, "el perro y la casa de un gato que corre"),
            (4, "xyzzy plugh qwerty"),
        ],
        ["i", "text"],
    )
    out = {r.i: r.lang for r in df.select("i", X.lang_id("text").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "hello  worlds")],
        ["i", "text"],
    )
    out = {r.i: r.fp for r in df.select("i", X.fingerprint("text").alias("fp")).collect()}
    assert out[1] == out[2]  # case + whitespace noise collapses
    assert out[1] != out[3]


def test_quality_score_bounds(spark):
    good = "word " * 50
    df = spark.createDataFrame([(1, good.strip()), (2, "!!!")], ["i", "text"])
    out = {r.i: r.q for r in df.select("i", X.quality_score("text").alias("q")).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_lang_id_ngram_on_real_sentences(spark):
    """n-gram lang-ID on genuinely multilingual text (the testdata's lang
    labels are random — its text is uniformly English-ish word salad)."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.text import lang_id_ngram

    samples = [
        ("en", "the cat is sitting on the mat and singing a song of ice"),
        ("de", "der hund und die katze spielen schnell in einem schönen garten"),
        ("es", "los perros y el gato corren que saltan en la casa del pueblo"),
        ("fr", " le chien et les chats courent un peu des heures dans le parc"),
        ("zh", "这是一个在公园里的猫和狗的故事"),
        ("und", "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(samples, ["expected", "text"])
    got = {r.expected: r.pred for r in df.select(
        "expected", lang_id_ngram("text").alias("pred")
    ).collect()}
    assert got == {k: k for k in got}


def test_text_ops_edge_cases(spark):
    """Empty / whitespace / single-char / unicode docs must not produce
    nulls, NaNs, or errors in any text operator."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators import text as X
    from healthcare_etl_pipeline_spark.operators.dedup import (
        shingle_array,
        simhash,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a"), (4, "\t\n"), (5, "héllo wörld 中文 emoji")],
        ["doc_id", "text"],
    )
    out = docs.select(
        "doc_id",
        X.token_count("text").alias("n_tok"),
        X.type_token_ratio("text").alias("ttr"),
        X.stopword_ratio("text").alias("sw"),
        X.punct_ratio("text").alias("punct"),
        X.quality_score("text").alias("q"),
        X.lang_id("text").alias("lang"),
        X.lang_id_ngram("text").alias("lang_ng"),
        X.fingerprint("text").alias("fp"),
        F.size(shingle_array("text", 3)).alias("n_shingles"),
        simhash("text", bits=8).alias("sh"),
    ).collect()
    for r in out:
        assert r.n_tok >= 0
        assert r.ttr is not None and 0.0 <= r.ttr <= 1.0
        assert r.sw is not None and 0.0 <= r.sw <= 1.0
        assert r.punct is not None and 0.0 <= r.punct <= 1.0
        assert r.q is not None and 0.0 <= r.q <= 1.0
        assert r.lang is not None and r.lang_ng is not None
        assert r.fp is not None
        assert r.n_shingles >= 0
        assert r.sh is not None
    empty = {r.doc_id: r for r in out}
    assert empty[1].n_tok == 0 and empty[1].n_shingles == 0
    assert empty[2].n_tok == 0


def test_redact_pii_and_counts(spark):
    from healthcare_etl_pipeline_spark.operators.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "call 555-123-4567 or mail a.b@x.io re MRN-77 ssn 123-45-6789"),
            (2, "clean text, no identifiers at all"),
            (3, "dates like 1980-04-12 must survive"),
        ],
        ["id", "text"],
    )
    counts = pii_counts("text")
    out = {
        r.id: r
        for r in df.select(
            "id",
            redact_pii("text").alias("red"),
            counts["ssn"].alias("n_ssn"),
            counts["phone"].alias("n_phone"),
            counts["email"].alias("n_email"),
            counts["mrn"].alias("n_mrn"),
        ).collect()
    }
    assert out[1].red == "call [PHONE] or mail [EMAIL] re [MRN] ssn [SSN]"
    assert (out[1].n_ssn, out[1].n_phone, out[1].n_email, out[1].n_mrn) == (1, 1, 1, 1)
    assert out[2].red == "clean text, no identifiers at all"
    # a YYYY-MM-DD date is not an SSN (4-2-2 digits ≠ 3-2-4)
    assert "1980-04-12" in out[3].red


def test_dominant_script_flips_and_und(spark):
    from healthcare_etl_pipeline_spark.operators.text import dominant_script

    df = spark.createDataFrame(
        [
            (1, "hello world plain latin"),
            (2, "привет мир это кириллица"),        # cyrillic dominant
            (3, "你好世界这是中文测试文本内容"),        # han dominant
            (4, "مرحبا بالعالم هذا نص عربي طويل"),   # arabic dominant
            (5, "hi привет"),                        # cyrillic 6 > latin 2
            (6, "12345 !!! ..."),                    # no script chars
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.s for r in df.select("doc_id", dominant_script("text").alias("s")).collect()}
    assert got == {1: "latin", 2: "cyrillic", 3: "han", 4: "arabic", 5: "cyrillic", 6: "und"}


def test_url_extraction_and_domains(spark):
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.text import extract_urls, url_domain

    df = spark.createDataFrame(
        [(1, "go to https://a.example.org/x and http://b.net no-url text")],
        ["doc_id", "text"],
    )
    urls = df.select(F.explode(extract_urls("text")).alias("url"))
    got = [(r.url, d.domain) for r, d in zip(
        urls.collect(), urls.select(url_domain("url").alias("domain")).collect()
    )]
    assert got == [
        ("https://a.example.org/x", "a.example.org"),
        ("http://b.net", "b.net"),
    ]


def test_chunking_registered_query_consistency(spark):
    """chunk boundaries reconstruct the document when stride == window."""
    from healthcare_etl_pipeline_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_documents(df, window=32, stride=32).collect()
    rebuilt = " ".join(r.chunk_text for r in sorted(out, key=lambda r: r.chunk_index))
    assert rebuilt == text
