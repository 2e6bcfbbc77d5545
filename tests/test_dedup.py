"""Dedup operator tests: exact, shingles, MinHash-LSH, Jaccard, SimHash."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators import dedup as D

DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
DOC_B = "completely different content about spark query engines and shuffles"


def _docs(spark):
    return spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A_NEAR), (3, DOC_B), (4, DOC_A)],
        ["doc_id", "text"],
    )


def test_dedup_exact_keeps_min(spark):
    df = _docs(spark)
    kept = D.dedup_exact(df, ["text"], "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3]


def test_duplicate_groups(spark):
    groups = D.duplicate_groups(_docs(spark), ["text"]).collect()
    assert len(groups) == 1
    assert groups[0].group_size == 2


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "one"), (3, "")], ["doc_id", "text"])
    out = df.select(D.shingle_array("text", 3).alias("sh")).collect()
    assert all(r.sh == [] for r in out)


def test_shingle_count(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    out = df.select(D.shingle_array("text", 3).alias("sh")).collect()[0].sh
    assert out == ["a b c", "b c d", "c d e"]


def test_minhash_identical_docs_identical_sigs(spark):
    sigs = {r.doc_id: r for r in D.minhash_signatures_df(_docs(spark), "doc_id", "text").collect()}
    for j in range(8):
        assert sigs[1][f"sig_{j}"] == sigs[4][f"sig_{j}"]  # exact dup
    # near dup shares most signature rows
    matches = sum(sigs[1][f"sig_{j}"] == sigs[2][f"sig_{j}"] for j in range(8))
    assert matches >= 4
    # unrelated doc shares (almost) none
    mismatches = sum(sigs[1][f"sig_{j}"] != sigs[3][f"sig_{j}"] for j in range(8))
    assert mismatches >= 7


def test_lsh_finds_near_dup_pair(spark):
    pairs = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(_docs(spark), "doc_id", "text").collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near dup lands in a shared band
    assert (1, 3) not in pairs  # unrelated doc does not


def test_ngram_jaccard_exact_values(spark):
    out = {
        (r.id_a, r.id_b): r
        for r in D.ngram_jaccard_pairs(_docs(spark), "doc_id", "text", threshold=0.0).collect()
    }
    assert out[(1, 4)].jaccard == 1.0
    near = out[(1, 2)]
    # 13-token docs → 11 shingles each; only the final shingle contains the
    # changed last token → 10 shared / 12 union
    assert near.n_shared == 10
    assert abs(near.jaccard - 10 / 12) < 1e-4
    assert (1, 3) not in out  # no shared shingle at all


def test_simhash_near_dup_close(spark):
    rows = {r.doc_id: r.sh for r in _docs(spark).select("doc_id", D.simhash("text").alias("sh")).collect()}
    assert rows[1] == rows[4]
    hamming = bin(rows[1] ^ rows[2]).count("1")
    assert hamming <= 4  # near dup: few bits differ
    assert 0 <= rows[1] < 2**16


def test_xxhash_mode_runs(spark):
    """Production hash mode (engine-specific, no oracle) stays functional."""
    sigs = D.minhash_signatures_df(_docs(spark), "doc_id", "text", hash_mode="xxhash64")
    assert sigs.count() == 4


def test_simhash_near_pairs_matches_bruteforce(spark):
    """Band-bucketed candidates + popcount verify == exact O(n^2) pair set."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.catalog import load_table
    from healthcare_etl_pipeline_spark.operators import dedup as D

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    fast = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(
            docs, "doc_id", "text", bits=16, max_hamming=2
        ).collect()
    }
    sigs = D.simhash_df(docs, "doc_id", "text", bits=16)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash16").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash16").alias("sb"))
    brute = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 2)
        .collect()
    }
    assert fast == brute


def test_lsh_empty_docs_excluded_from_banding(spark):
    """Zero-shingle docs all share the sentinel signature; banding them
    would put every tiny/empty doc in ONE bucket (n² candidates at corpus
    scale). They must produce no candidate pairs at all."""
    rows = (
        [(1, DOC_A), (2, DOC_A_NEAR)]
        + [(i, "") for i in range(100, 120)]          # empty
        + [(i, "one two") for i in range(200, 220)]   # < n tokens, no shingle
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(df, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs  # real near-dups still found
    assert all(a < 100 and b < 100 for a, b in pairs)  # no sentinel bucket


def test_simhash_empty_docs_excluded_from_pairs(spark):
    """Token-free docs get the all-ones signature (zero votes → every bit
    set); they must not bucket together as Hamming-0 'near-dups'."""
    df = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_A), (3, ""), (4, ""), (5, "   ")],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(
            df, "doc_id", "text", bits=16, max_hamming=1
        ).collect()
    }
    assert pairs == {(1, 2)}


def test_ngram_jaccard_df_cap_prunes_hot_shingles(spark):
    """A stop phrase shared by all m docs yields m² join rows; the df cap
    drops its shingles before the self-join, shrinking the pair space."""
    stop = "call us now for more info"
    rows = [(i, f"{stop} unique{i} token{i} word{i}") for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_df=None)
    capped = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_df=10)
    assert uncapped.count() == 20 * 19 // 2  # hot shingles pair everyone
    assert capped.count() == 0  # non-discriminative shingles pruned
    # cap that never binds (df cap >= corpus size) is a no-op
    loose = D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0, max_df=25)
    assert sorted(map(tuple, loose.collect())) == sorted(map(tuple, uncapped.collect()))


def test_minhash_jaccard_estimate_tracks_exact(spark):
    """est_jaccard must be exact-1.0 for identical docs, high for near-dups,
    and an exact multiple of 1/k."""
    ests = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_jaccard_estimates(
            _docs(spark), "doc_id", "text", k=8, bands=4
        ).collect()
    }
    assert ests[(1, 4)] == 1.0  # identical docs agree on every row
    assert ests[(1, 2)] >= 0.5  # near dup: most rows agree
    for v in ests.values():
        assert abs(v * 8 - round(v * 8)) < 1e-9  # multiples of 1/8


def test_ngram_containment_detects_subset(spark):
    """A quoted excerpt has containment ≈ 1 of the short side but low
    Jaccard — the case this operator exists for."""
    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "intro words here then the quote begins "
        + short
        + " and then a very long tail "
        + " ".join(f"filler{i}" for i in range(40))
    )
    df = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    out = D.ngram_containment_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert r.containment_a == 1.0  # every short-doc shingle is in the long doc
    assert r.containment_b < 0.2   # but the long doc is mostly other content
    # Jaccard would have rejected this pair at any near-dup threshold
    jac = {
        (j.id_a, j.id_b): j.jaccard
        for j in D.ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    assert jac[(1, 2)] < 0.2


def test_dedup_survivors_clique_and_chain(spark):
    from healthcare_etl_pipeline_spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame([(i,) for i in range(1, 10)], ["doc_id"])
    pairs = spark.createDataFrame(
        # clique {1,2,3}; chain 5~6, 6~7; isolated 9
        [(1, 2), (1, 3), (2, 3), (5, 6), (6, 7)],
        ["id_a", "id_b"],
    )
    out = {r.doc_id for r in dedup_survivors(docs, pairs).collect()}
    # clique {1,2,3} keeps its minimum 1; chain 5~6~7 keeps only 5 (greedy
    # removes every larger pair member — over-removal on chains, documented);
    # 4, 8, 9 untouched
    assert out == {1, 4, 5, 8, 9}


def test_connected_components_chain_and_clique(spark):
    from healthcare_etl_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # clique {1,2,3}; chain 5-6, 6-7; long chain 10-11, 11-12, 12-13
        [(1, 2), (1, 3), (2, 3), (5, 6), (6, 7), (10, 11), (11, 12), (12, 13)],
        ["id_a", "id_b"],
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1,
        5: 5, 6: 5, 7: 5,
        10: 10, 11: 10, 12: 10, 13: 10,
    }


def test_prefix_filter_matches_exact_pairs_despite_hot_shingle(spark):
    # 30 docs sharing one hot phrase + two true near-dup pairs: the
    # prefix join must find exactly the pairs the exhaustive form finds
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{hot} unique{i} marker{i} token{i}") for i in range(30)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {
        (r.id_a, r.id_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_pairs(
            df, "doc_id", "text", threshold=0.5, max_df=None
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_prefix_pairs(
            df, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert pref == exact
    assert (100, 101) in pref  # the true near-dup survives


def test_prefix_filter_keeps_exact_boundary_pairs(spark):
    """Pairs whose Jaccard is EXACTLY the threshold, with every derived
    bound exactly integral, must survive the prefix/positional/suffix-
    capacity filters: with n=1 (unigram shingles) A='a…f' vs B='c…h'
    has overlap 4 / union 8 = J = 0.5, prefix length
    6 - ceil(3.0) + 1 = 4, and required overlap ceil(0.5/1.5*12) = 4.0 —
    the FP-integral case where a naive ceil(x+1e-16) would demand 5 and
    prune a true pair (round-6 advice, dedup.py overlap_req)."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "c d e f g h"),   # J(1,2) = 4/8 = 0.5 exactly — must survive
            (3, "d e f x y z"),   # J(1,3) = J(2,3) = 3/9 < 0.5 — pruned
            (4, "m n o p q r"),   # disjoint from all
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_prefix_pairs(
            df, "doc_id", "text", n=1, threshold=0.5
        ).collect()
    }
    assert got == {(1, 2): (4, 0.5)}


def test_prefix_join_single_shingle_docs_empty_suffix_slice(spark):
    """Docs whose whole shingle set IS the prefix (|s|=1 → prefix_len=1 →
    last_rn = set_size) verify through an EMPTY suffix slice: n_shared
    must come entirely from prefix_overlap, and F.slice(arr, size+1, 0)
    must not error. Pair (1,2): identical single shingle, J=1. Pair
    (1,3)/(2,3): 1 shared of union 2 → J=0.5, exactly at threshold, where
    doc 3 contributes a NON-empty suffix against an empty one."""
    df = spark.createDataFrame(
        [
            (1, "a b c"),          # single 3-gram shingle
            (2, "a b c"),          # identical → J(1,2)=1
            (3, "a b c d"),        # shingles {abc, bcd} → J(1,3)=0.5
            (4, "x y z"),          # disjoint single shingle
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.jaccard)
        for r in D.ngram_jaccard_prefix_pairs(
            df, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert got == {(1, 2): (1, 1.0), (1, 3): (1, 0.5), (2, 3): (1, 0.5)}
