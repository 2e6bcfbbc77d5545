"""Deterministic sampling/split + chunking operator tests."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
)
from healthcare_etl_pipeline_spark.operators.text import chunk_documents


def _ids(spark, n=5000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_hash_split_disjoint_exhaustive(spark):
    df = _ids(spark)
    out = hash_split(df, "doc_id")
    counts = {r.split: r.c for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == 5000  # exhaustive, nothing dropped
    # ~98/1/1 with hash noise
    assert counts["train"] > 4700
    assert 10 <= counts.get("val", 0) <= 150
    assert 10 <= counts.get("test", 0) <= 150


def test_hash_split_stable_under_repartition(spark):
    df = _ids(spark, 1000)
    a = {(r.doc_id, r.split) for r in hash_split(df, "doc_id").collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(df.repartition(17), "doc_id").collect()
    }
    assert a == b  # pure function of the id — partitioning-independent


def test_hash_sample_nested_fractions(spark):
    df = _ids(spark)
    s10 = {r.doc_id for r in hash_sample(df, "doc_id", fraction=0.10).collect()}
    s01 = {r.doc_id for r in hash_sample(df, "doc_id", fraction=0.01).collect()}
    assert s01 <= s10  # nested: the 1% sample is inside the 10% sample
    assert 350 <= len(s10) <= 650
    # different salt → different (independent) subset
    alt = {r.doc_id for r in hash_sample(df, "doc_id", fraction=0.10, salt=99).collect()}
    assert alt != s10


def test_pair_bucket_mixes_both_ids(spark):
    """ADVICE r7: bucket(a, b+1) must NOT be bucket(a, b)+1 — with only the
    first id mixed, a fixed keep_id's kept dup_ids form a stride-residue
    class, correlating the pair sample with id arithmetic inside
    consecutive-id copy clusters. Assert (1) the second-id increment
    produces non-constant bucket deltas, (2) the Spark column and the
    portable SQL produce identical buckets, and (3) a keep≡0-mod-5 sample
    over a consecutive-id block keeps close to the 1/5 marginal rate for
    EVERY fixed first id (the old mixer kept exactly-periodic residues)."""
    import duckdb

    from healthcare_etl_pipeline_spark.operators.sampling import (
        pair_bucket,
        pair_bucket_sql,
    )

    pairs = [(a, b) for a in range(5) for b in range(100)]
    df = spark.createDataFrame(pairs, ["a", "b"]).withColumn(
        "bk", pair_bucket("a", "b")
    )
    got = {(r.a, r.b): r.bk for r in df.collect()}

    # (1) non-constant second-id stride: among b -> b+1 deltas for fixed a,
    # there must be many distinct deltas (old mixer: always +1 mod rollover)
    deltas = {
        (got[(a, b + 1)] - got[(a, b)]) for a in range(5) for b in range(99)
    }
    assert len(deltas) > 10, f"second id not mixed: deltas={sorted(deltas)[:5]}"

    # (2) SQL parity with the DuckDB oracle arithmetic
    sql = pair_bucket_sql("a", "b")
    oracle = duckdb.sql(
        f"SELECT a, b, {sql} AS bk FROM (SELECT unnest(range(5)) a) "
        "CROSS JOIN (SELECT unnest(range(100)) b)"
    ).fetchall()
    assert {(a, b): bk for a, b, bk in oracle} == got

    # (3) near-marginal keep rate per fixed first id over consecutive b
    for a in range(5):
        kept = sum(1 for b in range(100) if got[(a, b)] % 5 == 0)
        assert 8 <= kept <= 32, f"a={a}: kept {kept}/100 at nominal 20"


def test_hash_bucket_range(spark):
    rows = _ids(spark, 200).select(hash_bucket("doc_id").alias("b")).collect()
    assert all(0 <= r.b < 10_000 for r in rows)


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "a b"),                                 # shorter than window
            (3, ""),                                    # empty → no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, window=4, stride=3)
    rows = sorted(
        ((r.doc_id, r.chunk_index, r.chunk_start, r.chunk_text, r.chunk_tokens)
         for r in out.collect())
    )
    # doc 1: starts 1,4,7,10 → windows of 4 tokens (last two truncated)
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 1, "w0 w1 w2 w3", 4),
        (1, 1, 4, "w3 w4 w5 w6", 4),
        (1, 2, 7, "w6 w7 w8 w9", 4),
        (1, 3, 10, "w9", 1),
    ]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 1, "a b", 2)]
    assert not [r for r in rows if r[0] == 3]


def test_chunks_cover_all_tokens(spark):
    """Every token position is covered by at least one chunk when
    stride <= window."""
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(257)))], ["doc_id", "text"]
    )
    out = chunk_documents(df, window=64, stride=48).collect()
    covered = set()
    for r in out:
        covered.update(range(r.chunk_start, r.chunk_start + r.chunk_tokens))
    assert covered == set(range(1, 258))


def test_weighted_sample_deterministic_and_weight_biased(spark):
    import math

    from healthcare_etl_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from healthcare_etl_pipeline_spark.operators.text import MOD

    rows = [(i, 1.0 if i < 90 else 1000.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = weighted_sample(df, "id", "w", k=10, salt=3)
    ids = [r.id for r in got.collect()]
    assert len(ids) == 10
    # recompute the exponential-sort keys in Python: same hash, same order
    import hashlib

    def key(i, w):
        h = int(hashlib.md5(f"{i}|ws3".encode()).hexdigest()[:15], 16) % MOD
        return -math.log((h + 1) / MOD) / w

    expect = sorted(range(100), key=lambda i: (key(i, rows[i][1]), i))[:10]
    assert ids == expect
    # the 10 heavy rows (1000x weight) dominate the sample
    assert sum(1 for i in ids if i >= 90) >= 8


def test_temperature_mix_between_uniform_and_natural(spark):
    from healthcare_etl_pipeline_spark.operators.sampling import (
        balance_strata,
        temperature_mix,
    )

    rows = [(i, "big" if i % 10 else "small") for i in range(1, 2001)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    natural = {r["source"]: r["n"] for r in df.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    temp = temperature_mix(df, "doc_id", "source", alpha=0.5, salt=3)
    uni = balance_strata(df, "doc_id", "source", salt=3)
    t_counts = {r["source"]: r["n"] for r in temp.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    u_counts = {r["source"]: r["n"] for r in uni.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    # smallest stratum survives (rate 1) in both
    assert t_counts["small"] == natural["small"]
    # damped mix sits strictly between uniform and natural for the big one
    assert u_counts["big"] < t_counts["big"] < natural["big"]
    # deterministic: re-running yields the identical kept set
    ids1 = {r.doc_id for r in temp.collect()}
    ids2 = {r.doc_id for r in temperature_mix(df, "doc_id", "source", alpha=0.5, salt=3).collect()}
    assert ids1 == ids2


def test_grouped_hash_split_never_straddles_groups(spark):
    """Leakage-safe split: every member of a group lands on the same side,
    splits partition the rows, and the assignment is a pure function of
    the group key (same key -> same split across frames and reruns)."""
    from healthcare_etl_pipeline_spark.operators.sampling import (
        grouped_hash_split,
        hash_split,
    )

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 700).alias("group_id")
    )
    out = grouped_hash_split(
        df, "group_id", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    # one split per group, all rows assigned
    per_group = out.groupBy("group_id").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_group.filter(F.col("k") != 1).count() == 0
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.count() == 5000
    # pure function of the key: identical to hash_split on the group col,
    # and stable under repartitioning
    again = hash_split(
        df.repartition(17),
        "group_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    assert out.exceptAll(again).count() == 0
    # all three splits are populated at this group count
    assert out.select("split").distinct().count() == 3


def test_shuffle_shards_permutation_properties(spark):
    """shuffle_shards is a seeded PERMUTATION into shards: every row keeps
    exactly one (shard, pos); positions are 1..count(shard) dense; the
    assignment is invariant to input partitioning; a different seed gives
    a different order."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = shuffle_shards(df, "doc_id", n_shards=8, seed=3)
    assert out.count() == 5000  # exhaustive
    # dense 1..n positions per shard
    per = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("d"),
        )
        .collect()
    )
    assert len(per) == 8
    for r in per:
        assert (r.lo, r.hi, r.d) == (1, r.n, r.n)
        assert r.n > 400  # balanced within ~35% of 625
    # partitioning invariance
    shuffled_input = df.repartition(13).orderBy(F.desc("doc_id"))
    again = shuffle_shards(shuffled_input, "doc_id", n_shards=8, seed=3)
    a = {(r.doc_id, r.shard, r.pos) for r in out.collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in again.collect()}
    assert a == b
    # a new seed reshuffles (epoch re-order): same rows, different order
    other = shuffle_shards(df, "doc_id", n_shards=8, seed=4)
    c = {(r.doc_id, r.shard, r.pos) for r in other.collect()}
    assert c != a and {x[0] for x in c} == {x[0] for x in a}


def test_contrastive_negatives_properties(spark):
    from healthcare_etl_pipeline_spark.operators.sampling import (
        contrastive_negatives,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    cand = contrastive_negatives(docs, "doc_id", k=3, salt=0)
    rows = cand.collect()

    # up-to-k contract: at most 3 per anchor, never the anchor itself,
    # ids always inside the id space
    per = {}
    for r in rows:
        assert r.neg_id != r.anchor_id
        assert 0 <= r.neg_id < n
        per.setdefault(r.anchor_id, []).append(r.neg_rank)
    assert all(len(v) <= 3 and len(set(v)) == len(v) for v in per.values())
    assert len(rows) >= 3 * n - 10  # collisions are rare: ~k/n

    # deterministic + partitioning-independent
    again = set(
        map(tuple, contrastive_negatives(docs.repartition(7), "doc_id", k=3).collect())
    )
    assert set(map(tuple, rows)) == again

    # a different salt draws an (almost entirely) different negative set
    other = set(
        (r.anchor_id, r.neg_rank, r.neg_id)
        for r in contrastive_negatives(docs, "doc_id", k=3, salt=99).collect()
    )
    overlap = len(set(map(tuple, rows)) & other) / len(rows)
    assert overlap < 0.05, overlap

    # negatives spread across the corpus rather than clustering: every
    # decile of the id space is hit
    import collections

    deciles = collections.Counter(r.neg_id * 10 // n for r in rows)
    assert len(deciles) == 10
