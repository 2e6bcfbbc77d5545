"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard
(driver north-star surface, SURVEY.md §2.8).

Scale design (the point of each algorithm):
- **Exact** — hash-groupBy on the dedup key; one shuffle, map-side partial
  aggregation. At 100 TB, dedup on a digest (fingerprint/sha) rather than the
  raw text so the shuffle ships 8-byte keys, not documents.
- **MinHash + LSH** — near-dup without the O(n²) pair space: shingle →
  k minhashes → band buckets → equi-join on (band, bucket). Only documents
  sharing a band bucket are compared; the band join is a plain shuffle join
  Catalyst can plan (and AQE can skew-split hot buckets).
- **SimHash** — one 16/64-bit signature per doc; near-dups differ in few
  bits. Candidate generation by exact-signature match here (Hamming-ball
  expansion is a trivial extension via explode over bit flips).
- **n-gram Jaccard** — exact verification for candidate pairs, expressed as
  a shared-shingle self-join + group count (set algebra, no UDF).

Everything is built-in expressions — no Python in the data path. Hash choice:
``portable`` (cross-engine, oracle-checkable) or ``xxhash64`` (production).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.operators.cache import bounded_persist

from healthcare_etl_pipeline_spark.operators.text import (
    MINHASH_PARAMS,
    MOD,
    portable_char_hash,
    tokens,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, key_cols: list[str], tie_break: str) -> DataFrame:
    """Keep one row per key: the minimum ``tie_break`` row (deterministic).

    row_number over (key → tie_break) = one shuffle on the key columns.
    """
    w = Window.partitionBy(*key_cols).orderBy(tie_break)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Groups with >1 member: key, group size. (Counts ship, not payloads.)"""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


# ---------------------------------------------------------------------------
# Shingling + hashing
# ---------------------------------------------------------------------------

def shingle_array(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined strings).

    NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0] — short docs must
    return an explicit empty array, not rely on an empty sequence.
    """
    toks = tokens(text_col)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(grams)


def shingle_hashes(text_col: Column | str, n: int = 3, hash_mode: str = "portable") -> Column:
    """Distinct shingle hash values for a document."""
    shingles = shingle_array(text_col, n)
    if hash_mode == "portable":
        return F.array_distinct(F.transform(shingles, portable_char_hash))
    return F.array_distinct(F.transform(shingles, lambda s: F.xxhash64(s)))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    hashes: Column, k: int = 8
) -> list[Column]:
    """k min-hash values from a shingle-hash array.

    Permutation j: min over shingles of (a_j*h + b_j) mod p — classic
    universal-hash MinHash. Empty docs get sentinel p (impossible hash).
    """
    if k > len(MINHASH_PARAMS):
        raise ValueError(f"k={k} exceeds available parameter sets ({len(MINHASH_PARAMS)})")
    def perm(a: int, b: int):
        # closure factory: default-arg binding would change the lambda's
        # arity, which PySpark validates for higher-order functions
        return lambda h: (h * a + b) % MOD

    sigs = []
    for j in range(k):
        a, b = MINHASH_PARAMS[j]
        sig = F.array_min(F.transform(hashes, perm(a, b)))
        sigs.append(F.coalesce(sig, F.lit(MOD)).alias(f"sig_{j}"))
    return sigs


def minhash_signatures_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    n: int = 3,
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-doc MinHash signature columns sig_0..sig_{k-1}.

    Two deliberate physical choices:
    - repartition to cores first: a single-file corpus otherwise lands in ONE
      partition and the (CPU-bound) shingle hashing runs on one core;
    - materialize the shingle-hash array via bounded_persist before deriving
      the k signature columns — higher-order functions are CodegenFallback
      and not subexpression-eliminated, so without a boundary each sig
      column would recompute the whole tokenize→shingle→hash pipeline (k×
      the work). Persist (LRU-capped, operators/cache.py) rather than
      localCheckpoint: the CacheManager then plan-matches repeated runs of
      the operator, and eviction is explicit instead of unbounded.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    hs_df = (
        df.repartition(par, id_col)
        .select(F.col(id_col), shingle_hashes(F.col(text_col), n, hash_mode).alias("hs"))
        .transform(bounded_persist)
    )
    return hs_df.select(F.col(id_col), *minhash_signature(F.col("hs"), k))


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    bands: int,
    n: int,
    hash_mode: str,
) -> DataFrame:
    """Checkpointed (id, sig_0..sig_{k-1}) signatures ready for banding.

    Checkpoint: both sides of the band self-join (and any estimate join)
    read them, and the shingle→hash→minhash pipeline is the expensive part —
    without a materialization boundary Spark recomputes it per consumer.
    (bounded_persist: plan-matched reuse across runs, LRU-capped eviction.)

    Degenerate-bucket guard: docs with ZERO shingles (empty/short docs) get
    the sentinel signature (MOD) in every permutation, so they would all
    land in the SAME band bucket — on a real corpus with millions of tiny
    docs that one bucket becomes an n² candidate blow-up. A zero-shingle
    doc has Jaccard 0 (or undefined) against everything, so it can never be
    a near-dup candidate: exclude it from banding. (sig_0 < MOD whenever
    the doc has ≥1 shingle, since every permuted hash is taken mod MOD.)
    """
    return (
        minhash_signatures_df(df, id_col, text_col, k, n, hash_mode)
        .filter(F.col("sig_0") != F.lit(MOD))
        .transform(bounded_persist)
    )


def _band_bucket_cols(k: int, bands: int) -> list[Column]:
    rows_per_band = k // bands
    return [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"sig_{b * rows_per_band + r}").alias(f"r{r}")
                for r in range(rows_per_band)
            ],
        )
        for b in range(bands)
    ]


#: Target candidate comparisons per reducer task before the band join
#: spreads a hot bucket over salts (~250k id-pair rows is well under a
#: task's memory at 16 bytes/pair, and small enough that a straggler task
#: stays in the seconds range at 100 TB).
_SALT_PAIRS_PER_TASK = 250_000
_SALT_MAX = 32


def _probe_salt_buckets(
    hot_pairs: int,
    pairs_per_task: int = _SALT_PAIRS_PER_TASK,
    max_salt: int = _SALT_MAX,
) -> int:
    """Salt count for a hottest-bucket workload of ``hot_pairs``
    comparisons: 1 (off) below the per-task target, else enough salts to
    spread the hot bucket to ~``pairs_per_task`` per reducer, capped (the
    right side replicates ×salt through the shuffle, so unbounded salt
    trades a straggler for shuffle volume)."""
    if hot_pairs <= pairs_per_task:
        return 1
    return min(max_salt, -(-hot_pairs // pairs_per_task))


#: skew-probe sample fraction. The probe only needs to DETECT buckets hot
#: enough to matter (the salting threshold is ~707 docs in one bucket =
#: 250k pairs); a Binomial(m, 0.05) sample sees ~35±6 of those, so the
#: decision is reliable while the probe job reads 5% of the bucket rows.
#: Round-5 A/B (BENCH_NOTES.md): the full-frame probe cost ~40% of the
#: minhash_lsh_pairs headline at sf0.1; sampling returns it to the noise
#: band while keeping the Zipfian guard on AQE-off/streaming paths.
_SALT_PROBE_FRACTION = 0.05


def _aqe_handles_skew(spark) -> bool:
    """True when AQE's skew-join split is active: the runtime already
    collects per-partition shuffle stats and splits a hot key of a
    sort-merge join (the physical form every at-scale bucket self-join
    takes), so the manual probe+salt is redundant there. Callers running
    with AQE off — or inside engines/paths that bypass AQE, e.g. a
    foreachBatch that disabled it — fall back to the sampled probe, and
    can always pass an explicit ``salt_buckets``."""
    try:
        conf = spark.conf
        return (
            conf.get("spark.sql.adaptive.enabled", "true").lower() == "true"
            and conf.get(
                "spark.sql.adaptive.skewJoin.enabled", "true"
            ).lower()
            == "true"
        )
    except Exception:
        return False


def _hottest_bucket_size(
    buckets: DataFrame, fraction: float = _SALT_PROBE_FRACTION
) -> int:
    """ESTIMATED max per-bucket doc count — the skew probe. One map-side-
    combined aggregation over a ``fraction`` sample of the (persisted-
    signature-derived) bucket frame, scaled back up; cost is one small
    extra job, paid once per band join to decide the salting plan (the
    runtime analogue of AQE's skew stats, usable on AQE-off and streaming
    paths too). Estimation error only matters near the salting threshold,
    where both choices are fine — batch plans additionally keep AQE's
    native skew-join split as the backstop."""
    row = (
        buckets.sample(fraction=fraction, seed=7)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(F.max("m").alias("m"))
        .first()
    )
    m = int(row["m"] or 0) if row else 0
    return int(round(m / fraction))


def _band_pairs(
    sigs: DataFrame,
    id_col: str,
    k: int,
    bands: int,
    salt_buckets: int | str = "auto",
) -> DataFrame:
    """(id_a < id_b) pairs sharing ≥1 (band, band-signature) bucket.

    ``salt_buckets > 1`` enables the skew-salted form (same replication
    scheme as ``operators.joins.salted_join``, adapted to a pair-emitting
    self-join): band buckets on natural-language shingles are Zipfian —
    one boilerplate phrase can put thousands of docs in one bucket, and in
    a plain bucket equi-join that bucket lands on ONE reducer (AQE's
    skew-split helps batch plans, but streaming/AQE-off paths get a
    straggler per hot bucket). The left occurrence of each doc carries a
    DETERMINISTIC salt (hash of its id — reproducible, unlike rand()), the
    right occurrence is replicated across all ``salt_buckets`` salts, and
    the join keys on (bucket, salt): a hot bucket of m docs spreads its
    m²/2 comparisons over ``salt_buckets`` reducers, each pair still
    emitted exactly once (at the left doc's salt). Cost: the right side is
    replicated ×``salt_buckets`` through the shuffle — pay it when bucket
    skew is expected, keep the default for uniform corpora.

    ``salt_buckets="auto"`` (the default) probes the hottest bucket's
    cardinality first and salts only when its m·(m-1)/2 comparisons exceed
    the per-task target — so the Zipfian guard engages without the caller
    knowing about it, and uniform corpora pay nothing beyond the probe.
    """
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*_band_bucket_cols(k, bands))).alias("bucket")
    )
    if salt_buckets == "auto":
        if _aqe_handles_skew(sigs.sparkSession):
            # batch plans with AQE skew-join on: at scale the bucket
            # self-join is sort-merge, and AQE splits a Zipfian-hot key
            # natively from runtime shuffle stats — the probe job would
            # duplicate work AQE already does (round-5 A/B: the probe
            # cost ~40% of the sf0.1 headline; BENCH_NOTES.md)
            salt_buckets = 1
        else:
            m = _hottest_bucket_size(buckets)
            salt_buckets = _probe_salt_buckets(m * (m - 1) // 2)
    if salt_buckets > 1:
        left = buckets.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast("int"),
        ).alias("l")
        right = buckets.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        ).alias("r")
        cond = (
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__salt") == F.col("r.__salt"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        )
    else:
        left = buckets.alias("l")
        right = buckets.alias("r")
        cond = (F.col("l.bucket") == F.col("r.bucket")) & (
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
        )
    return (
        left.join(right, cond)
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    hash_mode: str = "portable",
    salt_buckets: int | str = "auto",
) -> DataFrame:
    """Near-dup candidate pairs: docs agreeing on at least one LSH band.

    Signature split into ``bands`` bands of k/bands rows each; docs hashing
    to the same (band_id, band_value) bucket become candidates. The bucket
    join is an equi-join → shuffle on the bucket key, never O(n²).
    ``salt_buckets``: spread Zipfian-hot buckets over that many reducers
    (see ``_band_pairs``) — identical result set, bounded task skew.
    Default ``"auto"`` probes bucket skew and salts only when needed.
    """
    sigs = _banded_signatures(df, id_col, text_col, k, bands, n, hash_mode)
    return _band_pairs(sigs, id_col, k, bands, salt_buckets)


def minhash_jaccard_estimates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    hash_mode: str = "portable",
) -> DataFrame:
    """Estimated Jaccard for every LSH candidate pair — verification WITHOUT
    touching the documents again.

    est = fraction of the k MinHash rows that agree; E[est] = true Jaccard
    (the classic MinHash estimator). At 100 TB this is the cheap middle
    tier: candidates come from the band join, the estimate joins only the
    k-row signatures (8 longs/doc, not the shingle sets), and only pairs
    passing the estimate threshold proceed to exact verification
    (``ngram_jaccard_pairs``) if needed at all.

    Output: id_a, id_b, est_jaccard (exact multiple of 1/k → deterministic).
    """
    sigs = _banded_signatures(df, id_col, text_col, k, bands, n, hash_mode)
    pairs = _band_pairs(sigs, id_col, k, bands)
    a = sigs.select(
        F.col(id_col).alias("id_a"), *[F.col(f"sig_{j}").alias(f"a{j}") for j in range(k)]
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), *[F.col(f"sig_{j}").alias(f"b{j}") for j in range(k)]
    )
    agree = sum(
        F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0) for j in range(k)
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(agree / F.lit(float(k)), 6).alias("est_jaccard"),
        )
    )


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop near-duplicates given (id_a < id_b) pair evidence: any row that
    appears as the LARGER id of some pair is removed (its smaller partner
    survives).

    Single-pass greedy — exact for duplicate CLIQUES (every member pairs
    with the minimum, which survives alone). For CHAINS (5~6, 6~7 but not
    5~7) it removes every larger pair member, so 7 is dropped even though
    its only similar partner 6 is dropped too — conservative over-removal.
    Full transitive canonicalization is connected components (iterative);
    use a graph pass when chain topology matters. One anti-join = one
    shuffle on the id.
    """
    dominated = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(dominated, id_col, "left_anti")


def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Transitive duplicate clusters: (id, component) where component is the
    minimum id reachable through pair edges — the exact canonicalization
    ``dedup_survivors`` approximates greedily.

    Iterative min-label propagation: each round every vertex takes the min
    of its own label and its neighbors' labels; converges in O(diameter)
    rounds (duplicate clusters are shallow — near-dup graphs are mostly
    cliques and short chains). Each round is ONE shuffle (edge join +
    groupBy); labels are localCheckpoint-ed per round so lineage doesn't
    grow with iterations. Raises if not converged within max_iterations.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pair similarity via shared-shingle join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.1,
    hash_mode: str = "portable",
    max_df: int | None = 10_000,
) -> DataFrame:
    """Jaccard over shingle sets for pairs sharing ≥1 (non-hot) shingle.

    |A∩B| from the shared-shingle join group count; |A∪B| = |A|+|B|-|A∩B|.
    Shuffles on the shingle hash — documents sharing no shingle never meet.

    ``max_df`` — the scale guard: a single stop-phrase shingle appearing in
    m documents emits m² join rows before the threshold filter, and AQE
    skew-splitting spreads the work but cannot shrink that pair space.
    Shingles with document frequency > max_df are dropped from the index
    BEFORE the self-join (one extra groupBy pass over the exploded shingles,
    map-side combined; the hot set is tiny so it anti-joins as a broadcast).
    Set sizes keep the FULL distinct-shingle count, so the reported jaccard
    is a lower bound for docs containing hot shingles — hot shingles carry
    no discriminative signal, so near-dup pairs still clear the threshold
    through their non-hot overlap. ``max_df=None`` disables the cap (the
    exact small-scale oracle form).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    # The materialization boundary sits BEFORE size()/explode(): the shingle
    # hash pipeline is a CodegenFallback higher-order expression, and a
    # Generate (explode) whose child is that raw expression re-evaluates it
    # per OUTPUT row (~10× the work measured at sf0.1); size() inlined by
    # CollapseProject doubles it again. Checkpointing the (id, hs) arrays
    # first makes every downstream consumer — set_size, explode, the hot-df
    # pass, both self-join sides — read stored arrays. (bounded_persist:
    # plan-matched reuse across runs, LRU-capped so a long-lived session's
    # cache footprint stays bounded.)
    hashes = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col), shingle_hashes(F.col(text_col), n, hash_mode).alias("hs")
        )
        .transform(bounded_persist)
    )
    exploded = hashes.select(
        id_col, F.size("hs").alias("set_size"), F.explode("hs").alias("h")
    )
    if max_df is not None:
        hot = (
            exploded.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("h")
        )
        exploded = exploded.join(F.broadcast(hot), "h", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    pair_overlap = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jaccard = F.col("n_shared") / (
        F.col("size_a") + F.col("size_b") - F.col("n_shared")
    )
    return (
        pair_overlap.withColumn("jaccard", F.round(jaccard, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "portable",
    max_df: int | None = 10_000,
) -> DataFrame:
    """Asymmetric shingle containment: C(A→B) = |A∩B| / |A|.

    Catches near-SUBSET duplication that Jaccard misses when sizes differ —
    a short document quoted whole inside a long one has high containment of
    the short side but low Jaccard (union dominated by the long side). The
    standard complement to Jaccard in corpus dedup (quotes, boilerplate
    wrappers, excerpt pages).

    Same physical shape as ``ngram_jaccard_pairs`` (shared-shingle
    equi-join, document-frequency cap); emits a pair when EITHER direction
    clears ``threshold``, with both directions reported.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    hashes = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col), shingle_hashes(F.col(text_col), n, hash_mode).alias("hs")
        )
        .transform(bounded_persist)
    )
    exploded = hashes.select(
        id_col, F.size("hs").alias("set_size"), F.explode("hs").alias("h")
    )
    if max_df is not None:
        hot = (
            exploded.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("h")
        )
        exploded = exploded.join(F.broadcast(hot), "h", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    pair_overlap = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    c_a = F.round(F.col("n_shared") / F.col("size_a"), 6)
    c_b = F.round(F.col("n_shared") / F.col("size_b"), 6)
    return (
        pair_overlap.withColumn("containment_a", c_a)
        .withColumn("containment_b", c_b)
        .filter(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
        .select("id_a", "id_b", "n_shared", "containment_a", "containment_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_votes(text_col: Column | str, bits: int, hash_mode: str) -> Column:
    """struct<c0..c{bits-1}>: per-bit ±1 vote sums, in ONE fold over the
    token hashes (a struct accumulator carries all counters)."""
    toks = F.array_distinct(tokens(text_col))
    if hash_mode == "portable":
        th = F.transform(toks, portable_char_hash)
    else:
        th = F.transform(toks, lambda s: F.xxhash64(s))

    def merge(acc: Column, h: Column) -> Column:
        return F.struct(
            *[
                (
                    acc[f"c{i}"]
                    + F.when(
                        F.shiftright(h, i).bitwiseAND(1) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                ).alias(f"c{i}")
                for i in range(bits)
            ]
        )

    zero = F.struct(
        *[F.lit(0).cast("long").alias(f"c{i}") for i in range(bits)]
    )
    return F.aggregate(th, zero, merge)


def _sig_from_votes(votes: Column, bits: int) -> Column:
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(
            votes[f"c{i}"] >= 0, F.lit(1 << i).cast("long")
        ).otherwise(0)
    return sig


def simhash(text_col: Column | str, bits: int = 16, hash_mode: str = "portable") -> Column:
    """SimHash signature from token hashes (single-Column form).

    bit_i = 1 iff sum over tokens of ±1 (by token-hash bit i) is >= 0.
    Convenient for small frames/tests; the hot path is ``simhash_df``,
    which puts a materialization boundary between the vote fold and the
    16-way struct read (higher-order functions are CodegenFallback and not
    subexpression-eliminated, so inlining re-evaluates the fold per bit).
    """
    return _sig_from_votes(_simhash_votes(text_col, bits, hash_mode), bits)


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    max_hamming: int = 2,
    hash_mode: str = "portable",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Candidate generation uses the pigeonhole band trick: split the
    signature into ``max_hamming + 1`` bit-bands — two signatures within
    distance d must agree EXACTLY on at least one band, so candidates come
    from an equi-join on (band_id, band_bits), never the O(n²) pair space.
    Candidates are then verified with the exact popcount condition.

    Output: id_a < id_b, hamming distance.
    """
    n_bands = max_hamming + 1
    width = bits // n_bands
    # Degenerate-bucket guard: a doc with ZERO tokens has an all-zero vote
    # struct, and the >=0 rule then sets EVERY bit — all empty docs share the
    # all-ones signature and would pile into one band bucket (n² candidates
    # at corpus scale). Token-free docs carry no content signal for SimHash;
    # exclude them from candidate generation (exact dedup handles them).
    non_empty = df.filter(F.size(tokens(F.col(text_col))) > 0)
    sigs = simhash_df(non_empty, id_col, text_col, bits, hash_mode, out_col="sig")
    bands = []
    for b in range(n_bands):
        lo = b * width
        # last band absorbs the remainder bits
        w = bits - lo if b == n_bands - 1 else width
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), lo)
                .bitwiseAND((1 << w) - 1)
                .alias("band_bits"),
            )
        )
    bucketed = sigs.select(
        F.col(id_col), F.col("sig"), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "sig", "bk.band", "bk.band_bits")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    hamming = F.bit_count(
        F.col("a.sig").bitwiseXOR(F.col("b.sig"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 16,
    hash_mode: str = "portable",
    out_col: str | None = None,
) -> DataFrame:
    """Per-doc SimHash with the vote fold evaluated exactly once.

    Same two physical choices as ``minhash_signatures_df``: repartition a
    narrow scan to cores (CPU-bound fold), checkpoint the per-bit vote
    struct so the signature projection reads it instead of re-running the
    fold (lazy localCheckpoint — GC-freed, no cache accumulation).
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    votes_df = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col),
            _simhash_votes(F.col(text_col), bits, hash_mode).alias("__votes"),
        )
        .transform(bounded_persist)
    )
    name = out_col or f"simhash{bits}"
    return votes_df.select(
        F.col(id_col), _sig_from_votes(F.col("__votes"), bits).alias(name)
    )


def ngram_jaccard_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "portable",
) -> DataFrame:
    """EXACT Jaccard pairs at ``threshold`` via prefix filtering (PPJoin
    family — Chaudhuri et al. SSJoin 2006, Xiao et al. WWW 2008).

    Order every document's shingles by a GLOBAL canonical rarity rank
    (document frequency asc, hash asc); if J(A,B) >= t the intersection
    has >= ceil(t*|A|) elements, so A and B must each expose a shared
    shingle inside their first |s| - ceil(t*|s|) + 1 rarest shingles —
    the candidate join touches ONLY those prefixes. Unlike the max_df cap
    in ngram_jaccard_pairs (a lower-bound heuristic), this is lossless:
    hot shingles land at the END of the rarity order and simply never
    enter prefixes, so the stop-phrase m² fanout disappears while the
    result stays the exact thresholded pair set — verification re-ranks
    candidates on the full stored arrays (array_intersect, JVM-side).

    Cost: one extra df aggregation + one per-doc rarity sort (documents'
    shingle sets, bounded by doc length) versus a candidate join shrunk
    from every shared shingle to shared RARE prefixes; at high thresholds
    the candidate set approaches the true pair set.

    Verification is positional (Xiao et al. WWW 2008 §5, lifted to set
    algebra): each document's shingles are stored ONCE as an array in the
    global rarity order, and a candidate pair intersects only the two
    SUFFIX slices after its last surviving prefix match. This is exact —
    positions along the one total order are monotone in both documents,
    so any shared shingle ordered before the pair's last surviving prefix
    match is itself inside both prefixes, before that match, and already
    counted by ``prefix_overlap`` (positional-filter drops are a
    contiguous tail: the capacity bound decreases monotonically along the
    shared sequence). Hence ``n_shared = prefix_overlap +
    |A[i+1:] ∩ B[j+1:]|`` with (i, j) the last surviving positions — and
    the verify joins ship suffix slices instead of whole shingle arrays,
    roughly halving the dominant at-scale shuffle at t=0.5.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    # Checkpoint BEFORE the emptiness filter: a filter on the raw
    # higher-order shingle expression re-evaluates the whole (interpreted,
    # non-CSE'd) hash pipeline per consumer — measured 11× at sf0.1.
    # Filtering the STORED arrays is a cheap size() probe.
    hashes = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col),
            shingle_hashes(F.col(text_col), n, hash_mode).alias("hs"),
        )
        .transform(bounded_persist)
        .filter(F.size("hs") > 0)
    )
    exploded = hashes.select(
        id_col, F.size("hs").alias("set_size"), F.explode("hs").alias("h")
    )
    dfreq = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # One shuffle by id builds the canonical representation: each doc's
    # shingles as ONE array in the global rarity order ((df asc, h asc) —
    # array_sort on the struct is exactly the old window's sort keys).
    # Prefixes posexplode off the head of this array (no separate window
    # pass) and verification slices its tail.
    ordered = (
        exploded.join(dfreq, "h")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "h"))),
                lambda x: x["h"],
            ).alias("arr")
        )
        .select(F.col(id_col), "arr", F.size("arr").alias("set_size"))
        .transform(bounded_persist)
    )
    # ceil() on FP products must not round an exactly-integral bound UP
    # (t*|s| = k computed as k+1e-16 would shorten the prefix / raise the
    # required overlap by 1 and prune true boundary pairs): subtract an
    # epsilon far below the 6-dp verification resolution before ceiling.
    prefix_len = (
        F.col("set_size")
        - F.ceil(F.lit(threshold) * F.col("set_size") - F.lit(1e-9))
        + 1
    )
    prefixes = ordered.select(
        F.col(id_col),
        "set_size",
        F.posexplode(F.slice("arr", 1, prefix_len.cast("int"))),
    ).select(
        id_col, F.col("col").alias("h"), (F.col("pos") + 1).alias("rn"), "set_size"
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # PPJoin positional filter (Xiao et al. WWW 2008, lossless): a shared
    # prefix shingle at (global-order) positions i of A and j of B bounds
    # the overlap above by min(|A|-i, |B|-j)+1; J >= t needs overlap >=
    # ceil(t/(1+t)*(|A|+|B|)), so emissions violating the bound cannot be
    # true pairs and are dropped INSIDE the join (subsumes the classic
    # length-ratio filter at i=j=1). On dense near-dup corpora every true
    # pair otherwise re-emits once per shared prefix shingle — the sf10
    # rung measured that amplification overflowing shuffle spill space.
    overlap_ub = (
        F.least(
            F.col("a.set_size") - F.col("a.rn"),
            F.col("b.set_size") - F.col("b.rn"),
        )
        + 1
    )
    overlap_req = F.ceil(
        F.lit(threshold)
        / (1.0 + threshold)
        * (F.col("a.set_size") + F.col("b.set_size"))
        - F.lit(1e-9)
    )
    # Suffix-capacity (accumulated positional) filter — Xiao et al. WWW
    # 2008 §4's verification bound, lifted to a per-pair aggregate. The
    # canonical rarity rank is ONE global total order, so shared shingles
    # occur in the same relative order in both documents: every shared
    # shingle ordered before the pair's LAST common prefix shingle is
    # itself inside BOTH prefixes. Aggregating the join's emissions per
    # pair therefore yields (a) the EXACT overlap within the two prefixes
    # (c = emission count) and (b) the last common positions (i, j) =
    # (max rn_a, max rn_b) — necessarily from the same emission — and the
    # total overlap is bounded by c + min(|A|-i, |B|-j). Strictly tighter
    # than the per-emission bound above (which assumes every unseen
    # shingle after the FIRST match could still hit), it replaces the
    # plain .distinct() at identical shuffle cost (same keys, count/max
    # instead of dedup) and prunes candidates BEFORE the two full-array
    # fetch joins — the dominant cost at sf10 where candidates ~ true
    # pairs but each drags two shingle arrays through the shuffle.
    req_pair = F.ceil(
        F.lit(threshold)
        / (1.0 + threshold)
        * (F.col("size_a") + F.col("size_b"))
        - F.lit(1e-9)
    )
    cands = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (overlap_ub >= overlap_req),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("prefix_overlap"),
            F.max("a.rn").alias("last_rn_a"),
            F.max("b.rn").alias("last_rn_b"),
        )
        .filter(
            F.col("prefix_overlap")
            + F.least(
                F.col("size_a") - F.col("last_rn_a"),
                F.col("size_b") - F.col("last_rn_b"),
            )
            >= req_pair
        )
        .select(
            "id_a", "id_b", "size_a", "size_b",
            "prefix_overlap", "last_rn_a", "last_rn_b",
        )
    )
    # Positional verification on the rarity-ordered arrays: fetch each
    # side's array once per pair but ship ONLY the suffix after the last
    # surviving prefix position into the second (pair-cardinality) shuffle
    # — the slice is projected BEFORE that exchange. last_rn == set_size
    # yields an empty slice (fully-covered-by-prefix docs).
    oa = ordered.select(F.col(id_col).alias("id_a"), F.col("arr").alias("arr_a"))
    ob = ordered.select(F.col(id_col).alias("id_b"), F.col("arr").alias("arr_b"))
    with_suff_a = cands.join(oa, "id_a").select(
        "id_a", "id_b", "size_a", "size_b", "prefix_overlap", "last_rn_b",
        F.slice(
            "arr_a",
            (F.col("last_rn_a") + 1).cast("int"),
            (F.col("size_a") - F.col("last_rn_a")).cast("int"),
        ).alias("suff_a"),
    )
    verified = with_suff_a.join(ob, "id_b").select(
        "id_a",
        "id_b",
        (
            F.col("prefix_overlap")
            + F.size(
                F.array_intersect(
                    "suff_a",
                    F.slice(
                        "arr_b",
                        (F.col("last_rn_b") + 1).cast("int"),
                        (F.col("size_b") - F.col("last_rn_b")).cast("int"),
                    ),
                )
            )
        ).alias("n_shared"),
        "size_a",
        "size_b",
    )
    jaccard = F.col("n_shared") / (
        F.col("size_a") + F.col("size_b") - F.col("n_shared")
    )
    return (
        verified.withColumn("jaccard", F.round(jaccard, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def lsh_cross_candidates(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
    hash_mode: str = "portable",
    salt_buckets: int | str = "auto",
) -> DataFrame:
    """Bipartite MinHash-LSH: near-dup candidates BETWEEN two corpora —
    the benchmark-decontamination shape (training docs vs an eval set),
    where the self-join family's id_a < id_b canonicalization does not
    apply and every (left, right) bucket collision is a candidate.

    Both sides band independently; the candidate set is the (band,
    signature)-bucket equi-join of the two, deduped per pair. At scale this
    replaces the |train| x |eval| cross product with one bucket-keyed
    shuffle; the (typically small) eval side's buckets broadcast.

    ``salt_buckets``: hot buckets (boilerplate shared by both corpora) get
    the same skew treatment as ``_band_pairs`` — the big (train) side
    carries a deterministic id-hash salt, the small (eval) side's buckets
    replicate across all salts, join keys on (bucket, salt). Result set is
    identical; the hot bucket's work spreads over ``salt_buckets``
    reducers.

    Output: (left_id, right_id) distinct candidate pairs.
    """
    ls = _banded_signatures(left, id_col, text_col, k, bands, n, hash_mode)
    rs = _banded_signatures(right, id_col, text_col, k, bands, n, hash_mode)

    def buckets(sigs: DataFrame, name: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(name),
            F.explode(F.array(*_band_bucket_cols(k, bands))).alias("bucket"),
        )

    lb = buckets(ls, "left_id")
    rb = buckets(rs, "right_id")
    if salt_buckets == "auto":
        # bipartite hot-bucket work is m_left × m_right: join the two
        # per-bucket count frames (small: one row per non-empty bucket)
        # and take the max product. Same probe economics as _band_pairs.
        lc = lb.groupBy("bucket").agg(F.count(F.lit(1)).alias("ml"))
        rc = rb.groupBy("bucket").agg(F.count(F.lit(1)).alias("mr"))
        row = (
            lc.join(rc, "bucket")
            .agg(F.max(F.col("ml") * F.col("mr")).alias("p"))
            .first()
        )
        salt_buckets = _probe_salt_buckets(int(row["p"] or 0) if row else 0)
    if salt_buckets > 1:
        lb = lb.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.col("left_id")), F.lit(salt_buckets)).cast("int"),
        )
        rb = rb.withColumn(
            "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
        )
        joined = lb.join(rb, ["bucket", "__salt"])
    else:
        joined = lb.join(rb, "bucket")
    return joined.select("left_id", "right_id").distinct()


# ---------------------------------------------------------------------------
# Exact-substring duplication (ExactSubstr-style, rolling k-gram form)
# ---------------------------------------------------------------------------

def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-document exact-substring duplication profile: for every length-k
    token window, count how many windows recur ANYWHERE else in the corpus
    (cross- or within-document), and the longest contiguous duplicated span.

    This is the distributed re-expression of ExactSubstr deduplication
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): the reference algorithm builds a corpus-wide suffix array on a
    single machine to find verbatim substrings >= k tokens repeated anywhere.
    A suffix array does not shard; the standard cluster form replaces it with
    rolling k-gram hashing — any repeated substring of length >= k contains a
    repeated k-gram, so marking repeated k-grams and merging adjacent marked
    positions recovers every maximal duplicated span (with span length
    run + k - 1) at the cost of missing repeats shorter than k.

    Plan shape (scale contract):
    1. tokenize + slide: map-only, one (id, pos, gram_hash) row per window;
       the shuffle payload is an 8-byte hash, never the text.
    2. duplicate detection: hash-groupBy on gram_hash (one shuffle,
       map-side partial counts).
    3. mark: semi-join positions against duplicated hashes — equi-join on
       the hash, broadcast when the duplicate set is small, AQE skew-split
       otherwise (boilerplate grams are Zipfian-hot).
    4. span merge: per-document gaps-and-islands (pos - row_number) under a
       Window.partitionBy(doc) — state is per-document only.

    Output: (id, n_grams, n_dup_grams, dup_gram_ratio, max_dup_span) —
    max_dup_span is in TOKENS (0 when the doc has no duplicated window).
    """
    tk = tokens(F.col(text_col))
    hash_fn = portable_char_hash if hash_mode == "portable" else F.xxhash64
    grams = F.when(
        F.size(tk) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - k + 1),
            lambda i: hash_fn(F.array_join(F.slice(tk, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))

    base = df.select(F.col(id_col), grams.alias("__gs")).transform(bounded_persist)
    ex = base.select(
        id_col, F.posexplode("__gs").alias("__pos0", "__h")
    ).select(id_col, (F.col("__pos0") + 1).alias("__pos"), "__h")

    dup = (
        ex.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") > 1)
        .select("__h")
    )
    marked = ex.join(dup, "__h", "left_semi")

    w = Window.partitionBy(id_col).orderBy("__pos")
    runs = (
        marked.withColumn("__grp", F.col("__pos") - F.row_number().over(w))
        .groupBy(id_col, "__grp")
        .agg(F.count(F.lit(1)).alias("__run"))
        .groupBy(id_col)
        .agg(
            F.sum("__run").alias("__n_dup"),
            F.max("__run").alias("__max_run"),
        )
    )

    counts = base.select(
        F.col(id_col), F.size("__gs").cast("long").alias("n_grams")
    )
    return (
        counts.join(runs, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce(F.col("__n_dup"), F.lit(0)).cast("long").alias("n_dup_grams"),
            F.when(
                F.col("n_grams") > 0,
                F.round(
                    F.coalesce(F.col("__n_dup"), F.lit(0)) / F.col("n_grams"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_gram_ratio"),
            F.coalesce(F.col("__max_run") + (k - 1), F.lit(0))
            .cast("long")
            .alias("max_dup_span"),
        )
    )


# ---------------------------------------------------------------------------
# Within-document segment dedup (self-repetition removal)
# ---------------------------------------------------------------------------

def intra_doc_segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 4,
) -> DataFrame:
    """Remove segments repeated WITHIN the same document, keeping each
    segment's FIRST occurrence in original order.

    The cross-document cousin (operators/corpus.py segment_dedup) drops
    boilerplate shared ACROSS pages; this one targets self-repetition —
    crawler loop artifacts, templated list spam, decoder loops in synthetic
    data — where the same span recurs inside one document. Both use the
    same aligned ``seg_tokens``-token segmentation so their outputs compose.

    Scale contract: this is a pure map-only stage — every expression
    (segmentation, first-occurrence filter, reassembly) runs inside the
    row, so the operator adds ZERO shuffles to a corpus scan at any scale.
    The first-occurrence filter is ``filter(segs, (s, i) ->
    array_position(segs, s) == i+1)`` — quadratic in the per-doc segment
    count, which is bounded (segments are 4 tokens; a 100k-token doc is
    25k segments; in practice docs are chunked far below that upstream).

    Output: (id, n_segments, n_unique_segments, intra_dup_ratio,
    dedup_text).
    """
    tk = tokens(F.col(text_col))
    n_segs = F.ceil(F.size(tk) / seg_tokens).cast("int")
    segs = F.when(
        F.size(tk) > 0,
        F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda j: F.array_join(F.slice(tk, j * seg_tokens + 1, seg_tokens), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col), segs.alias("__segs"))
    kept = F.filter(
        F.col("__segs"),
        lambda s, i: F.array_position(F.col("__segs"), s) == i + F.lit(1),
    )
    return base.select(
        F.col(id_col),
        F.size("__segs").cast("long").alias("n_segments"),
        F.size(kept).cast("long").alias("n_unique_segments"),
        F.when(
            F.size("__segs") > 0,
            F.round(
                (F.size("__segs") - F.size(kept)) / F.size("__segs").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("intra_dup_ratio"),
        F.array_join(kept, " ").alias("dedup_text"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) census
# ---------------------------------------------------------------------------

def cdc_chunk_census(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    divisor: int = 31,
) -> DataFrame:
    """Content-defined chunking + corpus-wide duplicate-chunk census.

    Fixed-size chunking misses duplicates the moment one byte shifts the
    alignment; CDC (the rsync/LBFS/FastCDC idea) cuts where a rolling hash
    of the trailing ``window`` characters hits a divisor condition
    (``h % divisor == 0``), so chunk boundaries realign after insertions
    and shifted copies still hash to the same chunks. Expected chunk size
    is ~``divisor`` characters.

    Production CDC uses a gear/Rabin rolling hash (O(1) per position);
    both engines here recompute an md5 window hash per position — the
    portable-oracle compromise, same asymptotic plan shape (map-only
    chunking), constant-factor slower. The census is ONE hash-groupBy on
    8-byte chunk fingerprints — the only shuffle, and it ships no text.

    The per-position boundary test runs as an Arrow-batched mapInPandas
    stage, not as a higher-order F.filter expression: HOFs are
    CodegenFallback (interpreted), and native-md5-per-position inside one
    cost ~15 µs/char — the round-9 full-registry sf10 sweep clocked the
    expression form at 45+ min over 151 M chars, vs ~1.1 µs/char for
    hashlib in a plain Python loop (the md5 values are identical —
    portable_char_hash_py equality with the Column form is pinned by
    test). The chunk fingerprints for the census still hash in-plan with
    the codegen'd native md5 expression (one per CHUNK, not per char).

    Output: one row per chunk value that occurs more than once anywhere in
    the corpus: (chunk_hash, chunk_len, n_occurrences, n_docs).
    """
    import pandas as pd
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.operators.text import (
        portable_char_hash_py,
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("__chunk", T.StringType()),
        ]
    )

    def cut(batches):
        # boundary at 1-based window-end position i in [window, n-1]
        # (position n excluded: always a bound, must not appear twice)
        # when md5-hash(chars i-window+1..i) % divisor == 0 — the same
        # rule as the oracle's per-position substr/md5 filter.
        for pdf in batches:
            ids: list = []
            chunks: list = []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                if s is None:
                    continue
                n = len(s)
                prev = 0
                for i in range(window, n):
                    if portable_char_hash_py(s[i - window : i]) % divisor == 0:
                        if i > prev:
                            ids.append(did)
                            chunks.append(s[prev:i])
                        prev = i
                if n > prev:
                    ids.append(did)
                    chunks.append(s[prev:n])
            yield pd.DataFrame({id_col: ids, "__chunk": chunks})

    ex = df.select(id_col, text_col).mapInPandas(cut, out_schema)
    return (
        ex.select(
            F.col(id_col),
            portable_char_hash(F.col("__chunk")).alias("chunk_hash"),
            F.length("__chunk").cast("long").alias("chunk_len"),
        )
        .groupBy("chunk_hash", "chunk_len")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
    )
