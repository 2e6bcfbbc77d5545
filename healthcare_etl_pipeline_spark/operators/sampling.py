"""Deterministic sampling & split assignment for corpus preparation.

The production way to subset 100 TB reproducibly is NOT ``df.sample``
(seeded per-partition RNG — results change with partitioning/ordering) but
a pure function of a stable key: ``bucket = mix(id) % N``. Properties that
matter at scale:

- **No shuffle, no state**: a per-row projection; splits are stable across
  reruns, cluster sizes, and engines (the same arithmetic runs in DuckDB
  for the oracle).
- **Disjoint + exhaustive**: bucket ranges partition the keyspace, so
  train/val/test can never overlap or drop rows.
- **Salt**: changing the salt yields an independent split family (for
  cross-validation folds or re-rolling a contaminated split).

The mixer is a multiplicative-hash mod a large prime, computed as
``((id mod p) * (K mod p) + salt) mod p`` so intermediates stay below
2^63 even for 64-bit ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.text import MOD

# Knuth's multiplicative constant (golden-ratio based); any odd constant
# works — it only needs to decorrelate consecutive ids.
MIX_K = 2654435761
# Second, independent odd constant (xxHash PRIME32_2) for the pair mixer:
# mixing only the FIRST id leaves bucket(a, b+1) = bucket(a, b) + 1 (mod
# rollovers), so consecutive-id copy clusters sample a fixed stride-residue
# class. Multiplying BOTH ids (each product reduced mod p before the sum,
# so every intermediate stays < 1e18 << 2^63) removes the unit stride —
# but ANY affine mix of b still has a constant stride (K2 mod p mod
# BUCKETS), so the affine combine is followed by a CUBING scramble:
# x -> x^3 mod p is a bijection of Z_p because gcd(3, p-1) = 1 for
# p = 1e9+7 (p-1 = 2 * 500000003), non-linear in both ids, and keeps the
# marginal rate exact (a bijection maps the uniform keyspace to itself;
# bucket classes stay balanced to the same p-mod-BUCKETS floor as the
# single-id mixer). Intermediates: x < p ~= 1e9, so x*x < 1e18 < 2^63,
# reduced mod p before the final multiply.
MIX_K2 = 2246822519
BUCKETS = 10_000


def hash_bucket(id_col: Column | str, *, salt: int = 0) -> Column:
    """Deterministic bucket in [0, BUCKETS): ((id%p)*(K%p)+salt)%p % BUCKETS."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = (c.cast("long") % MOD) * (MIX_K % MOD) + F.lit(salt)
    return (mixed % MOD % BUCKETS).cast("int")


def hash_bucket_sql(expr: str, *, salt: int = 0) -> str:
    """The identical arithmetic in portable SQL (DuckDB oracle)."""
    return (
        f"CAST((((CAST({expr} AS BIGINT) % {MOD}) * ({MIX_K % MOD}) + {salt})"
        f" % {MOD}) % {BUCKETS} AS INTEGER)"
    )


def pair_bucket(
    a: Column | str, b: Column | str, *, salt: int = 0
) -> Column:
    """Deterministic bucket for an ID PAIR: multiplicatively mixes BOTH
    ids (independent odd constants, each product reduced mod p before the
    sum), then scrambles the affine combine through the x^3 mod p
    bijection before reducing mod BUCKETS. Pure function of the two
    ids — the engine-portable way to sample pair-shaped outputs
    (near-duplicate listings) whose full cardinality is Θ(true pairs).
    The marginal keep rate of ``pair_bucket % mod == 0`` is exactly
    1/mod over the keyspace (the cube is a bijection of Z_p); the
    non-linear scramble leaves no bucket stride in either id, so the
    kept set is decorrelated from id arithmetic within consecutive-id
    copy clusters."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mixed = (
        ((ca.cast("long") % MOD) * (MIX_K % MOD)) % MOD
        + ((cb.cast("long") % MOD) * (MIX_K2 % MOD)) % MOD
        + F.lit(salt)
    ) % MOD
    cubed = (mixed * mixed % MOD) * mixed % MOD
    return (cubed % BUCKETS).cast("int")


def pair_bucket_sql(expr_a: str, expr_b: str, *, salt: int = 0) -> str:
    """The identical pair-bucket arithmetic in portable SQL (the affine
    combine is interpolated three times for the inline cube — verbose but
    expression-positional, so it drops into any WHERE clause)."""
    m = (
        f"((((CAST({expr_a} AS BIGINT) % {MOD}) * ({MIX_K % MOD}) % {MOD})"
        f" + ((CAST({expr_b} AS BIGINT) % {MOD}) * ({MIX_K2 % MOD}) % {MOD})"
        f" + {salt}) % {MOD})"
    )
    return f"CAST(({m} * {m} % {MOD}) * {m} % {MOD} % {BUCKETS} AS INTEGER)"


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    fractions: dict[str, float] | None = None,
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative bucket ranges.

    ``fractions`` maps split name → fraction (must sum to ≤ 1; any
    remainder falls into the LAST split). Assignment is a pure projection:
    zero shuffle, stable under reruns and repartitioning.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    bucket = hash_bucket(id_col, salt=salt)
    expr: Column | None = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        bound = int(round(cum * BUCKETS))
        clause = bucket < F.lit(bound)
        expr = F.when(clause, F.lit(name)) if expr is None else expr.when(clause, F.lit(name))
    last = F.lit(names[-1])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def grouped_hash_split(
    df: DataFrame,
    group_col: str,
    *,
    fractions: dict[str, float] | None = None,
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe split: bucket on a GROUP key so every member of a
    group lands on the same side.

    Splitting training corpora on the ROW key leaks: near-duplicate
    documents (or documents by one author, turns of one conversation,
    frames of one video) straddle train and eval, and the model is scored
    on rephrasings of its own training data. The fix is to split on the
    unit of correlation — e.g. the connected-component id of the near-dup
    graph (``operators.dedup.connected_components`` over LSH pair
    evidence), a session id, or a source domain — which this wrapper
    makes explicit: same zero-shuffle deterministic bucket arithmetic as
    :func:`hash_split`, applied to ``group_col``. Disjointness is then a
    THEOREM (one group → one bucket → one split), not a post-hoc filter;
    the ``leakage_safe_split_docs`` query asserts zero crossing pairs
    against the oracle anyway.
    """
    return hash_split(
        df, group_col, fractions=fractions, salt=salt, split_col=split_col
    )


def hash_sample(
    df: DataFrame, id_col: str, *, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (bucket < fraction·BUCKETS).

    Subsets are NESTED across fractions at the same salt: the 1% sample is
    a subset of the 10% sample — exactly what you want for scaling-law
    subcorpora.
    """
    bound = int(round(fraction * BUCKETS))
    return df.filter(hash_bucket(id_col, salt=salt) < F.lit(bound))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    fraction (corpus re-balancing — e.g. downsample the dominant language).

    Same zero-shuffle bucket mechanism as ``hash_sample``; per-stratum
    subsets stay nested across fraction changes at the same salt, so
    rebalancing is reproducible and monotone.
    """
    bucket = hash_bucket(id_col, salt=salt)
    bound: Column = F.lit(int(round(default_fraction * BUCKETS)))
    for value, frac in fractions.items():
        bound = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * BUCKETS)))
        ).otherwise(bound)
    return df.filter(bucket < bound)


def balance_strata(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    salt: int = 0,
) -> DataFrame:
    """Deterministic downsample-only rebalancing to a UNIFORM stratum mix
    (the data-mixing step of corpus preparation: stop one dominant source/
    language from swamping the training distribution).

    Every stratum is thinned toward the size of the SMALLEST stratum:
    rate_s = min_count / n_s, applied as the usual zero-shuffle hash-bucket
    filter (kept counts are hash-proportional ≈ min_count per stratum, and
    the kept subset is stable across reruns/partitionings/engines).

    Everything is computed IN the plan — stratum counts (one map-side
    combined agg), the min (a 1-row broadcast), the per-stratum rates (a
    broadcast join back onto the data) — so no driver round-trip and no
    precomputed model; the same plan runs unchanged at any scale.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    rates = counts.crossJoin(F.broadcast(floor_n)).select(
        strata_col,
        # same operation ORDER as the oracle SQL (min_n * B / n): floor at
        # an exact integer boundary must see the identical double
        F.floor(F.col("__min_n") * BUCKETS / F.col("__n")).alias("__bound"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(id_col, salt=salt) < F.col("__bound"))
        .drop("__bound")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of ``k`` rows via
    exponential sort (Efraimidis & Spirakis A-ES, 2006): each row draws
    key = -ln(u)/w with u uniform in (0,1], and the k SMALLEST keys win —
    inclusion probability proportional to weight, single pass, no
    sequential reservoir.

    u derives from the portable hash of the id (+salt), so the "draw" is
    deterministic, re-runnable, and identical in the SQL oracle — the
    reproducible-sampling contract every eval/train split here follows.
    The top-k is TakeOrderedAndProject: per-partition heads of k, no
    global sort. Weights must be > 0; rows with NULL or non-positive
    weight are excluded (they can never be sampled).

    Output: the sampled rows' id, weight, and sample_key (rounded 9 dp).
    """
    from healthcare_etl_pipeline_spark.operators.text import (
        MOD,
        portable_char_hash,
    )

    c = F.col(id_col).cast("string")
    u = (
        portable_char_hash(F.concat(c, F.lit(f"|ws{salt}"))) + 1
    ).cast("double") / float(MOD)
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(id_col),
            F.col(weight_col),
            F.round(key, 9).alias("sample_key"),
        )
        .orderBy(F.asc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    alpha: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Temperature-based source re-mixing (the multilingual-sampling rule of
    XLM-R / mT5): resample so stratum sizes follow n_i^alpha instead of
    n_i — alpha=1 keeps the natural mix, alpha=0 is the uniform mix of
    ``balance_strata``, between values damp dominant sources without
    starving them.

    Downsample-only keep-rate r_i = (min_n / n_i)^(1-alpha) (so the largest
    rate is 1 — no upsampling), applied as the deterministic zero-shuffle
    hash-bucket filter. Rates, counts, and the min are all computed IN the
    plan (one agg + 1-row broadcast + broadcast join), same as
    ``balance_strata``.

    alpha=0.5 (the default, and mT5's choice) uses sqrt — an IEEE
    correctly-rounded op, so the floor(rate*BUCKETS) boundary is
    bit-identical in any engine; other alphas go through pow(), where a
    1-ulp libm difference could flip a boundary row cross-engine.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ratio = F.col("__min_n").cast("double") / F.col("__n").cast("double")
    rate = (
        F.sqrt(ratio)
        if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    rates = counts.crossJoin(F.broadcast(floor_n)).select(
        strata_col,
        F.floor(rate * BUCKETS).alias("__bound"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(id_col, salt=salt) < F.col("__bound"))
        .drop("__bound")
    )


def shuffle_key(id_col: Column | str, *, seed: int = 0) -> Column:
    """Deterministic pseudo-random TOTAL-ORDER key for global shuffling:
    the cubed mixer over (id, seed) — ``x -> ((id*K + seed) % p)^3 % p``
    is a bijection of Z_p (gcd(3, p-1) = 1), so ids below p get DISTINCT
    keys and the induced order is a seeded permutation, not a sample.
    Ids ≥ p alias mod p (keys then tie; callers break ties by id), which
    only makes the order locally less random, never loses a row. Changing
    ``seed`` yields an independent training order — the reshuffle between
    epochs, without RNG state or partition sensitivity."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    mixed = ((c.cast("long") % MOD) * (MIX_K % MOD) + F.lit(seed)) % MOD
    return (mixed * mixed % MOD) * mixed % MOD


def shuffle_key_sql(expr: str, *, seed: int = 0) -> str:
    """The identical arithmetic in portable SQL (DuckDB oracle)."""
    m = f"(((CAST({expr} AS BIGINT) % {MOD}) * ({MIX_K % MOD}) + {seed}) % {MOD})"
    return f"(({m} * {m} % {MOD}) * {m} % {MOD})"


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets a
    ``shard`` in [0, n_shards) and a ``pos`` (1-based) giving its position
    within the shard under the seeded permutation — the write-side shape of
    "globally shuffle the corpus, then write N shard files in order" that
    training-data pipelines need for IO-efficient random-order reads.

    Physical plan = exactly the shard write: ONE hash shuffle on ``shard``
    + an in-partition sort (the window below), so at 100 TB each shard
    streams through one task in its final order — no global sort, no
    single reducer, no driver involvement. Disjoint + exhaustive by
    construction (shard = key % n_shards; pos = row_number within shard),
    stable across reruns, partitioning, and engines (pure arithmetic —
    the same expressions run in DuckDB for the oracle)."""
    from pyspark.sql.window import Window

    key = shuffle_key(id_col, seed=seed)
    with_key = df.withColumn("__shuffle_key", key).withColumn(
        shard_col, (F.col("__shuffle_key") % n_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.col("__shuffle_key"), F.col(id_col)
    )
    return (
        with_key.withColumn(pos_col, F.row_number().over(w))
        .drop("__shuffle_key")
    )


def contrastive_negatives(
    docs: DataFrame,
    id_col: str = "doc_id",
    *,
    k: int = 3,
    salt: int = 0,
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training.

    For every anchor document, derive ``k`` pseudo-random negative ids as
    a pure function of ``(anchor_id, rank, salt)`` — the same mixer family
    as :func:`hash_bucket`, reduced modulo the id-space size — then join
    back against the corpus to fetch the negatives' content. Properties
    that matter at 100 TB:

    - **No RNG state**: negatives are recomputable by any engine from ids
      alone (``df.sample``-style seeded RNG changes with partitioning);
      re-running an epoch or resuming mid-shard yields identical pairs.
    - **One shuffle**: candidate generation is a narrow projection
      (explode of k ranks + arithmetic); the only exchange is the
      equi-join fetching negative payloads. The id-space size is a 1-row
      scalar broadcast, not a driver constant.
    - **Self-collisions drop** (``neg_id != anchor_id``): a uniform
      sampler re-draws; a deterministic one can't, so the contract is
      "UP TO k negatives" — at corpus scale the collision rate is k/n.

    Returns ``(anchor_id, neg_rank, neg_id)``; callers join for payloads.
    """
    n1 = docs.agg((F.max(F.col(id_col).cast("long")) + 1).alias("_n"))
    ranks = F.explode(F.array([F.lit(j) for j in range(1, k + 1)])).alias("neg_rank")
    cand = (
        docs.select(F.col(id_col).cast("long").alias("anchor_id"))
        .crossJoin(F.broadcast(n1))
        .select("anchor_id", "_n", ranks)
        .withColumn(
            "neg_id",
            (
                (F.col("anchor_id") % MOD) * (MIX_K % MOD)
                + (F.col("neg_rank").cast("long") + F.lit(salt)) * (MIX_K2 % MOD)
            )
            % MOD
            % F.col("_n"),
        )
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", F.col("neg_rank").cast("int").alias("neg_rank"), "neg_id")
    )
    return cand


def contrastive_negatives_sql(id_expr: str, *, k: int = 3, salt: int = 0) -> str:
    """DuckDB twin of :func:`contrastive_negatives` candidate generation:
    a CTE body producing (anchor_id, neg_rank, neg_id) from ``documents``."""
    return f"""
      WITH _n AS (SELECT max(CAST({id_expr} AS BIGINT)) + 1 AS n FROM documents),
      _ranks AS (SELECT unnest(range(1, {k + 1})) AS neg_rank),
      _cand AS (
        SELECT CAST(d.{id_expr} AS BIGINT) AS anchor_id,
               CAST(r.neg_rank AS INTEGER) AS neg_rank,
               ((CAST(d.{id_expr} AS BIGINT) % {MOD}) * ({MIX_K % MOD})
                + (CAST(r.neg_rank AS BIGINT) + {salt}) * ({MIX_K2 % MOD}))
               % {MOD} % _n.n AS neg_id
        FROM documents d, _n, _ranks r
      )
    """
