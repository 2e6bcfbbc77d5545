"""Custom join operators Spark lacks as built-ins: as-of join, range join,
salted skew join.

These are the "custom operators" tier of the engine (SURVEY.md §2.8 /
build-plan §7.3): each is a composition of existing DataFrame ops — no UDF,
no Catalyst extension — chosen for its shuffle profile at scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with the same key
    and ``right_time <= left_time`` (``<`` when ``strict``).

    Implementation is the union-merge, NOT a range join: tag both sides,
    union, and run one window pass per key ordered by (time, side) taking
    ``last(payload, ignorenulls)``. Cost = ONE shuffle of |left|+|right|
    rows on the key — versus the naive join-then-rank which materializes
    every (left row × earlier right row) pair before pruning. At 100 TB the
    pairwise blowup is quadratic per hot key; the union-merge is linear.

    Ties: a right row at exactly left_time sorts before the left row
    (side 0 < side 1), so inclusive semantics match DuckDB's ASOF JOIN.

    All payload columns are packed into ONE struct and ``last(struct,
    ignorenulls)`` is applied once — per-column last() would fill a NULL
    payload field of the matched right row from an OLDER right row, mixing
    columns from different right rows (ASOF semantics return the matched
    row's values, NULLs included).
    """
    from pyspark.sql import types as T

    # Side markers order tie-breaks within one timestamp: inclusive mode
    # puts right rows first (visible to a same-instant left row); strict
    # mode puts them after (invisible).
    left_side, right_side = (1, 0) if not strict else (0, 1)
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(left_side).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(right_side).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        F.struct(*payload_cols).alias("__payload"),
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__left",
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    return (
        merged.filter(F.col("__side") == left_side)
        .select("__left.*", "__payload.*")
    )


def pit_join(
    labels: DataFrame,
    features: list[tuple[str, DataFrame, str, list[str]]],
    *,
    key: str,
    label_time: str,
    horizon: Column | None = None,
) -> DataFrame:
    """Point-in-time-correct multi-feature join (feature-store semantics):
    for each label row, attach from EACH feature table the payload of the
    latest feature row with the same key and ``feature_time <= label_time``
    — NULL when no feature row qualifies, and NULL when the matched row is
    older than ``label_time - horizon`` (feature staleness TTL).

    ``features`` is a list of ``(name, df, time_col, payload_cols)``;
    payload column names must be distinct across feature tables (they land
    flat in the output). ``horizon`` is an interval Column (e.g.
    ``F.expr("INTERVAL 30 MINUTES")``) applied to every feature table;
    None disables staleness nulling.

    Scale shape: K chained as-of joins would shuffle the label table K
    times. This is ONE union of labels + all K feature tables and ONE
    window pass per key — ``K`` independent ``last(payload_k,
    ignorenulls)`` expressions share the same sort, so the whole join
    costs a single shuffle of |labels| + Σ|features| rows regardless of
    K. Staleness is decided AFTER the merge from the matched row's own
    timestamp (carried inside the payload struct): the latest at-or-before
    row is the only candidate that could be fresh — anything earlier is
    staler — so null-if-stale equals match-only-within-window.

    Ties: a feature row at exactly ``label_time`` is visible (feature side
    sorts before the label side at the same instant), matching DuckDB's
    inclusive ``ASOF JOIN ... ON f.ts <= l.ts``. Rows of one feature table
    that share (key, time) must be pre-deduplicated by the caller — which
    row wins is otherwise tie-broken by physical order.
    """
    from pyspark.sql import types as T

    label_struct_t = T.StructType(
        [T.StructField(c, labels.schema[c].dataType) for c in labels.columns]
    )
    feat_struct_t = {}
    for name, fdf, time_col, payload_cols in features:
        feat_struct_t[name] = T.StructType(
            [T.StructField("__ft", fdf.schema[time_col].dataType)]
            + [T.StructField(c, fdf.schema[c].dataType) for c in payload_cols]
        )

    def null_feats(except_name: str | None):
        return [
            (
                F.struct(
                    F.col(time_col).alias("__ft"),
                    *[F.col(c) for c in payload_cols],
                )
                if name == except_name
                else F.lit(None).cast(feat_struct_t[name])
            ).alias(f"__f_{name}")
            for name, _fdf, time_col, payload_cols in features
        ]

    l_tagged = labels.select(
        F.col(key).alias("__key"),
        F.col(label_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*labels.columns).alias("__label"),
        *null_feats(None),
    )
    merged = l_tagged
    for name, fdf, time_col, _payload_cols in features:
        merged = merged.unionByName(
            fdf.select(
                F.col(key).alias("__key"),
                F.col(time_col).alias("__t"),
                F.lit(0).alias("__side"),
                F.lit(None).cast(label_struct_t).alias("__label"),
                *null_feats(name),
            )
        )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "__side",
        "__t",
        "__label",
        *[
            F.last(f"__f_{name}", ignorenulls=True).over(w).alias(f"__f_{name}")
            for name, *_ in features
        ],
    ).filter(F.col("__side") == 1)
    out_cols: list[Column | str] = ["__label.*"]
    for name, _fdf, _time_col, payload_cols in features:
        fresh = (
            F.lit(True)
            if horizon is None
            else F.col(f"__f_{name}.__ft") >= F.col("__t") - horizon
        )
        out_cols.extend(
            F.when(fresh, F.col(f"__f_{name}.{c}")).alias(c) for c in payload_cols
        )
    return carried.select(*out_cols)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    key: str | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Point-in-interval range join via bucketed equi-join.

    A raw ``l.point BETWEEN r.lo AND r.hi`` join has no equi-key, so Spark
    falls back to BroadcastNestedLoop/cartesian. Binning assigns each
    interval to every bin it overlaps (explode) and each point to its bin —
    the join becomes an equi-join on the bin id and the BETWEEN predicate
    only runs inside matching bins. Choose ``bin_width`` ~ typical interval
    length so intervals explode to O(1) bins.
    """
    lo_bin = F.floor(F.col(right_lo) / bin_width).cast("long")
    hi_bin = F.floor(F.col(right_hi) / bin_width).cast("long")
    r_binned = right.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    l_binned = left.withColumn(
        "__bin", F.floor(F.col(left_point) / bin_width).cast("long")
    )
    cond = (F.col(left_point) >= F.col(right_lo)) & (
        F.col(left_point) <= F.col(right_hi)
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    join_keys = ["__bin"] if key is None else [key, "__bin"]
    return l_binned.join(r_binned, join_keys).filter(cond).drop("__bin")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side across all salt values.

    For hot keys (one key = one straggler partition in a plain shuffle
    join), salting spreads each key over ``salt_buckets`` reducers. AQE's
    skewJoin handles moderate skew automatically; this operator is the
    explicit form for pathological keys or when AQE is off (streaming).

    Only inner/left/left_semi are supported: the small side is REPLICATED
    across salt buckets, so right/full-outer would emit ``salt_buckets``
    phantom rows for every unmatched small-side key.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(
            f"salted_join supports how in ('inner','left','left_semi'); got {how!r} "
            "(the replicated small side would duplicate unmatched rows under "
            "right/full outer joins)"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, [key, "__salt"], how).drop("__salt")


# Memoized probe results keyed by (plan semantic hash, key, fraction):
# repeated skew_join(probe=True) calls over the same logical big side —
# a registry query re-run, a loop over partitions of one table — reuse
# the sampled estimate instead of re-scanning. semanticHash is analysis-
# only (no job) and stable across equivalent plans in one session.
_PROBE_MEMO: dict[tuple, float] = {}


def probe_hot_share(
    df: DataFrame,
    key: str,
    *,
    probe_fraction: float = 0.001,
    memo: bool = True,
) -> float:
    """Estimate the hottest key's share of ``df`` rows from one cheap
    sampled aggregation (the ``probe=True`` path of :func:`skew_join`).
    Results are memoized per (semantic plan, key, fraction) so repeated
    gate decisions on the same input cost one scan, not N."""
    ident = None
    if memo:
        try:
            ident = (df.semanticHash(), key, probe_fraction)
        except Exception:
            ident = None  # connect-mode / analysis quirk: skip the memo
        if ident is not None and ident in _PROBE_MEMO:
            return _PROBE_MEMO[ident]
    sample = df.select(key).sample(fraction=probe_fraction, seed=42)
    top = (
        sample.groupBy(key)
        .count()
        .agg(
            F.max("count").alias("top"),
            F.sum("count").alias("total"),
        )
        .collect()[0]
    )
    hot_share = (top.top / top.total) if top.total else 0.0
    if ident is not None:
        _PROBE_MEMO[ident] = hot_share
    return hot_share


def skew_join(
    big: DataFrame,
    small: DataFrame,
    *,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    force: str | None = None,
    hot_share: float | None = None,
    probe: bool = False,
    hot_threshold: float = 0.05,
    probe_fraction: float = 0.001,
) -> DataFrame:
    """Skew-gated join — the ``dim_hint`` pattern applied to salting,
    with the gate set by MEASUREMENT, not folklore (tools/skew_ab.py,
    paired best-of-2 interleaved, sort-merge regime, BENCH_NOTES r8):

    ==================  ========  ========  =============
    key distribution    plain+AQE  salted    AQE-skew-off
    ==================  ========  ========  =============
    40 %-hot @ sf100     221.1 s   101.2 s    156.2 s
    40 %-hot @ sf10        8.9 s     3.6 s      7.3 s
    uniform @ sf10         1.9 s     3.0 s      2.0 s
    ==================  ========  ========  =============

    Two measured facts drive the gate. (1) On a genuinely hot key,
    explicit salting beats AQE's skewJoin 2.2× — AQE splits the
    oversized partition only AFTER the map side has already funneled the
    hot key through one shuffle partition, and its split-read of that
    partition measured slower than no handling at all here. (2) On a
    uniform key salting costs ~1.5× (small side replicated
    ``salt_buckets``×, wider shuffle key, no co-partitioning reuse), so
    salting unconditionally is also wrong.

    Gate, in order:
    - ``force="salt"``/``force="plain"`` — caller knows;
    - ``hot_share`` (fraction of big-side rows on the hottest key,
      caller-known or estimated by ``probe=True`` via one cheap sampled
      aggregation, ~0.1 % of the big side): ≥ ``hot_threshold`` → salt,
      else plain;
    - no information: plain when AQE skew handling is on (its split is
      still a safety net against stragglers the caller didn't predict —
      and it costs nothing when skew never materializes), salted when
      that net is off (AQE unsupported, e.g. stateful streaming
      micro-batches).
    """
    if force not in (None, "salt", "plain"):
        raise ValueError(f"force must be None, 'salt' or 'plain'; got {force!r}")
    spark = big.sparkSession
    if force == "plain":
        return big.join(small, key, how)
    if force != "salt":
        if hot_share is None and probe:
            hot_share = probe_hot_share(
                big, key, probe_fraction=probe_fraction
            )
        if hot_share is not None:
            if hot_share < hot_threshold:
                return big.join(small, key, how)
        else:
            # conf.get(key) with NO default resolves Spark's registered
            # built-in default (both true since 3.2); passing a default
            # would instead return it whenever the key was never SET,
            # misreading AQE as off in sessions not built by get_spark.
            def _effective(conf_key: str) -> str:
                try:
                    return str(spark.conf.get(conf_key)).lower()
                except Exception:
                    return "false"

            aqe_skew = (
                _effective("spark.sql.adaptive.enabled") == "true"
                and _effective("spark.sql.adaptive.skewJoin.enabled") == "true"
            )
            if aqe_skew:
                return big.join(small, key, how)
    return salted_join(
        big, small, key=key, salt_buckets=salt_buckets, how=how
    )


def fuzzy_blocked_pairs(
    df: DataFrame,
    name_col: str,
    *,
    block: Column,
    max_dist: int = 3,
) -> DataFrame:
    """Entity-resolution candidate pairs: distinct names whose edit
    distance is <= ``max_dist``, restricted to names sharing a blocking
    key (the classic blocking-then-matching ER pipeline — Fellegi-Sunter
    shape with a deterministic edit-distance matcher).

    Scale shape: matching runs on DISTINCT names with an occurrence
    count, never on rows — a name seen a million times costs one
    comparison, and the quadratic self-join is confined to each block
    (pairs ~ sum_b |block_b|^2, not n^2). Levenshtein stays JVM-side
    (built-in expression). The a < b ordering emits each pair once.

    Output: block, name_a, name_b, dist, n_a, n_b.
    """
    names = (
        df.select(
            F.trim(F.lower(F.col(name_col))).alias("name"),
        )
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("block", block)
    )
    a = names.select(
        "block",
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = names.select(
        "block",
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("block", "name_a", "name_b", "dist", "n_a", "n_b")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    key: str | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Interval × interval overlap join via bucketed equi-join.

    The interval analogue of ``range_join_binned``: both sides explode to
    the bins their interval covers, the join runs as an equi-join on the
    bin id (optionally plus ``key``), and the true overlap predicate
    ``l.lo <= r.hi AND r.lo <= l.hi`` only evaluates inside matching bins.

    A pair overlapping several bins would match once per shared bin; the
    FIRST-OVERLAP-BIN guard — emit only where the bin equals
    floor(max(l.lo, r.lo) / width) — makes each pair surface exactly once
    WITHOUT a distinct() (one less shuffle; the dedup trick from the
    spatial-join literature's "report at reference point" rule).
    """
    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        lo_bin = F.floor(F.col(lo) / bin_width).cast("long")
        hi_bin = F.floor(F.col(hi) / bin_width).cast("long")
        return df.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))

    l_binned = binned(left, left_lo, left_hi)
    r_binned = binned(right, right_lo, right_hi)
    overlap = (F.col(left_lo) <= F.col(right_hi)) & (
        F.col(right_lo) <= F.col(left_hi)
    )
    first_bin = (
        F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / bin_width).cast("long")
        == F.col("__bin")
    )
    cond = overlap & first_bin
    if extra_cond is not None:
        cond = cond & extra_cond
    join_keys = ["__bin"] if key is None else [key, "__bin"]
    return l_binned.join(r_binned, join_keys).filter(cond).drop("__bin")


def jaro_winkler_blocked_pairs(
    df: DataFrame,
    name_col: str,
    *,
    block: Column,
    min_sim: float = 0.9,
) -> DataFrame:
    """Fuzzy candidate pairs scored by Jaro-Winkler similarity instead of
    edit distance: the standard matcher for short name-like strings, where
    shared prefixes matter more than raw edits (Winkler 1990, p=0.1 prefix
    boost above the 0.7 Jaro threshold — the parameterization DuckDB's
    jaro_winkler_similarity and Apache Commons both ship, verified
    bit-exact against DuckDB over every blocked part-name pair).

    Same blocking shape as ``fuzzy_blocked_pairs``: distinct names with
    occurrence counts, candidate pairs only within a block, each pair
    once via a < b. Spark has no Jaro-Winkler expression, so scoring runs
    in ONE Arrow-batched pandas UDF over the blocked candidate pairs —
    the quadratic-confined small side of the pipeline, never the raw rows.

    Output: block, name_a, name_b, jw_sim (6 dp), n_a, n_b.
    """

    @F.pandas_udf("double")
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        def jaro(s1: str, s2: str) -> float:
            if s1 == s2:
                return 1.0
            l1, l2 = len(s1), len(s2)
            if l1 == 0 or l2 == 0:
                return 0.0
            md = max(max(l1, l2) // 2 - 1, 0)
            f1 = [False] * l1
            f2 = [False] * l2
            m = 0
            for i in range(l1):
                for j in range(max(0, i - md), min(l2, i + md + 1)):
                    if not f2[j] and s1[i] == s2[j]:
                        f1[i] = f2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            k = 0
            for i in range(l1):
                if f1[i]:
                    while not f2[k]:
                        k += 1
                    if s1[i] != s2[k]:
                        t += 1
                    k += 1
            t //= 2
            return (m / l1 + m / l2 + (m - t) / m) / 3

        def jw(s1: str, s2: str) -> float:
            j = jaro(s1, s2)
            if j <= 0.7:
                return j
            pref = 0
            for x, y in zip(s1[:4], s2[:4]):
                if x != y:
                    break
                pref += 1
            return j + pref * 0.1 * (1 - j)

        return pd.Series([jw(x, y) for x, y in zip(a, b)])

    names = (
        df.select(F.trim(F.lower(F.col(name_col))).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("block", block)
    )
    a = names.select(
        "block", F.col("name").alias("name_a"), F.col("n").alias("n_a")
    )
    b = names.select(
        "block", F.col("name").alias("name_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("jw_sim", _jw("name_a", "name_b"))
        .filter(F.col("jw_sim") >= min_sim)
        .select(
            "block",
            "name_a",
            "name_b",
            F.round("jw_sim", 6).alias("jw_sim"),
            "n_a",
            "n_b",
        )
    )
