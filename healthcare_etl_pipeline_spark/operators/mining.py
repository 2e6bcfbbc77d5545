"""Pattern mining and order-statistics operators: market-basket pair
mining, PMI co-occurrence, Pareto (skyline) frontier.

Extension surface beyond the reference (which has no analytics of its own —
all querying is delegated to PostgreSQL, see SURVEY.md §0): these are the
association/co-occurrence primitives an analytics engine over transactional
and text corpora is expected to carry.

Scale design:
- **Frequent pairs** (A-priori, 2-itemsets): the pair space is generated
  per-basket AFTER a distinct-items projection, so the self-join blow-up is
  bounded by items-per-basket (small constant), never by corpus size. The
  pair count is one hash-groupBy on a tiny key domain; marginals broadcast
  back for lift.
- **PMI co-occurrence**: identical shape over (doc × vocabulary-filtered
  token) — the document-frequency floor bounds the per-doc pair fan-out and
  makes the vocabulary scale-invariant (a fraction, not a count).
- **Pareto frontier**: the classic sorted sweep is a single-partition
  window (the ADVICE-flagged anti-pattern). This is the two-phase form:
  range-partition on the primary dimension, per-partition running max of
  the secondary, then broadcast per-partition prefix maxima — the same
  distributed prefix-scan used by ``select_until_budget``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from healthcare_etl_pipeline_spark.operators.cache import bounded_persist
from healthcare_etl_pipeline_spark.operators.text import tokens


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_baskets: int = 2,
) -> DataFrame:
    """Frequent 2-itemsets with support and lift over (basket, item) rows.

    A-priori at the pair level: distinct (basket, item) first — the
    projection that keeps the per-basket self-join bounded by basket
    cardinality — then item pairs within a basket under ``item_a <
    item_b``, a count per pair, and support/lift against the broadcast
    single-item marginals.

    Output: (item_a, item_b, n_baskets, support, lift) with support/lift
    rounded to 6 so cross-engine float noise cannot flip a comparison.
    """
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    items = bounded_persist(items)

    n_total = items.select(F.countDistinct("__b").alias("__n"))
    singles = items.groupBy("__i").agg(F.count(F.lit(1)).alias("__n_i"))

    pairs = (
        items.alias("l")
        .join(items.alias("r"), F.col("l.__b") == F.col("r.__b"))
        .filter(F.col("l.__i") < F.col("r.__i"))
        .groupBy(
            F.col("l.__i").alias("item_a"), F.col("r.__i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_baskets)
    )
    return (
        pairs.join(
            F.broadcast(singles.select(F.col("__i").alias("item_a"), F.col("__n_i").alias("__na"))),
            "item_a",
        )
        .join(
            F.broadcast(singles.select(F.col("__i").alias("item_b"), F.col("__n_i").alias("__nb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(F.col("n_baskets") / F.col("__n"), 6).alias("support"),
            F.round(
                (F.col("n_baskets") * F.col("__n"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("lift"),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df_ratio: float = 0.08,
    min_cooccur: int = 5,
) -> DataFrame:
    """Pointwise mutual information of token pairs co-occurring in a
    document: ``pmi = ln(n_ab * N / (n_a * n_b))``.

    The vocabulary is floored at ``min_df_ratio`` document frequency — a
    FRACTION, so the same setting holds at any corpus size — before pair
    generation; the co-occurrence floor bounds the output.

    Output: (tok_a, tok_b, n_ab, pmi) with pmi rounded to 6.
    """
    doc_toks = docs.select(
        F.col(id_col).alias("__d"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("__t"),
    )
    doc_toks = bounded_persist(doc_toks)

    n_docs_df = docs.select(F.count(F.lit(1)).alias("__n"))
    vocab = (
        doc_toks.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("__df") >= F.col("__n") * F.lit(min_df_ratio))
        .select("__t", "__df")
    )
    kept = doc_toks.join(F.broadcast(vocab.select("__t")), "__t", "left_semi")

    pairs = (
        kept.alias("l")
        .join(kept.alias("r"), F.col("l.__d") == F.col("r.__d"))
        .filter(F.col("l.__t") < F.col("r.__t"))
        .groupBy(F.col("l.__t").alias("tok_a"), F.col("r.__t").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_cooccur)
    )
    return (
        pairs.join(
            F.broadcast(vocab.select(F.col("__t").alias("tok_a"), F.col("__df").alias("__na"))),
            "tok_a",
        )
        .join(
            F.broadcast(vocab.select(F.col("__t").alias("tok_b"), F.col("__df").alias("__nb"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log((F.col("n_ab") * F.col("__n")) / (F.col("__na") * F.col("__nb"))),
                6,
            ).alias("pmi"),
        )
    )


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """2-D Pareto (skyline) frontier: rows not strictly dominated on both
    dimensions (maximize both). A row survives iff its ``y`` exceeds the
    maximum ``y`` among all rows strictly ranked ahead of it in the
    ``(x desc, tiebreak)`` total order — the classic sorted sweep.

    Distributed form (NOT the single-partition ``Window.orderBy`` sweep):
    1. ``repartitionByRange`` on the sweep order — sampled split points,
       no global sort on one machine;
    2. per-partition running max of ``y`` under a partition-local window;
    3. one max per partition (``n_parts`` rows) running-maxed on the
       driver-sized frame and broadcast back as prefix offsets.
    A row's "best y ahead of me" = max(local running max excluding self,
    prefix max of earlier partitions).
    """
    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ordered = bounded_persist(
        df.repartitionByRange(n_parts, F.desc(x_col), F.asc(tiebreak_col))
        .sortWithinPartitions(F.desc(x_col), F.asc(tiebreak_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ordered.groupBy("_pid")
        .agg(F.max(y_col).alias("_part_max"))
        .withColumn("_prev_max", F.max("_part_max").over(w_off))
        .select("_pid", "_prev_max")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(F.desc(x_col), F.asc(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    best_ahead = F.greatest(
        F.coalesce(F.max(y_col).over(w_local), F.lit(float("-inf"))),
        F.coalesce(F.col("_prev_max"), F.lit(float("-inf"))),
    )
    return (
        ordered.join(F.broadcast(offsets), "_pid")
        .withColumn("_best_ahead", best_ahead)
        .filter(F.col(y_col) > F.col("_best_ahead"))
        .drop("_pid", "_prev_max", "_best_ahead")
    )


def sequential_pattern_support(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    patterns: dict[str, list[str]],
) -> DataFrame:
    """Support counts for ordered event patterns (the PrefixSpan support
    primitive): for each pattern [a, b, ...] count users whose event
    sequence CONTAINS it as a strictly-time-increasing subsequence (any
    gap allowed — the sequential-containment semantics, not the adjacent-
    transition semantics of `transition_matrix`).

    Containment is decided by the greedy earliest-feasible matcher, an
    exact algorithm by the classic exchange argument (if any embedding
    exists, taking the earliest feasible event per position stays
    feasible). Each user's sorted sequence is folded ONCE per pattern via
    the `aggregate` higher-order function with (position, last_ts) state —
    whole-stage-codegen'd JVM expression, no Python, no joins: ONE shuffle
    on the user key for any number of patterns, then one global
    aggregation. State per user is its own event list — the same per-key
    bound every sequence operator here carries (sessionize, markov).

    Equal-timestamp events cannot extend each other (strictly increasing),
    and tie order among them provably cannot change the verdict, so the
    result is deterministic without a unique tiebreak column.

    Output: pattern, n_users, n_total_users, support (6 dp).
    """
    seq = df.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t"))
            )
        ).alias("seq")
    )

    def matched(pat: list[str]):
        arr = F.array(*[F.lit(s) for s in pat])
        init = F.struct(
            F.lit(0).cast("int").alias("i"),
            F.lit(None).cast("timestamp").alias("lt"),
        )

        def step(s, e):
            can = (
                (s["i"] < F.lit(len(pat)))
                & (e["t"] == F.element_at(arr, s["i"] + F.lit(1)))
                & (
                    (s["i"] == F.lit(0))
                    | F.coalesce(e["ts"] > s["lt"], F.lit(False))
                )
            )
            return F.when(
                can,
                F.struct(
                    (s["i"] + F.lit(1)).alias("i"), e["ts"].alias("lt")
                ),
            ).otherwise(s)

        return (F.aggregate(F.col("seq"), init, step)["i"] == len(pat)).cast(
            "long"
        )

    counts = seq.agg(
        F.count(F.lit(1)).alias("n_total_users"),
        *[
            F.sum(matched(p)).alias(f"m_{j}")
            for j, p in enumerate(patterns.values())
        ],
    )
    names = list(patterns)
    stack = ", ".join(
        f"'{name}', m_{j}" for j, name in enumerate(names)
    )
    return counts.select(
        F.expr(
            f"stack({len(names)}, {stack}) AS (pattern, n_users)"
        ),
        "n_total_users",
    ).select(
        "pattern",
        "n_users",
        "n_total_users",
        F.round(F.col("n_users") / F.col("n_total_users"), 6).alias("support"),
    )
