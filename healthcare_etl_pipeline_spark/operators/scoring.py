"""Model-based document scoring operators: fastText-style linear quality
classifier inference and CCNet-style perplexity bucketing.

The production pipelines these mirror (CCNet, RefinedWeb, FineWeb,
fastText's supervised classifier) run a cheap linear model over hashed
bag-of-words features to keep/drop web documents, then split the corpus
into head/middle/tail quality tiers by language-model perplexity
percentiles. Both are re-expressed here as pure Spark column expressions:

- ``hashed_linear_score`` — inference is a map-only stage: hash each token
  into a fixed feature dimension, look the weight up ARITHMETICALLY (the
  weight table is a deterministic function of the feature index, so no
  join, no broadcast, no Python), mean-pool, sigmoid. At 100 TB this adds
  zero shuffles to a scan. A real trained weight vector would replace the
  arithmetic lookup with ``element_at(lit(weights), j)`` — same shape, one
  broadcast literal — but a deterministic table is used so the DuckDB
  oracle can recompute it exactly.
- ``perplexity_buckets`` — per-doc quality score from the corpus unigram
  LM (operators/corpus.py), then head/middle/tail assignment against
  DISCRETE rank-selected tercile cutoffs (value at floor((n-1)p)+1 — the
  same engine-exact convention as exact_percentiles). The two cutoffs are
  a 2-value broadcast; the bucket label is a map-side comparison. The
  rank selection itself uses a global sort bounded to the SCORE table
  (one row per doc, two narrow columns), not the corpus.

Reference parity: the reference app has no ML scoring surface (its
quality gates are Draft-7 validation, app/services/validation.py); these
operators are part of the training-data extension surface mandated by the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.text import MOD, portable_char_hash, tokens

#: Feature space / weight-table parameters, shared with the SQL oracle.
FEATURE_DIM = 4096
WEIGHT_MULT = 2654435761  # Knuth's multiplicative-hash constant
WEIGHT_MOD = 1_000_003
SCORE_SCALE = 4.0


def _weight_expr(feat):
    """Deterministic weight for feature index ``feat`` in [-0.5, 0.5).

    Integer arithmetic only ((j+1)*mult % mod, both < 2^63), so Spark and
    DuckDB produce bit-identical doubles.
    """
    return ((feat + 1) * F.lit(WEIGHT_MULT) % WEIGHT_MOD) / F.lit(
        float(WEIGHT_MOD)
    ) - F.lit(0.5)


def weight_sql(feat_expr: str) -> str:
    """DuckDB equivalent of ``_weight_expr``."""
    return (
        f"((({feat_expr} + 1) * {WEIGHT_MULT}) % {WEIGHT_MOD})"
        f" / {float(WEIGHT_MOD)} - 0.5"
    )


def feature_index(tok):
    """Token -> feature index: portable md5 hash folded to FEATURE_DIM."""
    return portable_char_hash(tok) % FEATURE_DIM


def feature_index_sql(tok_expr: str) -> str:
    from healthcare_etl_pipeline_spark.operators.text import portable_char_hash_sql

    return f"({portable_char_hash_sql(tok_expr)} % {FEATURE_DIM})"


def hashed_linear_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """fastText-style linear classifier inference over hashed unigrams.

    score = sigmoid(SCORE_SCALE * mean(weight(hash(token) % D))), with an
    empty document scoring sigmoid(0) = 0.5. Entirely expression-level:
    tokenize -> transform to per-token weights -> in-array mean ->
    sigmoid. No shuffle, no UDF, no weight join.
    """
    tk = tokens(F.col(text_col))
    w = F.transform(tk, lambda t: _weight_expr(portable_char_hash(t) % FEATURE_DIM))
    mean_w = F.when(
        F.size(w) > 0,
        F.aggregate(w, F.lit(0.0), lambda acc, x: acc + x) / F.size(w),
    ).otherwise(F.lit(0.0))
    x = F.lit(SCORE_SCALE) * mean_w
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-x))
    return df.select(
        F.col(id_col),
        F.size(tk).cast("long").alias("n_tokens"),
        F.round(score, 6).alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


def perplexity_buckets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style head/middle/tail tiers by corpus-LM quality score.

    Higher mean unigram log-prob = more "natural" text = head. Cutoffs are
    the discrete tercile values of the per-doc score distribution (rank
    floor((n-1)/3)+1 and floor(2(n-1)/3)+1 under (score, id) order), so
    both engines select identical cutoff values with no interpolation.

    Global rank is computed with the repo's two-phase distributed form
    (range-partition the scores table, per-partition ``row_number``, then
    broadcast per-partition row counts as offsets — same idiom as
    ``select_until_budget``, the round-2 advisor fix), NOT a bare
    ``Window.orderBy`` that would drag every row into one partition. The
    two cutoffs broadcast back and the labeling pass is map-only. At
    100 TB the production swap-in is approx_percentile for the cutoffs
    (mergeable sketch, no sort); the discrete form is kept here because
    it is oracle-exact.
    """
    from healthcare_etl_pipeline_spark.operators.cache import bounded_persist
    from healthcare_etl_pipeline_spark.operators.corpus import unigram_logprob

    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    scored = bounded_persist(unigram_logprob(df, id_col, text_col))
    ordered = bounded_persist(
        scored.select(id_col, "avg_token_logprob")
        .repartitionByRange(n_parts, F.asc("avg_token_logprob"), F.asc(id_col))
        .sortWithinPartitions(F.asc("avg_token_logprob"), F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ordered.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_part_n"))
        .withColumn("_off", F.coalesce(F.sum("_part_n").over(w_off), F.lit(0)))
        .withColumn("n", F.sum("_part_n").over(Window.partitionBy()))
        .select("_pid", "_off", "n")
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.asc("avg_token_logprob"), F.asc(id_col)
    )
    ranked = (
        ordered.withColumn("_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("rn", F.col("_local") + F.col("_off"))
    )
    r1 = F.floor((F.col("n") - 1) / 3).cast("long") + 1
    r2 = F.floor((F.col("n") - 1) * 2 / 3).cast("long") + 1
    cuts = ranked.agg(
        F.max(F.when(F.col("rn") == r1, F.col("avg_token_logprob"))).alias("c1"),
        F.max(F.when(F.col("rn") == r2, F.col("avg_token_logprob"))).alias("c2"),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            F.col(id_col),
            "n_tokens",
            "avg_token_logprob",
            F.when(F.col("avg_token_logprob") > F.col("c2"), F.lit("head"))
            .when(F.col("avg_token_logprob") > F.col("c1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
