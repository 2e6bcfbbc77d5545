"""Privacy operators: re-identification risk audit + de-identification.

The reference is a PHI pipeline (encrypt-at-rest, consent gates, PHI-strip
— app/etl/transform.py, app/api/routes.py); these operators add the two
standard privacy jobs run over such stores before data leaves them:

- ``k_anonymity``: re-identification risk audit — group by the
  quasi-identifier combination and measure equivalence-class sizes
  (k-anonymity) and sensitive-value diversity (distinct-l-diversity).
  A class smaller than k, or with a single sensitive value, is a
  linkage/homogeneity risk.
- ``safe_harbor_deidentify``: HIPAA Safe-Harbor-style generalization:
  direct identifiers suppressed (ssn) or pseudonymized (mrn → keyed
  digest), dates generalized to year, and ages ≥ 90 collapsed into one
  top category (the Safe Harbor rule for the long tail the year alone
  would expose).

Both are pure relational shapes — one map-side-combined groupBy for the
audit, a projection for the de-identification — so they run at any scale
and carry full value oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Per equivalence class: size, k-violation flag, and (when a sensitive
    column is given) distinct-l diversity + homogeneity flag."""
    aggs = [
        F.count(F.lit(1)).alias("class_size"),
        (F.count(F.lit(1)) < k).alias("k_violation"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.countDistinct(sensitive_col).alias("l_diversity"),
            (F.countDistinct(sensitive_col) <= 1).alias("homogeneous"),
        ]
    return df.groupBy(*quasi_cols).agg(*aggs)


def safe_harbor_deidentify(
    df: DataFrame,
    *,
    mrn_col: str = "mrn",
    ssn_col: str = "ssn",
    birth_col: str = "birthDate",
    as_of_year: int = 2026,
    keep: tuple[str, ...] = ("gender",),
    salt: str = "deid",
) -> DataFrame:
    """Safe-Harbor-style projection: pseudonym, year-generalized birth date,
    age with the >= 90 top-code, suppressed ssn, pass-through ``keep``."""
    birth_year = F.substring(F.col(birth_col), 1, 4).cast("int")
    age = F.lit(as_of_year) - birth_year
    return df.select(
        F.md5(F.concat(F.lit(salt + ":"), F.col(mrn_col))).alias("pseudonym"),
        birth_year.alias("birth_year"),
        F.when(age >= 90, F.lit("90+"))
        .otherwise(age.cast("string"))
        .alias("age_band"),
        F.lit(None).cast("string").alias(ssn_col),  # suppressed, column kept
        *[F.col(c) for c in keep],
    )


def generalize(col: Column, *, width: int) -> Column:
    """Numeric generalization helper: value → its width-sized band start."""
    return (F.floor(col / width) * width).cast("long")


def laplace_noise(scale: float, seed: int | None = None) -> Column:
    """Laplace(0, scale) sample via inverse-CDF from uniform(−0.5, 0.5):
    ``−scale · sign(u) · ln(1 − 2|u|)``. Real randomness (``rand()``), one
    sample per row, fully distributed."""
    u = (F.rand(seed) if seed is not None else F.rand()) - F.lit(0.5)
    return -F.lit(float(scale)) * F.signum(u) * F.log(F.lit(1.0) - 2.0 * F.abs(u))


def dp_counts(
    df: DataFrame,
    group_cols: list[str],
    *,
    epsilon: float = 0.5,
    sensitivity: float = 1.0,
    seed: int | None = None,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism.

    Adds Laplace(sensitivity/ε) noise to each group's count — the textbook
    mechanism for releasing counting queries over sensitive populations
    (each individual contributes to at most ``sensitivity`` groups).
    Output: group cols, ``n_exact``, ``n_noisy`` (rounded, floored at 0).

    PRODUCTION CONTRACT: release ``n_noisy`` ONLY — ``n_exact`` is emitted
    so callers/tests can measure the error, and publishing it would void
    the DP guarantee. The noise is genuinely random (non-deterministic
    per run); the registered query therefore value-checks a tail-bound
    accuracy contract (|noise| ≤ 10·scale, miss probability e^−10 per
    group) rather than the noisy values themselves.
    """
    scale = float(sensitivity) / float(epsilon)
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_exact"))
    noisy = F.col("n_exact") + laplace_noise(scale, seed)
    return counts.withColumn(
        "n_noisy", F.greatest(F.round(noisy), F.lit(0.0)).cast("long")
    )
