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
