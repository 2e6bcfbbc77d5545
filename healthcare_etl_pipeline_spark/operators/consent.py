"""Consent gate: predicate-routed record split with reasoned side-output.

Re-expresses the reference's check_consent stage (reference:
app/etl/pipeline.py:64-84): records pass only when
``record.consent.data_sharing is True`` — strict identity check, so missing
consent, None, or any non-True value routes the record to the blocked
side-output with ``{mrn, reason}``.

Spark mapping: a null-safe equality filter (``<=> true``) and its negation.
Both branches share the same scan; at scale the filter pushes down to
parquet when consent is a top-level column.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_REASON = "no data_sharing consent"


class ConsentSplit(NamedTuple):
    consented: DataFrame
    blocked: DataFrame  # id column(s) + `reason` string column


def consent_gate(
    df: DataFrame,
    consent_col: str | Column = "consent.data_sharing",
    id_cols: tuple[str, ...] = ("mrn",),
    reason: str = DEFAULT_REASON,
) -> ConsentSplit:
    """Split on a strict boolean-True consent predicate.

    ``<=>`` (null-safe equal) reproduces the reference's ``is True``: null,
    missing and false all block.
    """
    c = F.col(consent_col) if isinstance(consent_col, str) else consent_col
    passed = c.eqNullSafe(F.lit(True))
    consented = df.filter(passed)
    blocked = df.filter(~passed).select(*id_cols, F.lit(reason).alias("reason"))
    return ConsentSplit(consented, blocked)


def gate(df: DataFrame, predicate: Column, id_cols: tuple[str, ...], reason: str) -> ConsentSplit:
    """Generic reasoned gate for arbitrary predicates (null counts as blocked)."""
    passed = predicate.eqNullSafe(F.lit(True))
    return ConsentSplit(
        df.filter(passed),
        df.filter(~passed).select(*id_cols, F.lit(reason).alias("reason")),
    )
