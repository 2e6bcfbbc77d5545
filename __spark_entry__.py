"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``healthcare_etl_pipeline_spark/``; queries are
registered in ``healthcare_etl_pipeline_spark/queries/`` (one entry per
operator from SURVEY.md §2 + the north-star LLM-pipeline surface).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_etl_pipeline_spark.queries import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "patients_ingest_valid"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the full 5-stage ingest pipeline
    (validate split → consent gate → encrypt transform → decrypt roundtrip)
    over patient records synthesized from the customer table."""
    spec = all_queries()[FLAGSHIP]
    return spec.fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — since round 3
    none are rows-only: approximate/random operators are registered as
    value-checkable accuracy contracts (exact results + tolerance/recall
    booleans), and multimodal decodes against closed-form payloads."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
