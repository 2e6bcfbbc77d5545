"""Shared helpers for the query library."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from healthcare_etl_pipeline_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (lazy parquet scan).

    Pins the session timezone to UTC first: query results must not depend on
    whichever session the driver hands us (oracle comparisons assume UTC).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)
