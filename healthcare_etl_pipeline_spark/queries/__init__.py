"""Registered query library — see registry.py."""

from healthcare_etl_pipeline_spark.queries.registry import all_queries, get, query

__all__ = ["all_queries", "get", "query"]
