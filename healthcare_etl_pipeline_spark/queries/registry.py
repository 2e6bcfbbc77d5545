"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers a named query here:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent DuckDB oracle SQL string over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``.

Contract requirements (see /root/repo/__spark_entry__.py):
- Column names must match exactly between Spark result and oracle SQL —
  alias every computed column on both sides.
- The driver's value-hash is order-insensitive but value-sensitive: float
  aggregates are rounded to a fixed number of decimals on BOTH sides so
  summation-order differences between engines cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]


_LOADED = False


def _load_all() -> None:
    """Import every query module so decorators run."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid import cycles (modules import `query` above).
    from healthcare_etl_pipeline_spark.queries import (  # noqa: F401
        analytics,
        analytics_extended,
        etl_parity,
        fingerprint_ops,
        join_ops,
        llm_ops,
        maintenance,
        mining,
        multimodal_ops,
        streaming_ops,
        textlm,
        tpch,
        tpch_extended,
    )

    _LOADED = True
