"""Shared helpers for the query library."""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from healthcare_etl_pipeline_spark.catalog import load_table

_SCRATCH_DIRS: set[str] = set()


def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_scratch)


def scratch_dir(name: str, sf_dir: str) -> str:
    """A per-(query, sf_dir) scratch directory for queries that
    demonstrate WRITE-path operators (transactional warehouses, staged
    layouts): wiped clean on allocation so repeated invocations start
    fresh, and removed at interpreter exit so no state outlives the
    session. Keeps side-effectful demo queries from accumulating /tmp
    or warehouse leftovers."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"{name}_{tag}")
    shutil.rmtree(d, ignore_errors=True)
    _SCRATCH_DIRS.add(d)
    return d


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (lazy parquet scan).

    Pins the session timezone to UTC first: query results must not depend on
    whichever session the driver hands us (oracle comparisons assume UTC).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Widen a narrow scan to the cluster's parallelism before CPU-heavy
    per-row expressions (hash folds, minhash, pandas UDFs).

    A single small parquet file arrives as ONE input split, serializing the
    expensive expression on one core. The repartition is gated: when the
    scan already has >= defaultParallelism partitions (any real multi-file
    table, so any at-scale deployment), this is a no-op — no shuffle is
    added at 100 TB; locally it costs one tiny shuffle of the raw rows and
    buys cores× speedup on the compute stage.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def td(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``t`` + ``spread``: the loader for compute-bound queries."""
    return spread(t(spark, sf_dir, name), spark)
