"""Training-data export: deterministically sharded JSONL with a manifest.

The last step of a data pipeline — materializing the prepared corpus for a
training loader — has its own correctness surface: shard placement must be
reproducible (loaders key resume/sharding off it), content must survive
JSON escaping, and the manifest must account for every row. The export is
expressed so all three are checkable:

- shard = portable hash-bucket of the id (operators/sampling.py) — a pure
  projection, recomputable by any engine, stable under repartitioning;
- one Spark write, ``partitionBy(shard)``, compressed JSONL per shard —
  at scale each shard is written by the tasks that own its rows, no
  single-writer funnel, and ``maxRecordsPerFile`` caps file sizes;
- a driver-written ``_MANIFEST.json`` with global + per-shard counts,
  written AFTER the data (readers treat it as the commit point, same
  convention as the transactional warehouse's markers).

The registered query (export_jsonl_roundtrip) writes, reads BACK through
Spark's JSON reader, and value-checks ids, shard assignment, and an md5 of
the text against the oracle's recomputation — a corrupted escape or a
misplaced row flips the hash.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.sampling import hash_bucket

MANIFEST_NAME = "_MANIFEST.json"


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    compression: str = "gzip",
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Write ``df`` as sharded JSONL; returns the manifest dict."""
    sharded = df.withColumn("shard", hash_bucket(id_col) % n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .option("maxRecordsPerFile", max_records_per_file)
        .json(out_dir)
    )
    per_shard = {
        int(r["shard"]): int(r["n"])
        for r in sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "format": "jsonl",
        "compression": compression,
        "n_shards": n_shards,
        "row_count": sum(per_shard.values()),
        "shard_counts": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    tmp = os.path.join(out_dir, f".{MANIFEST_NAME}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST_NAME), encoding="utf-8") as fh:
        return json.load(fh)


def read_jsonl_shards(spark, out_dir: str, schema) -> DataFrame:
    """Read an export back (schema pinned — no inference pass over 100 TB).
    The hive-style ``shard=N`` directories surface as a ``shard`` column."""
    return spark.read.schema(schema).option("basePath", out_dir).json(
        os.path.join(out_dir, "shard=*")
    )
