"""Warehouse: the 5 reference tables as partitioned Parquet directories.

Re-expresses the reference's PostgreSQL schema (reference:
app/models/patient.py — patients :34-52, consent_records :58-76,
clinical_records :82-99, audit_log :105-116, pipeline_runs :122-136) and the
DDL bootstrap (app/main.py:30-32 `create_all`).

Physical design for 100 TB (SURVEY.md §1.4):
- `clinical_records` partitioned by `resource_type` — replaces the reference's
  ix_clinical_resource_type index (patient.py:97) with partition pruning.
- `audit_log` partitioned by `dt = date(timestamp)` — replaces
  ix_audit_timestamp (patient.py:116); appends land in today's partition.
- `patients` unpartitioned (point lookups by id/mrn ride parquet min/max +
  dictionary filters); mrn uniqueness is enforced by the ingest anti-join
  (operators/ingest.py), not the store.
- run counts are LongType, deliberately fixing the reference's String(16)
  oddity (patient.py:133-134).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PATIENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("encrypted_name", T.StringType(), False),
        T.StructField("encrypted_dob", T.StringType(), True),
        T.StructField("encrypted_ssn", T.StringType(), True),
        T.StructField("mrn", T.StringType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

CONSENT_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("consent_type", T.StringType(), False),
        T.StructField("granted", T.BooleanType(), False),
        T.StructField("granted_at", T.TimestampType(), True),
        T.StructField("revoked_at", T.TimestampType(), True),
        T.StructField("source_document", T.StringType(), True),
    ]
)

CLINICAL_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("fhir_resource", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("recorded_at", T.TimestampType(), False),
    ]
)

AUDIT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("actor", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("dt", T.DateType(), False),  # partition column
    ]
)

PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("pipeline_name", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("input_record_count", T.LongType(), True),
        T.StructField("output_record_count", T.LongType(), True),
        T.StructField("errors", T.StringType(), True),
        T.StructField("dag_definition", T.StringType(), True),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "patients": PATIENTS_SCHEMA,
    "consent_records": CONSENT_RECORDS_SCHEMA,
    "clinical_records": CLINICAL_RECORDS_SCHEMA,
    "audit_log": AUDIT_LOG_SCHEMA,
    "pipeline_runs": PIPELINE_RUNS_SCHEMA,
}

PARTITION_COLUMNS: dict[str, list[str]] = {
    "patients": [],
    "consent_records": [],
    "clinical_records": ["resource_type"],
    "audit_log": ["dt"],
    "pipeline_runs": [],
}

CONSENT_TYPES = ("data_sharing", "research", "treatment")
RUN_STATUSES = ("pending", "running", "completed", "failed")


class Warehouse:
    """A directory-backed warehouse of the 5 reference tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        if table not in TABLE_SCHEMAS:
            raise KeyError(f"unknown warehouse table {table!r}")
        return os.path.join(self.root, table)

    def create_all(self) -> None:
        """DDL bootstrap (reference app/main.py:30-32): materialize empty tables."""
        for table, schema in TABLE_SCHEMAS.items():
            if not os.path.exists(self.path(table)):
                empty = self.spark.createDataFrame([], schema)
                self._write(empty, table, mode="overwrite")

    def read(self, table: str) -> DataFrame:
        return self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        """Append-only write; columns are aligned to the declared schema."""
        schema = TABLE_SCHEMAS[table]
        aligned = df.select(
            *[df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        self._write(aligned, table, mode="append")

    def _write(self, df: DataFrame, table: str, mode: str) -> None:
        writer = df.write.mode(mode)
        parts = PARTITION_COLUMNS[table]
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.path(table))

    def compact(
        self, table: str, *, target_file_mb: int = 128, sort_by: str | None = None
    ) -> int:
        """Rewrite a table into size-targeted files (small-files maintenance).

        Streaming/micro-batch appends leave one small file per batch per
        partition; at scale the file count, not the byte count, dominates
        scan planning and open() overhead. Compaction reads the table,
        coalesces to ceil(bytes / target) files, optionally sorts within
        partitions (tighter parquet min/max stats → better row-group
        pruning on ``sort_by`` predicates), and atomically swaps via a
        staged directory + rename. Returns the new file count.
        """
        import math
        import pathlib
        import shutil

        path = self.path(table)
        current = self.read(table)
        n_bytes = sum(
            f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet")
        )
        n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
        compacted = current.repartition(n_files)
        if sort_by:
            compacted = compacted.sortWithinPartitions(sort_by)
        staging = path + ".compact.tmp"
        writer = compacted.write.mode("overwrite")
        parts = PARTITION_COLUMNS[table]
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(staging)
        old = path + ".compact.old"
        shutil.move(path, old)
        shutil.move(staging, path)
        shutil.rmtree(old)
        return n_files
