"""Streaming patient ingest: the 5-stage pipeline as a Structured Streaming
sink via ``foreachBatch``.

The reference's execution model is "an HTTP POST triggers one pipeline run
over its batch" (reference README.md:49 framing, handler
app/api/routes.py:66-164). Structured Streaming generalizes that: a file /
queue source of patient-record JSON, each micro-batch pushed through the
SAME batch operators (validate split → consent gate → transform → load) —
no second implementation of the pipeline, which is the point: batch and
streaming share one code path, so parity holds by construction.

Scale notes:
- ``foreachBatch`` is the right sink here because the load stage fans out
  to four tables; per-row sinks would re-shuffle per table.
- Exactly-once: the file source + checkpointLocation give at-least-once
  re-delivery of micro-batches on restart; the load stage's mrn anti-join
  makes patient inserts idempotent across redelivery (conflicts route to
  the side-output, they don't duplicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from healthcare_etl_pipeline_spark.plans.pipeline import RAW_PATIENT_SCHEMA
from healthcare_etl_pipeline_spark.sources.warehouse import Warehouse


def patient_record_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of patient-record JSON lines (schema pinned)."""
    return spark.readStream.schema(RAW_PATIENT_SCHEMA).json(path)


def streaming_patient_ingest(
    stream: DataFrame,
    warehouse: Warehouse,
    *,
    checkpoint_dir: str,
    actor: str = "stream",
) -> StreamingQuery:
    """Run the batch pipeline operators per micro-batch; bounded by
    ``availableNow`` (callers await termination for a drain-style run, or
    drop the trigger for continuous ingest)."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.consent import consent_gate
    from healthcare_etl_pipeline_spark.operators.ingest import load_patients
    from healthcare_etl_pipeline_spark.operators.transform import transform_patients
    from healthcare_etl_pipeline_spark.operators.validation import (
        PATIENT_RULES,
        validate_split,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        valid, _invalid = validate_split(batch_df, PATIENT_RULES)
        consented, _blocked = consent_gate(
            valid, consent_col=F.col("consent")["data_sharing"]
        )
        transformed = transform_patients(consented)
        load_patients(warehouse, transformed, actor=f"{actor}:batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
