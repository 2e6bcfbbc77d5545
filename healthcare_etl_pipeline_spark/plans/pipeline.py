"""The patient ingestion pipeline: extract → validate → check_consent →
transform → load, composed as DataFrame stages under the DAG runner.

Re-expresses reference app/etl/pipeline.py:135-143 (factory wiring the fixed
5-stage chain) and the /ingest handler's persistence+run-metadata block
(app/api/routes.py:74-164), Spark-first:

- Stages declare lazy DataFrame transformations; per-stage counts come from
  one action per routed branch (batch ingest is bounded — reference caps at
  1000 records/batch — so stage counts are cheap; the heavy lifting is the
  single cached materialization in the load stage).
- The run summary and ``pipeline_runs`` row reproduce the reference's
  observable output: per-task status/duration, record_counts harvested from
  ``*_count`` keys (routes.py:151-155), input/output counts, DAG snapshot.
"""

from __future__ import annotations

import json
import threading
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators.consent import consent_gate
from healthcare_etl_pipeline_spark.operators.ingest import load_patients
from healthcare_etl_pipeline_spark.operators.transform import transform_patients
from healthcare_etl_pipeline_spark.operators.validation import (
    PATIENT_RULES,
    validate_split,
)
from healthcare_etl_pipeline_spark.plans.dag import DAG
from healthcare_etl_pipeline_spark.sources.warehouse import Warehouse

RAW_PATIENT_SCHEMA = T.StructType(
    [
        T.StructField("resourceType", T.StringType()),
        T.StructField("mrn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("birthDate", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("ssn", T.StringType()),
        T.StructField("consent", T.MapType(T.StringType(), T.BooleanType())),
    ]
)

MAX_BATCH_SIZE = 1000  # reference app/schemas/api.py:28

# Serializes the OCC validate+commit critical section for concurrent
# ingests in this driver (the API's threading server shares one session).
_OCC_COMMIT_LOCK = threading.Lock()


def records_to_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Batch source S1/S2: typed DataFrame from raw record dicts."""
    if not 1 <= len(records) <= MAX_BATCH_SIZE:
        raise ValueError(
            f"batch size must be between 1 and {MAX_BATCH_SIZE}, got {len(records)}"
        )
    normalized = [
        {f.name: r.get(f.name) for f in RAW_PATIENT_SCHEMA.fields} for r in records
    ]
    return spark.createDataFrame(normalized, RAW_PATIENT_SCHEMA)


def build_patient_ingestion_pipeline(
    warehouse: Warehouse | None = None,
    *,
    actor: str = "pipeline",
    strict: bool = False,
    txn=None,
) -> DAG:
    """The fixed 5-stage chain (reference pipeline.py:135-143).

    Context keys mirror the reference stages: raw_df → validated/invalid →
    consented/blocked → transformed → load_count.
    """
    dag = DAG("patient_ingestion")

    def extract(ctx: dict[str, Any]) -> dict[str, Any]:
        df: DataFrame = ctx["raw_df"]
        return {"extracted_df": df, "extract_count": df.count()}

    def validate(ctx: dict[str, Any]) -> dict[str, Any]:
        valid, invalid = validate_split(ctx["extracted_df"], PATIENT_RULES)
        return {
            "valid_df": valid,
            "invalid_df": invalid,
            "valid_count": valid.count(),
            "invalid_count": invalid.count(),
        }

    def check_consent(ctx: dict[str, Any]) -> dict[str, Any]:
        consented, blocked = consent_gate(
            ctx["valid_df"], consent_col=F.col("consent")["data_sharing"]
        )
        return {
            "consented_df": consented,
            "blocked_df": blocked,
            "consented_count": consented.count(),
            "blocked_count": blocked.count(),
        }

    def transform(ctx: dict[str, Any]) -> dict[str, Any]:
        transformed = transform_patients(ctx["consented_df"])
        return {"transformed_df": transformed, "transform_count": transformed.count()}

    def load(ctx: dict[str, Any]) -> dict[str, Any]:
        if warehouse is None:  # dry-run mode for tests without a warehouse dir
            return {"load_count": ctx["transformed_df"].count()}
        return load_patients(
            warehouse, ctx["transformed_df"], actor=actor, strict=strict, txn=txn
        )

    dag.add_task("extract", extract)
    dag.add_task("validate", validate, depends_on=["extract"])
    dag.add_task("check_consent", check_consent, depends_on=["validate"])
    dag.add_task("transform", transform, depends_on=["check_consent"])
    dag.add_task("load", load, depends_on=["transform"])
    return dag


def harvest_record_counts(summary: dict[str, Any]) -> dict[str, int]:
    """Collect every ``*_count`` context key (reference routes.py:151-155)."""
    return {
        k: v for k, v in summary.get("context", {}).items() if k.endswith("_count")
    }


def write_run_record(
    warehouse: Warehouse, dag: DAG, summary: dict[str, Any], txn=None
) -> None:
    """One pipeline_runs row per execution (reference routes.py:137-147)."""
    counts = harvest_record_counts(summary)
    errors = {
        name: t["error"]
        for name, t in summary["tasks"].items()
        if t.get("error")
    }
    run_schema = T.StructType(
        [
            T.StructField("pipeline_name", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("started_at", T.TimestampType()),
            T.StructField("completed_at", T.TimestampType()),
            T.StructField("input_record_count", T.LongType()),
            T.StructField("output_record_count", T.LongType()),
            T.StructField("errors", T.StringType()),
            T.StructField("dag_definition", T.StringType()),
        ]
    )
    row = warehouse.spark.createDataFrame(
        [
            {
                "pipeline_name": dag.name,
                "status": "completed" if summary["status"] == "success" else "failed",
                # real run boundaries from dag.run (reference routes.py:140-141),
                # not a double write-time current_timestamp()
                "started_at": summary["started_at"],
                "completed_at": summary["completed_at"],
                "input_record_count": counts.get("extract_count"),
                "output_record_count": counts.get("load_count"),
                "errors": json.dumps(errors) if errors else None,
                "dag_definition": json.dumps(dag.to_dict()),
            }
        ],
        run_schema,
    ).select(
        F.expr("uuid()").alias("id"),
        "pipeline_name",
        "status",
        "started_at",
        "completed_at",
        "input_record_count",
        "output_record_count",
        "errors",
        "dag_definition",
    )
    if txn is not None:
        txn.stage(row, "pipeline_runs")
    else:
        warehouse.append(row, "pipeline_runs")


def ingest_batch(
    spark: SparkSession,
    records: list[dict],
    warehouse: Warehouse | None = None,
    *,
    actor: str = "api",
    strict: bool = False,
) -> dict[str, Any]:
    """End-to-end ingest of one batch (the reference POST /ingest path)."""
    dag = build_patient_ingestion_pipeline(warehouse, actor=actor, strict=strict)
    summary = dag.run({"raw_df": records_to_df(spark, records)})
    summary["record_counts"] = harvest_record_counts(summary)
    if warehouse is not None:
        write_run_record(warehouse, dag, summary)
    return summary


def ingest_batch_atomic(
    spark: SparkSession,
    records: list[dict],
    warehouse,
    *,
    actor: str = "api",
    strict: bool = False,
    batch_id: str | None = None,
) -> dict[str, Any]:
    """Single-commit ingest (reference app/api/routes.py:148 parity): the
    patients, consent_records, clinical_records, audit_log AND pipeline_runs
    rows of one batch become visible ATOMICALLY or not at all.

    Requires a ``TransactionalWarehouse``. All five sinks stage under one
    run_id; the commit-marker rename is the transaction boundary, so a crash
    anywhere mid-ingest leaves no partial multi-table state — closing the
    round-2 design's documented deviation (SURVEY §7.6). Pass a stable
    ``batch_id`` for exactly-once re-runs: an already-committed batch is
    skipped, a crashed half-staged attempt is wiped and restaged.

    Concurrent ingests (the API layer serves one shared session across
    request threads) run optimistic concurrency control on the mrn
    uniqueness invariant: each attempt records the patients snapshot it
    validated against, and the validate+commit critical section is
    serialized (process-wide lock). If another batch committed an
    overlapping mrn meanwhile, this attempt ABORTS — publishing nothing —
    and re-runs the pipeline, whose anti-join now sees the winner's rows
    and routes the duplicate to the conflict side-output (or raises, in
    strict mode) instead of silently double-inserting. Cross-process
    writers get the same detection on a best-effort basis (the lock is
    per-driver); strict multi-driver serialization belongs to a shared
    metastore, as with any file-backed table format.
    """
    for _ in range(_OCC_MAX_RETRIES):
        txn = warehouse.begin(batch_id)
        if warehouse.is_committed(txn.run_id):
            return {
                "status": "skipped",
                "reason": "batch_id already committed",
                "txn": {"run_id": txn.run_id, "committed": True},
            }
        snapshot = set(warehouse.committed_runs_for("patients"))
        dag = build_patient_ingestion_pipeline(
            warehouse, actor=actor, strict=strict, txn=txn
        )
        try:
            summary = dag.run({"raw_df": records_to_df(spark, records)})
            summary["record_counts"] = harvest_record_counts(summary)
            if summary["status"] != "success":
                txn.abort()  # failed run: stage nothing, surface the summary
                summary["txn"] = {"run_id": txn.run_id, "committed": False}
                return summary
            write_run_record(warehouse, dag, summary, txn=txn)
            with _OCC_COMMIT_LOCK:
                if _mrn_conflict_since(spark, warehouse, txn, snapshot):
                    txn.abort()
                    continue  # retry: the anti-join will route the dup away
                committed = txn.commit()
            summary["txn"] = {"run_id": txn.run_id, "committed": committed}
            return summary
        except Exception:
            txn.abort()
            raise
    raise RuntimeError(
        f"ingest lost the mrn-conflict race {_OCC_MAX_RETRIES} times in a row"
    )


_OCC_MAX_RETRIES = 4


def _mrn_conflict_since(
    spark: SparkSession, warehouse, txn, snapshot: set
) -> bool:
    """True when a patients run committed AFTER ``snapshot`` shares an mrn
    with this transaction's staged patients — the cross-writer duplicate
    the in-pipeline anti-join (which only sees COMMITTED rows at stage
    time) cannot catch. Both sides are tiny targeted reads: the staged
    batch (≤1000 rows by contract) and only the concurrently-committed
    run dirs."""
    import os

    new_runs = [
        r
        for r in warehouse.committed_runs_for("patients")
        if r not in snapshot
    ]
    if not new_runs or "patients" not in txn.staged_tables:
        return False
    staged_dir = txn._stage_dir("patients")
    if not os.path.isdir(staged_dir):
        return False
    staged_mrns = spark.read.parquet(staged_dir).select("mrn")
    concurrent_mrns = spark.read.parquet(
        *[warehouse.run_dir("patients", r) for r in new_runs]
    ).select("mrn")
    return bool(
        staged_mrns.join(concurrent_mrns, "mrn", "left_semi").take(1)
    )


def ingest_batch_observed(
    spark: SparkSession,
    records: list[dict],
    warehouse: Warehouse,
    *,
    actor: str = "api",
    strict: bool = False,
) -> dict[str, Any]:
    """Single-pass ingest: identical results to ``ingest_batch``, but every
    stage count comes from ONE ``observe()`` on the load materialization
    instead of one action per stage (SURVEY P9/A1 — metrics without extra
    passes).

    ``ingest_batch`` runs ~8 Spark actions per batch (a count per routed
    branch); fine at the reference's ≤1000-row batches, wasteful when the
    same pipeline ingests a 100 TB backfill. Here the full batch is scanned
    once: validation + consent flags are annotated, observed aggregates
    harvest all five stage counts during the load checkpoint, and only the
    pass-through rows run the encrypt UDF.

    Trade-off (documented): per-stage wall-clock durations collapse into the
    single load action, so the run record carries counts but not per-stage
    timings — the price of not re-executing the plan per stage.
    """
    from pyspark.sql import Observation

    from healthcare_etl_pipeline_spark.operators.ingest import load_patients

    raw = records_to_df(spark, records)
    from healthcare_etl_pipeline_spark.operators.validation import (
        PATIENT_RULES,
        compile_rules,
    )

    is_valid = F.size(compile_rules(PATIENT_RULES)) == 0
    is_consented = F.col("consent")["data_sharing"].eqNullSafe(F.lit(True))
    annotated = raw.withColumns(
        {"__valid": is_valid, "__consented": is_consented}
    )

    obs = Observation("ingest")
    observed = annotated.observe(
        obs,
        F.count(F.lit(1)).alias("extract_count"),
        F.count_if(F.col("__valid")).alias("valid_count"),
        F.count_if(~F.col("__valid")).alias("invalid_count"),
        F.count_if(F.col("__valid") & F.col("__consented")).alias("consented_count"),
        F.count_if(F.col("__valid") & ~F.col("__consented")).alias("blocked_count"),
    )
    passing = (
        observed.filter(F.col("__valid") & F.col("__consented"))
        .drop("__valid", "__consented")
    )
    transformed = transform_patients(passing)
    load_result = load_patients(warehouse, transformed, actor=actor, strict=strict)
    counts = {k: int(v) for k, v in obs.get.items()}
    counts["transform_count"] = counts["consented_count"]
    counts.update(load_result)
    summary = {
        "pipeline": "patient_ingestion_observed",
        "status": "success",
        "record_counts": counts,
    }
    return summary
