"""Streaming operator tests: windowed aggregation parity batch vs stream."""

from healthcare_etl_pipeline_spark.catalog import load_table
from healthcare_etl_pipeline_spark.streaming.windows import (
    run_stream_to_memory,
    session_windows,
    stream_dedup,
    streaming_events,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    stream_out = run_stream_to_memory(
        spark, tumbling_counts(streaming_events(spark, SF)), output_mode="complete"
    )
    batch_out = tumbling_counts(load_table(spark, SF, "events"))
    s = {(str(r.window_start), r.event_type): (r.n, r.total_value) for r in stream_out.collect()}
    b = {(str(r.window_start), r.event_type): (r.n, r.total_value) for r in batch_out.collect()}
    assert s == b
    assert len(s) > 0


def test_stream_dedup_unique_events(spark):
    stream = streaming_events(spark, SF)
    out = run_stream_to_memory(
        spark, stream_dedup(stream).select("event_id"), output_mode="append"
    )
    n = out.count()
    assert n == load_table(spark, SF, "events").select("event_id").distinct().count()


def test_session_window_spans(spark):
    events = load_table(spark, SF, "events")
    out = session_windows(events)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        # session end = last event + gap → end > start always
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_stateful_user_totals_matches_batch(spark):
    """applyInPandasWithState final state == batch groupBy on bounded input."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.queries.registry import get
    from healthcare_etl_pipeline_spark.queries.helpers import t

    sf = "/root/testdata/sf0.001"
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in get("stream_stateful_user_totals").fn(spark, sf).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_streaming_patient_ingest_foreachbatch(spark, warehouse, tmp_path):
    """JSONL patient files → streaming 5-stage pipeline → warehouse tables."""
    import json

    from healthcare_etl_pipeline_spark.streaming.ingest_stream import (
        patient_record_stream,
        streaming_patient_ingest,
    )
    from tests.conftest import make_patient

    src = tmp_path / "incoming"
    src.mkdir()
    batch = [
        make_patient(),
        make_patient(mrn="MRN-002", name="John Roe", consent={"data_sharing": False}),
        make_patient(mrn="MRN-003", name=None),  # invalid
        make_patient(mrn="MRN-004", name="Ana Diaz"),
    ]
    (src / "batch1.jsonl").write_text("\n".join(json.dumps(r) for r in batch))

    stream = patient_record_stream(spark, str(src))
    q = streaming_patient_ingest(
        stream, warehouse, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    assert warehouse.read("patients").count() == 2  # valid AND consented only
    assert warehouse.read("audit_log").count() == 2
    actors = {r.actor for r in warehouse.read("audit_log").collect()}
    assert actors == {"stream:batch=0"}

    # redelivery idempotence: a second drain over the same files must not
    # duplicate patients (mrn anti-join routes them as conflicts)
    q2 = streaming_patient_ingest(
        stream, warehouse, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination(120)
    assert warehouse.read("patients").count() == 2
