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


def test_stateful_sessions_event_time_timeout(spark, tmp_path):
    """EventTimeTimeout retirement: a key with NO follow-up event must still
    emit its open session once the watermark (advanced by OTHER keys'
    events in later micro-batches) passes its session_end."""
    import pandas as pd
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.streaming.stateful import (
        stateful_session_windows,
    )
    from healthcare_etl_pipeline_spark.streaming.windows import run_stream_to_memory

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    ts = lambda s: pd.Timestamp(s).to_pydatetime()
    # batch 1: user 1's only events (a 2-event session)
    spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1), (2, ts("2024-01-01 10:10:00"), 1)],
        schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    # batch 2: user 2 far ahead — advances the watermark past user 1's
    # session_end (10:40) once processed
    spark.createDataFrame(
        [(3, ts("2024-01-01 14:00:00"), 2)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b2"))
    # batch 3: user 3 even later — the batch in which user 1's timeout fires
    spark.createDataFrame(
        [(4, ts("2024-01-01 18:00:00"), 3)], schema
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b3"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
        .withWatermark("ts", "10 minutes")
    )
    sessions = stateful_session_windows(stream, gap="30 minutes")
    out = run_stream_to_memory(spark, sessions, output_mode="append")
    got = {r.user_id: r for r in out.collect()}
    # user 1 emitted by TIMEOUT (no user-1 event ever closed the session)
    assert 1 in got
    assert got[1].n_events == 2
    assert got[1].session_start == ts("2024-01-01 10:00:00")
    assert got[1].session_end == ts("2024-01-01 10:40:00")
    # user 2's session end (14:30) <= final watermark (17:50) → also retired;
    # user 3's (18:30) > watermark → still open, not emitted
    assert 2 in got
    assert 3 not in got


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
