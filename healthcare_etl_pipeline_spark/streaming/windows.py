"""Structured Streaming operators: windowed aggregation, watermarks,
streaming dedup (SURVEY.md §7.5 — the reference's "HTTP event triggers a
micro-batch" framing generalized to real streams).

The reference has NO streaming operators (SURVEY.md §2.7); this module is
the extension surface. Batch/streaming parity: the same windowing
expressions run in both modes — tests drive them with a bounded file stream
(``availableNow`` trigger + memory sink) and cross-check against the batch
plan, which the DuckDB oracle validates in turn.

Scale notes:
- Watermarks bound state: without one, a streaming agg keeps every window
  forever. ``delay`` should exceed the real pipeline's late-data tail.
- The watermark computed from a batch's max event time takes effect ONE
  TRIGGER LATER (measured on this engine — see stream_late_data_drop):
  rows arriving in the very next micro-batch are NOT yet filtered
  against the previous batch's event times, and a late row into a
  never-seen window is aggregated, emitted, and evicted rather than
  dropped. Contracts about late-data dropping need at least one buffer
  batch between the watermark-advancing data and the late data.
- State lives in the state store keyed by (window, grouping keys) — group
  cardinality, not event rate, sizes executor state.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# serializes the conf-set → start() → conf-restore window in
# run_stream_to_memory (see its docstring for the concurrency contract)
_START_LOCK = threading.Lock()

# RocksDB-backed state store (bundled with Spark since 3.2): state lives
# in native memory + local SST files instead of JVM-heap hash maps, so
# stateful queries stay heap-bounded at 100 TB key cardinalities where
# the default HDFSBackedStateStoreProvider holds every (key, value) pair
# as on-heap objects (measured: tools/state_store_bench.py — heap grows
# linearly with keys under the default provider, flat under RocksDB).
# The conf is read from the session when a query STARTS and pinned into
# its checkpoint lifetime, so it composes with run_stream_to_memory's
# capture-at-start pattern below.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window count+sum. Works identically on batch & stream frames."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_size), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            *group_cols,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_size: str = "2 hours",
    slide: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding-window counts: each event lands in window_size/slide windows."""
    return (
        events.groupBy(F.window(F.col(ts_col), window_size, slide), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("timestamp_ntz").alias("window_start"), *group_cols, "n")
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Native session windows (gap-based); batch & streaming."""
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *group_cols,
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    *,
    output_mode: str = "complete",
    name: str | None = None,
    state_store_provider: str | None = None,
) -> DataFrame:
    """Drive a bounded streaming query to completion into a memory sink.

    availableNow processes everything currently available then stops —
    the deterministic way to test streaming plans on file sources.

    Stateful streaming allocates one state store per shuffle partition and
    AQE cannot coalesce them (disabled for stateful workloads), so the
    session's CPU-sized partition count means 32 stores' worth of per-batch
    overhead on kilobyte-scale state. Streams started here run with a
    smaller stateful partition count (the conf is captured when the query
    STARTS — StreamExecution clones the session at start(), pinning the
    value for the query's lifetime — then restored so batch queries are
    unaffected). On a real cluster size this to state volume, not cores.

    Concurrency contract (advisor finding, round 2): the set/start/restore
    mutates a SESSION-global conf, so a batch query planned concurrently on
    another thread of the SAME session would silently plan with 8 shuffle
    partitions during the window. ``_START_LOCK`` serializes stream starts
    from this module and keeps the mutation window to the ``start()`` call
    itself; callers running multi-threaded batch planning against the same
    session during a stream start should pass a dedicated
    ``spark.newSession()`` clone instead.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    with _START_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        prev_provider = spark.conf.get(_PROVIDER_CONF, None)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        if state_store_provider:
            # pinned at start() like the partition count: pass
            # ROCKSDB_PROVIDER for heap-bounded state at scale
            spark.conf.set(_PROVIDER_CONF, state_store_provider)
        try:
            q = (
                stream_df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            if state_store_provider:
                if prev_provider is None:
                    spark.conf.unset(_PROVIDER_CONF)
                else:
                    spark.conf.set(_PROVIDER_CONF, prev_provider)
    q.awaitTermination()
    return spark.table(name)


def streaming_events(
    spark: SparkSession, sf_dir: str, *, watermark: str | None = "1 hour"
) -> DataFrame:
    """File-source stream over the events table (schema pinned, no inference).

    Testdata vintages differ on the physical ts encoding: INT64
    TIMESTAMP(NANOS) files (which Spark rejects without the legacy conf) are
    read as raw nanos and rebuilt at microsecond precision; micros files are
    read natively. Watermarks require TIMESTAMP (not NTZ) — with the session
    pinned to UTC the wall-clock values are identical either way.
    """
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.catalog import events_ts_is_nanos, table_path

    nanos = events_ts_is_nanos(sf_dir)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # nanos since epoch in legacy files, plain timestamp otherwise
            T.StructField("ts", T.LongType() if nanos else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # FileStreamSource needs a directory; point it at the sf dir and glob the
    # single events parquet file.
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return stream


def stream_dedup(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",), within_watermark: bool = True
) -> DataFrame:
    """Streaming exactly-once-per-key dedup.

    ``dropDuplicatesWithinWatermark`` bounds dedup state by the watermark
    delay — at scale, unbounded dropDuplicates state grows forever; the
    watermark variant is the only deployable form.
    """
    if within_watermark and events.isStreaming:
        return events.dropDuplicatesWithinWatermark(list(key_cols))
    return events.dropDuplicates(list(key_cols))
