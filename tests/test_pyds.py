"""The warehouse commit log as a Spark Python Data Source (sources/pyds.py):
batch reads fold the live-run set, stream offsets are snapshot seqs, and
Structured Streaming's checkpoint provides exactly-once consumption."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources import pyds
from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)
DDL = "k bigint, v string"


@pytest.fixture
def twh(spark, tmp_path):
    pyds.register(spark)
    wh = TransactionalWarehouse(spark, str(tmp_path / "wh"))
    wh.register_table("tbl", SCHEMA)
    wh.create_all()
    return wh


def _commit(wh, batch, pairs):
    txn = wh.begin(batch)
    txn.stage(wh.spark.createDataFrame(pairs, SCHEMA), "tbl")
    assert txn.commit()


def _load(spark, wh, **opts):
    r = (
        spark.read.format("warehouse_commits")
        .option("root", wh.root)
        .option("table", "tbl")
        .option("schema_ddl", DDL)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _stream_to(spark, wh, out, ckpt, **opts):
    r = (
        spark.readStream.format("warehouse_commits")
        .option("root", wh.root)
        .option("table", "tbl")
        .option("schema_ddl", DDL)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    q = (
        r.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_batch_read_matches_warehouse_read(spark, twh):
    _commit(twh, "b0", [(1, "a"), (2, "b")])
    _commit(twh, "b1", [(3, "c")])
    got = sorted((r.k, r.v) for r in _load(spark, twh).collect())
    want = sorted((r.k, r.v) for r in twh.read("tbl").collect())
    assert got == want == [(1, "a"), (2, "b"), (3, "c")]


def test_batch_read_respects_compaction_fold(spark, twh):
    _commit(twh, "b0", [(1, "a")])
    _commit(twh, "b1", [(2, "b")])
    twh.compact("tbl")
    got = sorted((r.k, r.v) for r in _load(spark, twh).collect())
    assert got == [(1, "a"), (2, "b")]  # compacted run, not doubled


def test_batch_read_branch_option(spark, twh):
    _commit(twh, "b0", [(1, "a")])
    dev = twh.create_branch("dev")
    txn = dev.begin("d0")
    txn.stage(spark.createDataFrame([(9, "z")], SCHEMA), "tbl")
    txn.commit()
    main = sorted(r.k for r in _load(spark, twh).collect())
    branch = sorted(r.k for r in _load(spark, twh, branch="dev").collect())
    assert main == [1] and branch == [1, 9]


def test_stream_exactly_once_across_restarts(spark, twh, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _commit(twh, "b0", [(1, "a"), (2, "b")])
    _stream_to(spark, twh, out, ckpt)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]
    # two more commits; restart from the SAME checkpoint → only the delta
    _commit(twh, "b1", [(3, "c")])
    _commit(twh, "b2", [(4, "d")])
    _stream_to(spark, twh, out, ckpt)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [
        1, 2, 3, 4,
    ]
    # idle restart appends nothing
    _stream_to(spark, twh, out, ckpt)
    assert spark.read.parquet(out).count() == 4


def test_stream_skips_compaction_rewrites(spark, twh, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _commit(twh, "b0", [(1, "a")])
    _stream_to(spark, twh, out, ckpt)
    twh.compact("tbl")  # rewrite commit: no new rows for a consumer
    _commit(twh, "b1", [(2, "b")])
    _stream_to(spark, twh, out, ckpt)
    rows = [r.k for r in spark.read.parquet(out).collect()]
    assert sorted(rows) == [1, 2]  # the compacted copy of k=1 NOT re-emitted


def test_starting_seq_skips_history(spark, twh, tmp_path):
    _commit(twh, "b0", [(1, "a")])
    s0 = twh.snapshots()[-1]["seq"]
    _commit(twh, "b1", [(2, "b")])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stream_to(spark, twh, out, ckpt, starting_seq=str(s0))
    assert [r.k for r in spark.read.parquet(out).collect()] == [2]


def test_builtin_table_needs_no_ddl(spark, twh):
    df = (
        spark.read.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "pipeline_runs")
        .load()
    )
    assert df.count() == 0  # empty but schema resolves from TABLE_SCHEMAS
    assert "pipeline_name" in df.columns


def test_schema_evolution_null_fills_missing_column(spark, twh):
    _commit(twh, "b0", [(1, "a")])
    wide = (
        spark.read.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .option("schema_ddl", "k bigint, v string, extra double")
        .load()
    )
    row = wide.collect()[0]
    assert (row.k, row.v, row.extra) == (1, "a", None)


def _sink_stream(spark, src, root, ckpt):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.format("warehouse_commits")
        .option("root", root)
        .option("table", "sink_tbl")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_sink_commits_microbatches_as_txns(spark, tmp_path):
    pyds.register(spark)
    root = str(tmp_path / "wh")
    wh = TransactionalWarehouse(spark, root)
    wh.register_table("sink_tbl", SCHEMA)
    wh.create_all()
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).write.parquet(src)
    _sink_stream(spark, src, root, ckpt)
    assert sorted(r.k for r in wh.read("sink_tbl").collect()) == [1, 2]
    ops = [(h["operation"], h["run_id"]) for h in wh.history()]
    assert ops == [("stream", "stream-0")]

    # incremental second drain: ONE new txn, exactly the new rows
    spark.createDataFrame([(3, "c")], SCHEMA).write.mode("append").parquet(src)
    _sink_stream(spark, src, root, ckpt)
    assert sorted(r.k for r in wh.read("sink_tbl").collect()) == [1, 2, 3]
    assert [h["run_id"] for h in wh.history()] == ["stream-0", "stream-1"]
    assert wh.fsck() == {}, wh.fsck()

    # idle drain commits nothing
    _sink_stream(spark, src, root, ckpt)
    assert [h["run_id"] for h in wh.history()] == ["stream-0", "stream-1"]


def test_registrations_are_durable_across_handles(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = TransactionalWarehouse(spark, root)
    wh.register_table("extra", SCHEMA, primary_key=("k",))
    wh.create_all()
    txn = wh.begin("b0")
    txn.stage(spark.createDataFrame([(1, "a")], SCHEMA), "extra")
    txn.commit()
    # a COLD handle (fresh process semantics) sees the extra table,
    # its schema, and its primary key without re-registering
    cold = TransactionalWarehouse(spark, root)
    assert "extra" in cold.all_tables()
    assert sorted(r.k for r in cold.read("extra").collect()) == [1]
    cold.delete_where("extra", F.col("k") == 1)  # needs the durable pk
    assert cold.read("extra").count() == 0


def test_stream_sink_onto_branch(spark, tmp_path):
    pyds.register(spark)
    root = str(tmp_path / "wh")
    wh = TransactionalWarehouse(spark, root)
    wh.register_table("sink_tbl", SCHEMA)
    wh.create_all()
    wh.create_branch("ingest")
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], SCHEMA).write.parquet(src)
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.format("warehouse_commits")
        .option("root", root)
        .option("table", "sink_tbl")
        .option("branch", "ingest")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert wh.read("sink_tbl").count() == 0  # main untouched
    assert wh.branch("ingest").read("sink_tbl").count() == 1
    rep = wh.merge_branch("ingest")
    assert rep["merged"]
    assert wh.read("sink_tbl").count() == 1


# -- round-6 advice fixes: offset holes, empty microbatches, chunked writes --


def test_stream_offsets_tolerate_out_of_order_marker_publish(spark, twh):
    """commit() claims seq N before publishing the marker, so a
    later-claimed seq N+1 can become visible first. A plain max-seq
    offset consumes (lo, N+1] and the late seq-N commit is skipped
    forever; hole-carrying offsets emit it in the first window that
    observes the fill."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    _commit(twh, "b1", [(1, "a")])
    _commit(twh, "b2", [(2, "b")])
    root = twh.root
    hole_seq = twh.snapshots()[-1]["seq"] + 1
    # a peer CLAIMED the next seq but has not yet published its marker
    seq_dir = os.path.join(root, "_txn", "seqs")
    with open(os.path.join(seq_dir, f"{hole_seq:020d}.claim"), "w") as fh:
        fh.write("late3")
    _commit(twh, "b4", [(4, "d")])  # claims hole_seq+1, publishes FIRST

    reader = pyds._CommitLogStreamReader(SCHEMA, {"root": root, "table": "tbl"})
    start = reader.initialOffset()
    end1 = reader.latestOffset()
    assert end1["seq"] == hole_seq + 1
    assert end1["holes"] == [hole_seq]
    runs1 = sorted(
        os.path.basename(p.run_dir) for p in reader.partitions(start, end1)
    )
    assert runs1 == ["__run_id=b1", "__run_id=b2", "__run_id=b4"]

    # the late peer now finishes: data dir + marker for the held seq
    late_dir = os.path.join(root, "tbl", "__run_id=late3")
    os.makedirs(late_dir)
    pq.write_table(
        pa.table({"k": pa.array([3], pa.int64()), "v": pa.array(["c"])}),
        os.path.join(late_dir, "part-0.parquet"),
    )
    with open(os.path.join(root, "_txn", "commits", "late3.json"), "w") as fh:
        json.dump(
            {"run_id": "late3", "tables": ["tbl"], "seq": hole_seq}, fh
        )

    end2 = reader.latestOffset()
    assert end2["seq"] == hole_seq + 1 and end2["holes"] == []
    parts2 = reader.partitions(end1, end2)
    runs2 = [os.path.basename(p.run_dir) for p in parts2]
    assert runs2 == ["__run_id=late3"]  # the filled hole, nothing else
    assert sum(b.num_rows for b in reader.read(parts2[0])) == 1
    # no window ever emits a run twice: union of the two windows == all
    assert sorted(runs1 + runs2) == [
        "__run_id=b1", "__run_id=b2", "__run_id=b4", "__run_id=late3",
    ]


def test_crash_hole_never_stalls_the_stream(spark, twh):
    """A claim whose committer died (no marker, ever) stays in holes —
    later commits keep flowing past it."""
    _commit(twh, "b1", [(1, "a")])
    hole_seq = twh.snapshots()[-1]["seq"] + 1
    seq_dir = os.path.join(twh.root, "_txn", "seqs")
    with open(os.path.join(seq_dir, f"{hole_seq:020d}.claim"), "w") as fh:
        fh.write("dead")
    _commit(twh, "b2", [(2, "b")])
    reader = pyds._CommitLogStreamReader(
        SCHEMA, {"root": twh.root, "table": "tbl"}
    )
    end = reader.latestOffset()
    assert end["seq"] == hole_seq + 1  # advanced PAST the dead claim
    assert end["holes"] == [hole_seq]
    runs = sorted(
        os.path.basename(p.run_dir)
        for p in reader.partitions(reader.initialOffset(), end)
    )
    assert runs == ["__run_id=b1", "__run_id=b2"]


def test_stream_sink_zero_row_microbatch_publishes_no_commit(spark, tmp_path):
    """An all-rows-filtered microbatch must not pollute the commit log
    (or the CDC append feed) with an empty run + manifest."""
    pyds.register(spark)
    root = str(tmp_path / "wh")
    wh = TransactionalWarehouse(spark, root)
    wh.register_table("sink_tbl", SCHEMA)
    wh.create_all()
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a")], SCHEMA).write.parquet(src)
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .filter("k < 0")  # microbatch fires, zero rows survive
        .writeStream.format("warehouse_commits")
        .option("root", root)
        .option("table", "sink_tbl")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert wh.history() == []
    assert wh.read("sink_tbl").count() == 0
    # no stray pending/staging dirs either
    assert not os.path.isdir(
        os.path.join(root, "sink_tbl", ".staging", "__stream_pending__")
    )


def test_sink_write_streams_chunks_to_one_parquet_file(spark, tmp_path):
    """write() must not buffer the whole partition: rows stream through
    bounded chunks into a single incrementally-written parquet file."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "wh")
    w = pyds._CommitLogStreamWriter(SCHEMA, {"root": root, "table": "t"})
    w.CHUNK_ROWS = 16  # force multiple chunks
    msg = w.write(iter([(i, f"v{i}") for i in range(50)]))
    assert len(msg.paths) == 1
    tbl = pq.read_table(msg.paths[0])
    assert tbl.num_rows == 50
    assert sorted(tbl.column("k").to_pylist()) == list(range(50))
    # empty partition: no file, no pending dir
    msg2 = w.write(iter([]))
    assert msg2.paths == []


# -- batch writer: df.write.format("warehouse_commits") -----------------------


def test_batch_write_append_roundtrip(spark, twh):
    df = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    (
        df.write.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .mode("append")
        .save()
    )
    assert sorted(r.k for r in twh.read("tbl").collect()) == [1, 2]
    assert twh.history()[-1]["operation"] == "batch-write"
    # second append is a SECOND atomic commit
    spark.createDataFrame([(3, "c")], SCHEMA).write.format(
        "warehouse_commits"
    ).option("root", twh.root).option("table", "tbl").mode("append").save()
    assert sorted(r.k for r in twh.read("tbl").collect()) == [1, 2, 3]
    assert len(twh.history()) == 2
    assert twh.fsck() == {}, twh.fsck()


def test_batch_write_overwrite_is_atomic_truncate_and_load(spark, twh):
    _commit(twh, "b0", [(1, "a"), (2, "b")])
    s0 = twh.snapshots()[-1]["seq"]
    (
        spark.createDataFrame([(9, "z")], SCHEMA)
        .write.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .mode("overwrite")
        .save()
    )
    assert sorted(r.k for r in twh.read("tbl").collect()) == [9]
    # ONE commit carried both the retire and the load; time travel still
    # addresses the pre-overwrite snapshot
    assert twh.history()[-1]["operation"] == "overwrite"
    assert twh.history()[-1]["replaces"]["tbl"] == ["b0"]
    assert sorted(r.k for r in twh.read("tbl", as_of=s0).collect()) == [1, 2]


def test_batch_write_idempotent_retry_via_batch_id(spark, twh):
    for _ in range(2):  # a retried job with the same batch_id
        (
            spark.createDataFrame([(1, "a")], SCHEMA)
            .write.format("warehouse_commits")
            .option("root", twh.root)
            .option("table", "tbl")
            .option("batch_id", "job-42")
            .mode("append")
            .save()
        )
    assert [r.k for r in twh.read("tbl").collect()] == [1]
    assert [h["run_id"] for h in twh.history()] == ["job-42"]


def test_batch_write_onto_branch(spark, twh):
    _commit(twh, "base", [(1, "a")])
    twh.create_branch("ingest")
    (
        spark.createDataFrame([(2, "b")], SCHEMA)
        .write.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .option("branch", "ingest")
        .mode("append")
        .save()
    )
    assert sorted(r.k for r in twh.read("tbl").collect()) == [1]  # main clean
    assert sorted(r.k for r in twh.branch("ingest").read("tbl").collect()) == [1, 2]
    rep = twh.merge_branch("ingest")
    assert rep["merged"]
    assert sorted(r.k for r in twh.read("tbl").collect()) == [1, 2]


def test_batch_write_empty_append_is_noop(spark, twh):
    (
        spark.createDataFrame([], SCHEMA)
        .write.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .mode("append")
        .save()
    )
    assert twh.history() == []


def test_batch_write_read_roundtrip_through_data_source(spark, twh):
    """write format(...) then read format(...) — full surface symmetry."""
    (
        spark.createDataFrame([(5, "e"), (6, "f")], SCHEMA)
        .write.format("warehouse_commits")
        .option("root", twh.root)
        .option("table", "tbl")
        .mode("append")
        .save()
    )
    back = _load(spark, twh)
    assert sorted((r.k, r.v) for r in back.collect()) == [(5, "e"), (6, "f")]
