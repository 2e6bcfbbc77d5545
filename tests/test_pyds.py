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
