"""File-level data skipping over the transactional warehouse: min/max
stats index builds, prunes files, never loses rows on a stale index."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture
def wh(spark, tmp_path):
    w = TransactionalWarehouse(spark, str(tmp_path / "skip_wh"))
    w.register_table("kv", SCHEMA)
    w.create_all()
    return w


def _append_range(spark, wh, lo, hi, n_files=3):
    df = spark.createDataFrame(
        [Row(k=k, v=f"v{k}") for k in range(lo, hi)], SCHEMA
    ).repartitionByRange(n_files, "k")
    wh.append(df, "kv")


def test_skipping_prunes_files_and_matches_full_read(spark, wh):
    _append_range(spark, wh, 0, 60)
    _append_range(spark, wh, 60, 120)
    n = wh.build_stats_index("kv", ["k"])
    assert n >= 4  # multiple files per run

    df, report = wh.read_skipping("kv", {"k": (10, 20)})
    assert report["files_read"] < report["files_total"]
    assert report["runs_uncovered"] == []
    got = sorted(r["k"] for r in df.filter(F.col("k").between(10, 20)).collect())
    assert got == list(range(10, 21))
    # the skipped frame is a superset of the exact result, never a subset
    assert df.filter(F.col("k").between(10, 20)).count() == 11


def test_stale_index_falls_back_to_full_read_of_new_runs(spark, wh):
    _append_range(spark, wh, 0, 50)
    wh.build_stats_index("kv", ["k"])
    # commit AFTER the build: index is stale for this run
    _append_range(spark, wh, 50, 100)
    df, report = wh.read_skipping("kv", {"k": (40, 60)})
    assert len(report["runs_uncovered"]) == 1
    got = sorted(r["k"] for r in df.filter(F.col("k").between(40, 60)).collect())
    assert got == list(range(40, 61))  # rows from BOTH runs, none lost


def test_out_of_range_bounds_select_no_covered_files(spark, wh):
    _append_range(spark, wh, 0, 50)
    wh.build_stats_index("kv", ["k"])
    df, report = wh.read_skipping("kv", {"k": (1000, 2000)})
    assert report["files_read"] == 0
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_index_excludes_compacted_away_runs(spark, wh):
    """Stats rows whose files were superseded by a compaction must not be
    served: the compacted run is uncovered (full read), old entries dead."""
    _append_range(spark, wh, 0, 50)
    _append_range(spark, wh, 50, 100)
    wh.build_stats_index("kv", ["k"])
    wh.compact("kv")
    df, report = wh.read_skipping("kv", {"k": (10, 20)})
    assert report["files_read"] == 0  # all covered entries retired
    assert len(report["runs_uncovered"]) == 1
    got = sorted(r["k"] for r in df.filter(F.col("k").between(10, 20)).collect())
    assert got == list(range(10, 21))


def test_zvalue_n_generalizes_two_column_morton(spark):
    """zvalue_n([x, y]) must equal the original two-column zvalue bit
    for bit, and three-column interleave must be a bijection on small
    domains (no two distinct tuples share a key)."""
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.operators.layout import (
        zvalue,
        zvalue_n,
    )

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    same = df.select(
        (zvalue(F.col("x"), F.col("y")) == zvalue_n([F.col("x"), F.col("y")]))
        .alias("eq")
    )
    assert same.filter(~F.col("eq")).count() == 0

    tri = spark.range(512).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8) % 8).cast("long").alias("b"),
        (F.col("id") / 64).cast("long").alias("c"),
    )
    keys = tri.select(
        zvalue_n([F.col("a"), F.col("b"), F.col("c")], bits=3).alias("z")
    )
    assert keys.distinct().count() == 512  # bijective on 8x8x8


def test_optimize_zorder_three_columns(spark, wh):
    rows = [Row(k=k, v=f"v{k}") for k in range(50)]
    wh.append(spark.createDataFrame(rows, SCHEMA), "kv")
    n = wh.optimize("kv", zorder_by=("k", "k", "k"))
    assert n >= 1
    assert {r["k"] for r in wh.read("kv").collect()} == set(range(50))


def test_unindexed_column_raises(spark, wh):
    _append_range(spark, wh, 0, 10)
    wh.build_stats_index("kv", ["k"])
    with pytest.raises(KeyError):
        wh.read_skipping("kv", {"v": (None, "x")})


def test_skipping_on_partitioned_table_recovers_partition_values(
    spark, tmp_path
):
    """Stats entries are FILE paths; on a hive-partitioned table the read
    must recover partition values from the directory names (basePath),
    not null-fill them through the explicit schema."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("part", T.StringType(), True),
        ]
    )
    w = TransactionalWarehouse(spark, str(tmp_path / "pskip_wh"))
    w.register_table("pkv", schema, partition_by=("part",))
    w.create_all()
    rows = [Row(k=k, part="x" if k < 50 else "y") for k in range(100)]
    w.append(spark.createDataFrame(rows, schema), "pkv")
    w.build_stats_index("pkv", ["k"])
    df, report = w.read_skipping("pkv", {"k": (10, 20)})
    got = df.filter(F.col("k").between(10, 20)).collect()
    assert sorted(r["k"] for r in got) == list(range(10, 21))
    assert all(r["part"] == "x" for r in got)  # not null-filled


def test_incremental_stats_update_covers_new_runs(spark, wh):
    """update_stats_index scans ONLY uncovered runs and extends the
    index; after the update, skipping prunes with zero uncovered runs."""
    _append_range(spark, wh, 0, 50)
    wh.build_stats_index("kv", ["k"])
    _append_range(spark, wh, 50, 100)
    n_new = wh.update_stats_index("kv")
    assert n_new >= 1
    df, report = wh.read_skipping("kv", {"k": (60, 70)})
    assert report["runs_uncovered"] == []
    assert report["files_read"] < report["files_total"]
    got = sorted(r["k"] for r in df.filter(F.col("k").between(60, 70)).collect())
    assert got == list(range(60, 71))
    # idempotent when current
    assert wh.update_stats_index("kv") == 0


def test_rollback_restores_snapshot_metadata_only(spark, wh):
    """rollback retires post-snapshot runs in one marker; a second
    rollback across a compaction boundary restores the superseded runs."""
    _append_range(spark, wh, 0, 10, n_files=1)
    s1 = wh.snapshots()[-1]["seq"]
    _append_range(spark, wh, 10, 20, n_files=1)
    retired = wh.rollback("kv", s1)
    assert len(retired) == 1
    assert {r["k"] for r in wh.read("kv").collect()} == set(range(10))

    # across a compaction: rollback must RESTORE the compacted-away runs
    _append_range(spark, wh, 100, 105, n_files=1)
    pre_compact = wh.snapshots()[-1]["seq"]
    wh.compact("kv")
    wh.rollback("kv", pre_compact)
    assert {r["k"] for r in wh.read("kv").collect()} == (
        set(range(10)) | set(range(100, 105))
    )


def test_rollback_after_vacuum_raises(spark, wh):
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        IncrementalWindowExpiredError,
    )

    _append_range(spark, wh, 0, 10, n_files=1)
    pre = wh.snapshots()[-1]["seq"]
    wh.compact("kv")
    wh.vacuum()  # reclaims the pre-compaction run
    with pytest.raises(IncrementalWindowExpiredError):
        wh.rollback("kv", pre)


def test_vacuum_dead_run_retention_preserves_recent_history(spark, wh):
    """dead_run_retention_sec keeps freshly retired runs on disk (time
    travel + rollback reach), while retention=0 reclaims them."""
    _append_range(spark, wh, 0, 10, n_files=1)
    pre = wh.snapshots()[-1]["seq"]
    wh.compact("kv")
    assert wh.vacuum(dead_run_retention_sec=3600.0) == []
    # the retained run still serves time travel AND rollback
    assert {r["k"] for r in wh.read("kv", as_of=pre).collect()} == set(range(10))
    wh.rollback("kv", pre)
    assert {r["k"] for r in wh.read("kv").collect()} == set(range(10))


def _append_interleaved(spark, wh, residue, n=40, n_files=2):
    # keys k ≡ residue (mod 4), spread over the FULL range: every file's
    # [min,max] overlaps every other file's, so zone maps cannot prune
    df = spark.createDataFrame(
        [Row(k=k, v=f"v{k}") for k in range(residue, residue + 4 * n, 4)],
        SCHEMA,
    ).repartition(n_files)
    wh.append(df, "kv")


def test_portable_hash_py_matches_column_form(spark):
    from healthcare_etl_pipeline_spark.operators.text import (
        portable_char_hash,
        portable_char_hash_py,
    )

    vals = ["", "a", "42#0", "hello world", "ключ", "0.5#2"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", portable_char_hash("s").alias("h")).collect()
    }
    for v in vals:
        assert got[v] == portable_char_hash_py(v), v


def test_bloom_point_lookup_prunes_where_zonemaps_cannot(spark, wh):
    for residue in range(4):
        _append_interleaved(spark, wh, residue)
    wh.build_stats_index("kv", ["k"], bloom_cols=["k"])

    # zone maps alone: every file overlaps the point
    _, minmax_report = wh.read_skipping("kv", {"k": (17, 17)})
    assert minmax_report["files_read"] == minmax_report["files_total"]

    # bloom: only the file(s) actually holding k=17 survive
    df, report = wh.read_skipping("kv", {"k": (17, 17)}, equals={"k": 17})
    assert 0 < report["files_read"] < report["files_total"]
    rows = df.filter(F.col("k") == 17).collect()
    assert [r["v"] for r in rows] == ["v17"]

    # absent key: no false negatives required, exact filter yields nothing
    df, _ = wh.read_skipping("kv", {"k": (999, 999)}, equals={"k": 999})
    assert df.filter(F.col("k") == 999).count() == 0


def test_bloom_maintained_by_update_stats_index(spark, wh):
    _append_interleaved(spark, wh, 0)
    wh.build_stats_index("kv", ["k"], bloom_cols=["k"])
    # new run after the build; its keys enter the bloom via update
    _append_interleaved(spark, wh, 1)
    wh.update_stats_index("kv")
    df, report = wh.read_skipping("kv", {"k": (5, 5)}, equals={"k": 5})
    assert report["runs_uncovered"] == []
    assert report["files_read"] < report["files_total"]
    assert df.filter(F.col("k") == 5).count() == 1


def test_bloom_requires_indexed_column(spark, wh):
    _append_interleaved(spark, wh, 0)
    wh.build_stats_index("kv", ["k"])  # no bloom_cols
    with pytest.raises(KeyError, match="Bloom"):
        wh.read_skipping("kv", {"k": (5, 5)}, equals={"k": 5})


def test_bloom_bits_scale_with_file_volume(spark, wh):
    """Adaptive sizing (round-9 sf10 catch): a fixed 2^16-bit space
    saturates once files hold ~10^5 keys (every probe answers "maybe",
    zero files pruned). The default must derive the bit-space from the
    largest per-file row count so the sets stay sparse at any volume."""
    import json
    import os

    # 12,000 interleaved keys per residue class, 2 files per run: every
    # file's [min,max] spans the full key range (zone maps prune nothing)
    # and each file holds ~6,000 keys — enough that 8·k·n overflows 2^16.
    for residue in range(4):
        _append_interleaved(spark, wh, residue, n=12000)
    wh.build_stats_index("kv", ["k"], bloom_cols=["k"])

    with open(
        os.path.join(wh.root, "_stats", "kv", "manifest.json"),
        encoding="utf-8",
    ) as fh:
        manifest = json.load(fh)
    bits, k = manifest["bloom"]["bits"], manifest["bloom"]["k"]
    # ~6,000 rows in the largest file -> at least 8·k·n bits, power of two
    assert bits >= 8 * k * 5000
    assert bits & (bits - 1) == 0

    # and the point lookup still prunes past the useless zone maps
    _, mm = wh.read_skipping("kv", {"k": (17, 17)})
    assert mm["files_read"] == mm["files_total"]
    df, bl = wh.read_skipping("kv", {"k": (17, 17)}, equals={"k": 17})
    assert bl["files_read"] < mm["files_read"]
    assert df.filter(F.col("k") == 17).count() == 1

    # explicit override still honored (the manifest records what ran)
    wh.build_stats_index("kv", ["k"], bloom_cols=["k"], bloom_bits=1 << 18)
    with open(
        os.path.join(wh.root, "_stats", "kv", "manifest.json"),
        encoding="utf-8",
    ) as fh:
        assert json.load(fh)["bloom"]["bits"] == 1 << 18
