"""WARC export/ingest (sources/warc.py): framing, determinism, routing."""

import glob
import gzip
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.sources.warc import (
    WarcFormatError,
    encode_record,
    export_warc_shards,
    parse_records,
    read_warc,
    read_warc_manifest,
    shard_of_file,
)

SF = "/root/testdata/sf0.001"


def docs_df(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "lang", "text")
    )


# ---------- pure record grammar ----------


def test_encode_parse_roundtrip_unit():
    raw = encode_record(7, "src1", "en", "hello\nworld — naïve ✓")
    recs = list(parse_records(raw))
    assert len(recs) == 1
    rec = recs[0]
    assert rec["headers"]["warc-record-id"] == "<urn:doc:7>"
    assert rec["headers"]["warc-type"] == "resource"
    assert rec["payload"].decode("utf-8") == "hello\nworld — naïve ✓"


def test_parse_concatenated_records():
    raw = encode_record(1, "a", "en", "x") + encode_record(2, "b", "de", "yy")
    ids = [r["headers"]["warc-record-id"] for r in parse_records(raw)]
    assert ids == ["<urn:doc:1>", "<urn:doc:2>"]


def test_parse_rejects_bad_version():
    raw = encode_record(1, "a", "en", "x").replace(b"WARC/1.0", b"WARC/9.9", 1)
    with pytest.raises(WarcFormatError, match="bad version"):
        list(parse_records(raw))


def test_parse_rejects_wrong_content_length():
    raw = encode_record(1, "a", "en", "xxxx").replace(
        b"Content-Length: 4", b"Content-Length: 3", 1
    )
    with pytest.raises(WarcFormatError, match="CRLFCRLF"):
        list(parse_records(raw))


def test_parse_rejects_missing_content_length():
    raw = encode_record(1, "a", "en", "x").replace(b"Content-Length", b"X-Length", 1)
    with pytest.raises(WarcFormatError, match="Content-Length"):
        list(parse_records(raw))


# ---------- Spark roundtrip ----------


def test_export_roundtrip_values(spark, tmp_path):
    out = str(tmp_path / "warc")
    docs = docs_df(spark)
    manifest = export_warc_shards(docs, out, n_shards=4)
    assert manifest["row_count"] == docs.count()
    assert sum(manifest["shard_counts"].values()) == manifest["row_count"]
    assert read_warc_manifest(out)["format"] == "warc/1.0"

    back = read_warc(spark, out + "/shard-*.warc.gz")
    orig = {
        (r["doc_id"], r["lang"], r["text"]) for r in docs.collect()
    }
    got = {(r["doc_id"], r["lang"], r["text"]) for r in back.collect()}
    assert got == orig

    # shard recovered from the filename equals the manifest's placement
    per_shard = (
        back.groupBy(shard_of_file(F.col("source_file")).alias("shard"))
        .count()
        .collect()
    )
    assert {str(r["shard"]): r["count"] for r in per_shard} == manifest["shard_counts"]


def test_export_bytes_deterministic(spark, tmp_path):
    """Two independent exports produce byte-identical archives — the
    property that makes duplicate task attempts (retry/speculation)
    collapse safely under the atomic rename."""
    docs = docs_df(spark).limit(200)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_warc_shards(docs, d1, n_shards=2)
    export_warc_shards(docs, d2, n_shards=2)
    for f1 in sorted(glob.glob(d1 + "/shard-*.warc.gz")):
        f2 = os.path.join(d2, os.path.basename(f1))
        h1 = hashlib.md5(open(f1, "rb").read()).hexdigest()
        h2 = hashlib.md5(open(f2, "rb").read()).hexdigest()
        assert h1 == h2, os.path.basename(f1)


def test_gzip_members_are_splittable(spark, tmp_path):
    """Common Crawl layout: each record is its own gzip member, so a
    reader positioned at any member boundary can decompress from there."""
    out = str(tmp_path / "warc")
    export_warc_shards(docs_df(spark).limit(50), out, n_shards=1)
    blob = open(glob.glob(out + "/shard-*.warc.gz")[0], "rb").read()
    # more than one member <=> multiple gzip magic headers
    assert blob.count(b"\x1f\x8b\x08") >= 2
    # decompressing only the SECOND member onward still parses cleanly
    second = blob.index(b"\x1f\x8b\x08", 1)
    tail = gzip.decompress(blob[second:])
    assert len(list(parse_records(tail))) >= 1


# ---------- malformed handling ----------


def _write_corrupt_archive(path):
    good = encode_record(1, "s", "en", "fine")
    bad = encode_record(2, "s", "en", "broken").replace(
        b"Content-Length: 6", b"Content-Length: 2", 1
    )
    buf = b""
    for raw in (good, bad):
        import io

        b = io.BytesIO()
        with gzip.GzipFile(fileobj=b, mode="wb", mtime=0) as gz:
            gz.write(raw)
        buf += b.getvalue()
    with open(path, "wb") as fh:
        fh.write(buf)


def test_malformed_fail_skip_route(spark, tmp_path):
    arc = str(tmp_path / "shard-00000.warc.gz")
    _write_corrupt_archive(arc)

    with pytest.raises(Exception, match="CRLFCRLF"):
        read_warc(spark, arc, on_malformed="fail").collect()

    skipped = read_warc(spark, arc, on_malformed="skip").collect()
    assert [r["doc_id"] for r in skipped] == [1]

    routed = read_warc(spark, arc, on_malformed="route").collect()
    ok = [r for r in routed if r["_corrupt"] is None]
    bad = [r for r in routed if r["_corrupt"] is not None]
    assert [r["doc_id"] for r in ok] == [1]
    assert len(bad) == 1 and "CRLFCRLF" in bad[0]["_corrupt"]
    assert bad[0]["doc_id"] is None

    with pytest.raises(ValueError, match="fail|skip|route"):
        read_warc(spark, arc, on_malformed="nope")


def test_bad_gzip_routes(spark, tmp_path):
    arc = str(tmp_path / "shard-00000.warc.gz")
    with open(arc, "wb") as fh:
        fh.write(b"not gzip at all")
    routed = read_warc(spark, arc, on_malformed="route").collect()
    assert len(routed) == 1 and "gzip" in routed[0]["_corrupt"]
    with pytest.raises(Exception, match="gzip"):
        read_warc(spark, arc, on_malformed="fail").collect()


def test_gunzip_members_chunk_boundaries():
    """gunzip_members must agree with stdlib gzip across member sizes that
    straddle its internal chunk size (64 KiB): tiny members (many per
    chunk), members exactly at the boundary, and members spanning many
    chunks."""
    import io as _io
    from healthcare_etl_pipeline_spark.sources.warc import gunzip_members

    def member(payload: bytes) -> bytes:
        b = _io.BytesIO()
        with gzip.GzipFile(fileobj=b, mode="wb", mtime=0) as gz:
            gz.write(payload)
        return b.getvalue()

    payloads = [
        b"x" * 10,
        b"boundary" * 8192,          # ~64 KiB
        bytes(range(256)) * 2048,    # 512 KiB, spans many chunks
        b"",                          # empty member
        b"tail",
    ]
    blob = b"".join(member(p) for p in payloads)
    assert gunzip_members(blob) == gzip.decompress(blob) == b"".join(payloads)
    # single member equivalence
    assert gunzip_members(member(b"solo")) == b"solo"
    # empty input
    assert gunzip_members(b"") == b""
