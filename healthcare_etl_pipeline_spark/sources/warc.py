"""WARC (Web ARChive, ISO 28500) export + ingestion for the document corpus.

Web-crawl archives are the dominant interchange format for raw training
text (Common Crawl ships ~1 GB ``.warc.gz`` files), so a pipeline that
prepares corpora at 100 TB needs both directions:

- **export**: materialize prepared documents as sharded ``.warc.gz`` in
  the Common Crawl layout — each record compressed as its OWN gzip member
  and the members concatenated, which is what makes the format splittable
  in practice (a reader can start at any member boundary);
- **ingest**: parse ``.warc.gz`` files back into rows, one Spark task per
  archive file (``binaryFile`` source) — the same unit of parallelism real
  crawl pipelines use, because gzip members can't be randomly seeked
  without an external index.

Scale shape:

- The export writes ONE file per shard from the tasks that own the
  shard's rows (``repartition(n_shards, shard)`` + ``applyInPandas`` per
  shard group) — no driver funnel; at 100 TB you raise ``n_shards`` until
  each archive lands near the ~1 GB operating point.
- File BYTES are deterministic: records are sorted by id within a shard,
  ``WARC-Date`` is a fixed pipeline watermark (not ``now()``), and gzip
  members are written with ``mtime=0``. A retried or speculative task
  therefore produces byte-identical output, and the tmp-file +
  ``os.replace`` publish makes duplicate attempts collapse into one
  winner (rename is atomic; both candidates are identical anyway).
- The read side is schema-pinned and validates the record framing
  (version line, mandatory headers, Content-Length honored, CRLF CRLF
  trailer). ``on_malformed`` picks the posture: ``fail`` (default),
  ``skip``, or ``route`` (corrupt payload lands in a ``_corrupt`` column
  with a reason, healthy columns NULL — same convention as the CSV/JSON
  corrupt-routing sources).

No third-party WARC library is used; the record grammar is implemented
from the public ISO 28500 / WARC 1.0 specification.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import tempfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as TY

from healthcare_etl_pipeline_spark.operators.sampling import hash_bucket

MANIFEST_NAME = "_WARC_MANIFEST.json"

#: Fixed, deterministic WARC-Date. Real exports would stamp the pipeline
#: run's watermark; a wall-clock ``now()`` would make task retries produce
#: different bytes and break the atomic-rename dedup story.
WARC_DATE = "2026-01-01T00:00:00Z"

_CRLF = b"\r\n"


def encode_record(doc_id: int, source: str, lang: str, text: str) -> bytes:
    """One WARC 1.0 ``resource`` record, uncompressed."""
    payload = text.encode("utf-8")
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: resource" + _CRLF
        + f"WARC-Record-ID: <urn:doc:{doc_id}>".encode() + _CRLF
        + f"WARC-Date: {WARC_DATE}".encode() + _CRLF
        + f"WARC-Target-URI: https://example.org/{source}/{doc_id}".encode() + _CRLF
        + f"WARC-Identified-Content-Language: {lang}".encode() + _CRLF
        + b"Content-Type: text/plain; charset=utf-8" + _CRLF
        + f"Content-Length: {len(payload)}".encode() + _CRLF
    )
    return headers + _CRLF + payload + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime=0 pins the gzip header; without it two attempts of the same
    # task would differ in a timestamp byte and defeat identical-output
    # deduplication.
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


class WarcFormatError(ValueError):
    pass


def gunzip_members(blob: bytes) -> bytes:
    """Linear-time decompression of concatenated gzip members.

    stdlib ``gzip.decompress`` re-copies the ENTIRE remaining buffer into
    ``unused_data`` once per member — O(members x bytes), quadratic on
    Common-Crawl-layout archives with one member per record (measured:
    ~70 s for a 21 MB / 62k-member shard; this path does it in well under
    a second). Feeding fixed-size chunks through a streaming
    ``decompressobj`` keeps every byte touched O(1) times; zlib's gzip
    wrapper (wbits=31) still verifies each member's CRC and length.
    Raises ``OSError`` on a truncated final member, matching the gzip
    module's failure mode.
    """
    out: list[bytes] = []
    view = memoryview(blob)
    pos, n = 0, len(blob)
    # Small chunks bound the per-member-boundary unused_data copy to
    # chunk_size bytes: total extra memcpy is O(members x chunk), and the
    # Python loop count for large single-member files stays trivial.
    chunk_size = 1 << 16
    while pos < n:
        do = zlib.decompressobj(wbits=31)
        while not do.eof and pos < n:
            chunk = view[pos : pos + chunk_size]
            pos += len(chunk)
            out.append(do.decompress(chunk))
        if not do.eof:
            raise OSError(
                "Compressed file ended before the end-of-stream marker was reached"
            )
        # rewind to the exact member boundary; the next member re-reads
        # from the source view instead of chaining unused_data copies
        pos -= len(do.unused_data)
    return b"".join(out)


def parse_records(raw: bytes) -> Iterator[dict]:
    """Parse concatenated uncompressed WARC records; strict framing."""
    pos, n = 0, len(raw)
    while pos < n:
        end_hdr = raw.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            raise WarcFormatError(f"unterminated header block at byte {pos}")
        block = raw[pos:end_hdr].decode("utf-8", errors="strict")
        lines = block.split("\r\n")
        if lines[0] != "WARC/1.0":
            raise WarcFormatError(f"bad version line {lines[0]!r} at byte {pos}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if not sep:
                raise WarcFormatError(f"malformed header line {ln!r}")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError(f"missing/invalid Content-Length at byte {pos}") from exc
        body_start = end_hdr + 4
        body_end = body_start + length
        if raw[body_end : body_end + 4] != _CRLF + _CRLF:
            raise WarcFormatError(f"record at byte {pos} not CRLFCRLF-terminated")
        yield {
            "headers": headers,
            "payload": raw[body_start:body_end],
            "offset": pos,
        }
        pos = body_end + 4


def export_warc_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> dict:
    """Write ``df(doc_id, source, lang, text)`` as sharded ``.warc.gz``.

    Returns the manifest dict (also persisted as ``_WARC_MANIFEST.json``
    AFTER the data — readers treat the manifest as the commit point, the
    same convention as the JSONL export and the transactional warehouse).

    Deployment note: shard files are written by EXECUTOR-side Python via
    plain ``open()``, so ``out_dir`` must be a filesystem every executor
    can reach (local in local/local-cluster modes; NFS/FUSE-mounted
    object storage on a real cluster). The atomic-rename dedup relies on
    POSIX ``rename`` semantics, which those mounts provide.
    """
    os.makedirs(out_dir, exist_ok=True)
    sharded = df.withColumn("shard", hash_bucket(id_col) % n_shards)

    result_schema = TY.StructType(
        [
            TY.StructField("shard", TY.IntegerType()),
            TY.StructField("n_records", TY.LongType()),
            TY.StructField("n_bytes", TY.LongType()),
            TY.StructField("file", TY.StringType()),
        ]
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=[f.name for f in result_schema.fields])
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(id_col, kind="mergesort")
        chunks = [
            _gzip_member(
                encode_record(
                    int(r[id_col]), str(r["source"]), str(r["lang"]), str(r["text"])
                )
            )
            for r in pdf.to_dict("records")
        ]
        blob = b"".join(chunks)
        final = os.path.join(out_dir, f"shard-{shard:05d}.warc.gz")
        fd, tmp = tempfile.mkstemp(dir=out_dir, prefix=".warc-tmp-")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(blob)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, final)  # atomic; identical bytes per attempt
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "n_records": len(pdf),
                    "n_bytes": len(blob),
                    "file": os.path.basename(final),
                }
            ]
        )

    stats = (
        sharded.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(write_shard, schema=result_schema)
        .collect()
    )
    manifest = {
        "format": "warc/1.0",
        "compression": "gzip-per-record-member",
        "warc_date": WARC_DATE,
        "n_shards": n_shards,
        "row_count": int(sum(r["n_records"] for r in stats)),
        "shard_counts": {
            str(r["shard"]): int(r["n_records"])
            for r in sorted(stats, key=lambda r: r["shard"])
        },
        "shard_bytes": {
            str(r["shard"]): int(r["n_bytes"])
            for r in sorted(stats, key=lambda r: r["shard"])
        },
    }
    tmp = os.path.join(out_dir, f".{MANIFEST_NAME}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def read_warc_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST_NAME), encoding="utf-8") as fh:
        return json.load(fh)


_READ_SCHEMA = TY.StructType(
    [
        TY.StructField("doc_id", TY.LongType()),
        TY.StructField("target_uri", TY.StringType()),
        TY.StructField("lang", TY.StringType()),
        TY.StructField("source_file", TY.StringType()),
        TY.StructField("content_length", TY.LongType()),
        TY.StructField("text", TY.StringType()),
        TY.StructField("_corrupt", TY.StringType()),
    ]
)


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    on_malformed: str = "fail",
) -> DataFrame:
    """Parse ``.warc.gz`` archives into rows; one task per archive file.

    ``binaryFile`` hands each archive to exactly one task — the honest
    parallelism unit for gzip'd WARC (members aren't seekable without an
    index), and the shape Common Crawl consumers actually run: thousands
    of ~1 GB files → thousands of tasks. ``on_malformed``:

    - ``fail``: raise on the first framing violation (default);
    - ``skip``: drop corrupt records, keep parsing at the next member;
    - ``route``: emit a row per corrupt record with ``_corrupt`` set and
      data columns NULL (CSV/JSON corrupt-routing convention).
    """
    if on_malformed not in ("fail", "skip", "route"):
        raise ValueError(f"on_malformed must be fail|skip|route, got {on_malformed!r}")

    files = spark.read.format("binaryFile").load(path)

    def parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(str(fpath))
                try:
                    raw = gunzip_members(bytes(content))
                except (OSError, zlib.error) as exc:
                    if on_malformed == "fail":
                        raise WarcFormatError(f"{base}: bad gzip stream: {exc}") from exc
                    if on_malformed == "route":
                        rows.append(_corrupt_row(base, f"bad gzip stream: {exc}"))
                    continue
                try:
                    for rec in parse_records(raw):
                        hdr = rec["headers"]
                        rid = hdr.get("warc-record-id", "")
                        try:
                            doc_id = int(rid.strip("<>").rpartition(":")[2])
                        except ValueError as exc:
                            raise WarcFormatError(
                                f"{base}: unparsable WARC-Record-ID {rid!r}"
                            ) from exc
                        rows.append(
                            {
                                "doc_id": doc_id,
                                "target_uri": hdr.get("warc-target-uri"),
                                "lang": hdr.get("warc-identified-content-language"),
                                "source_file": base,
                                "content_length": len(rec["payload"]),
                                "text": rec["payload"].decode("utf-8"),
                                "_corrupt": None,
                            }
                        )
                except WarcFormatError as exc:
                    # Framing is length-delimited: once it's violated the
                    # rest of the archive can't be trusted — route/skip the
                    # remainder as one unit (records before the violation
                    # were already emitted).
                    if on_malformed == "fail":
                        raise
                    if on_malformed == "route":
                        rows.append(_corrupt_row(base, str(exc)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _READ_SCHEMA.fields]
            )

    out = files.select("path", "content").mapInPandas(parse_files, schema=_READ_SCHEMA)
    if on_malformed != "route":
        out = out.drop("_corrupt")
    return out


def _corrupt_row(source_file: str, reason: str) -> dict:
    return {
        "doc_id": None,
        "target_uri": None,
        "lang": None,
        "source_file": source_file,
        "content_length": None,
        "text": None,
        "_corrupt": reason,
    }


def shard_of_file(col):
    """Recover the shard number from ``source_file`` (shard-00003.warc.gz)."""
    return F.regexp_extract(col, r"shard-(\d+)\.warc\.gz", 1).cast("int")
