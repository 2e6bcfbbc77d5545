#!/usr/bin/env python
"""Stateful Structured Streaming at a SCALE rung, with a mid-stream
driver SIGKILL and checkpoint recovery (VERDICT r8, item 2).

The registered ``stream_*_rocksdb`` queries value-check provider
independence at sf0.01/sf0.1; the state_store_bench tops out at 3 M toy
keys. What has never been exercised is the combination that matters for
the 100 TB posture: REAL event volume through the stateful operators
(applyInPandasWithState sessionization, watermarked tumbling windows)
with RocksDB state, across MANY micro-batches, killed mid-stream and
restarted from the checkpoint — then value-compared (digest) against the
batch oracle.

Method:
1. ``--prepare`` splits the rung's events table into N time-range
   parquet files (repartitionByRange on ts, mtimes forced into filename
   order) so the file stream source delivers time-ordered micro-batches
   (``maxFilesPerTrigger=1``) — the arrival order a log-backed stream
   would have, and the order per-key stateful folds assume.
2. ``--child`` runs the streaming query (RocksDB provider, event-time
   watermark, parquet sink + checkpoint, availableNow). The PARENT polls
   the checkpoint's commit log and SIGKILLs the child after K committed
   batches — an ungraceful driver death with batches still pending.
3. The child is relaunched with the SAME sink + checkpoint and drains
   the rest. Exactly-once across the kill comes from the checkpoint
   (source offsets) + the file sink's _spark_metadata manifest (an
   uncommitted batch's files are invisible to readers and re-attempted).
4. ``--compare`` digests the sink (Spark read honors the manifest)
   against the DuckDB batch oracle over the SAME split files
   (operators/fingerprint.py's portable digest — the sf0.01-value-gated
   compare unit of the scale ladder).

Oracles (same forms as the registered sf0.01-gated twins):
- session: lag+cumsum sessionization, SETTLED sessions only — a session
  is emitted iff a later event closed it (seq < max seq per user) or the
  final watermark (max ts - 1 h) passed its end (event-time timeout).
- tumbling: 1-hour buckets with count + round(sum(value), 2), windows
  whose end the final watermark passed (append-mode emission contract).

Usage:
  python tools/stream_scale_drive.py SF_DIR --op session [--files 16]
         [--kill-after 3] [--work /tmp/stream_rung]
  (single entry point: prepares, runs, kills, restarts, compares)
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAP = "30 minutes"
WATERMARK = "1 hour"
SRC_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double"
)

SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS seq
  FROM flagged
), sess AS (
  SELECT user_id, seq,
         CAST(min(ts) AS TIMESTAMP) AS session_start,
         CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
         count(*) AS n_events
  FROM numbered GROUP BY user_id, seq
), mxd AS (
  SELECT *, max(seq) OVER (PARTITION BY user_id) AS mx FROM sess
)
SELECT user_id, session_start, session_end, n_events
FROM mxd
WHERE seq < mx
   OR session_end <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events)
                      - INTERVAL 1 HOUR
"""

TUMBLING_ORACLE = """
SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
HAVING CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) + INTERVAL 1 HOUR
       <= (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 1 HOUR
"""


def _paths(work: str) -> dict:
    return {
        "src": os.path.join(work, "src"),
        "sink": os.path.join(work, "sink"),
        "ckpt": os.path.join(work, "ckpt"),
    }


def prepare(sf_dir: str, work: str, n_files: int) -> None:
    from pyspark.sql import functions as F

    from healthcare_etl_pipeline_spark.catalog import load_table
    from healthcare_etl_pipeline_spark.session import get_spark

    p = _paths(work)
    spark = get_spark()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    # Range partition on ts: part-0000i holds the i-th time slice, so the
    # stream (which lists files in mtime order, forced below) replays the
    # table as a time-ordered log — the order per-key stateful folds and
    # monotone watermark advancement assume.
    (
        ev.repartitionByRange(n_files, "ts", "event_id")
        .write.mode("overwrite")
        .parquet(p["src"])
    )
    parts = sorted(glob.glob(os.path.join(p["src"], "part-*.parquet")))
    base = time.time() - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(f, (base + i * 10, base + i * 10))
    n = spark.read.parquet(p["src"]).count()
    print(f"prepared {len(parts)} time-sliced files, {n} events", flush=True)
    spark.stop()


def child(work: str, op: str, state_partitions: int) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from healthcare_etl_pipeline_spark.session import get_spark
    from healthcare_etl_pipeline_spark.streaming.stateful import (
        stateful_session_windows,
    )
    from healthcare_etl_pipeline_spark.streaming.windows import (
        ROCKSDB_PROVIDER,
        _PROVIDER_CONF,
        tumbling_counts,
    )

    p = _paths(work)
    spark = get_spark()
    # Stateful ops allocate one state store per shuffle partition (AQE
    # cannot coalesce them); size to state volume, pinned at start().
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)

    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(p["src"])
        .withWatermark("ts", WATERMARK)
    )
    out = (
        stateful_session_windows(stream, gap=GAP)
        if op == "session"
        else tumbling_counts(stream)
    )
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", p["sink"])
        .option("checkpointLocation", p["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("child: drained", flush=True)


def _commit_count(ckpt: str) -> int:
    commits = os.path.join(ckpt, "commits")
    if not os.path.isdir(commits):
        return 0
    return len(
        [f for f in os.listdir(commits) if not f.startswith(".")]
    )


def run_with_kill(
    work: str, op: str, kill_after: int, state_partitions: int
) -> None:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--child-mode",
        work,
        op,
        str(state_partitions),
    ]
    p = _paths(work)
    proc = subprocess.Popen(cmd)
    killed = False
    while proc.poll() is None:
        if _commit_count(p["ckpt"]) >= kill_after:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.5)
    if not killed:
        if proc.returncode != 0:
            raise SystemExit(f"child failed before the kill point "
                             f"(rc={proc.returncode})")
        print(
            "WARNING: child drained before the kill threshold — "
            "no recovery exercised; lower --kill-after",
            flush=True,
        )
        return
    print(
        f"killed child (SIGKILL) after {_commit_count(p['ckpt'])} committed "
        "batches; restarting from the checkpoint",
        flush=True,
    )
    rc = subprocess.call(cmd)
    if rc != 0:
        raise SystemExit(f"restarted child failed (rc={rc})")


def compare(work: str, op: str) -> int:
    import duckdb

    from healthcare_etl_pipeline_spark.operators.fingerprint import (
        digest_sql,
        table_digest,
    )
    from healthcare_etl_pipeline_spark.session import get_spark

    p = _paths(work)
    spark = get_spark()
    sink = spark.read.parquet(p["sink"])  # honors _spark_metadata manifest
    sdig = {(r.bucket, r.n, r.s) for r in table_digest(sink).collect()}
    n_rows = sink.count()

    con = duckdb.connect()
    con.execute("SET TimeZone = 'UTC'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{p['src']}/*.parquet')"
    )
    oracle = SESSION_ORACLE if op == "session" else TUMBLING_ORACLE
    cols = [
        (r[0], r[1])
        for r in con.execute(f"DESCRIBE {oracle}").fetchall()
    ]
    ddig = {
        (int(a), int(b), int(c))
        for a, b, c in con.execute(digest_sql(oracle, cols)).fetchall()
    }
    ok = sdig == ddig
    print(
        f"{'ok' if ok else 'FAIL'}  stream_{op}: rows={n_rows} "
        f"spark_buckets={len(sdig)} duck_buckets={len(ddig)}",
        flush=True,
    )
    if not ok:
        print("  spark-only:", sorted(sdig - ddig)[:5])
        print("  duck-only:", sorted(ddig - sdig)[:5])
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child-mode":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return 0
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--op", choices=["session", "tumbling"], required=True)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--kill-after", type=int, default=3)
    ap.add_argument("--state-partitions", type=int, default=16)
    ap.add_argument("--work", default="/tmp/stream_rung")
    ap.add_argument(
        "--keep", action="store_true", help="reuse an existing --work dir"
    )
    args = ap.parse_args()

    work = os.path.join(args.work, args.op)
    if not args.keep and os.path.isdir(work):
        shutil.rmtree(work)
    os.makedirs(work, exist_ok=True)

    def sub(mode: list[str]) -> None:
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), *mode]
        )
        if rc != 0:
            raise SystemExit(rc)

    if not os.path.isdir(_paths(work)["src"]):
        sub(["--prepare-mode", args.sf_dir, work, str(args.files)])
    run_with_kill(work, args.op, args.kill_after, args.state_partitions)
    sub(["--compare-mode", work, args.op])
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--prepare-mode":
        prepare(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        raise SystemExit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "--compare-mode":
        raise SystemExit(compare(sys.argv[2], sys.argv[3]))
    raise SystemExit(main())
