#!/usr/bin/env python
"""Measure state-store heap posture: default (HDFS-backed) vs RocksDB.

The default HDFSBackedStateStoreProvider holds every (key, state) pair as
on-heap JVM objects — at 100 TB key cardinality that is executor-heap-
bound. RocksDBStateStoreProvider keeps state in native memory + local SST
files, so JVM heap stays flat as keys grow. This tool runs the SAME
stateful streaming aggregation (groupBy-count over K distinct keys,
file source → availableNow → noop sink, update mode) at K and 10K keys
under both providers, each in a FRESH subprocess JVM, and reports the
post-run used heap after forced GC.

Expected shape (recorded in BENCH_NOTES.md): heap grows ~linearly with
keys under the default provider and stays ~flat under RocksDB; wall time
is comparable. One JSON line per (provider, keys) run.

Usage: python tools/state_store_bench.py [keys_small] [keys_large]
       (defaults 300_000 and 3_000_000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN = r'''
import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

provider, n_keys = sys.argv[1], int(sys.argv[2])

spark = (
    SparkSession.builder.master("local[8]")
    .appName("state-store-bench")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
if provider == "rocksdb":
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

root = tempfile.mkdtemp(prefix="ssbench-")
src = os.path.join(root, "src")
# 2 rows per key so the agg genuinely merges state
spark.range(2 * n_keys).select(
    (F.col("id") % n_keys).alias("k"),
    F.lit(1.0).alias("v"),
).write.mode("overwrite").parquet(src)

stream = spark.readStream.schema("k long, v double").parquet(src)
agg = stream.groupBy("k").agg(
    F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
)
t0 = time.time()
q = (
    agg.writeStream.outputMode("update")
    .format("noop")
    .option("checkpointLocation", os.path.join(root, "ckpt"))
    .trigger(availableNow=True)
    .start()
)
assert q.awaitTermination(420), "stream did not settle"
wall = time.time() - t0

rt = spark._jvm.java.lang.Runtime.getRuntime()
for _ in range(5):
    rt.gc()
    time.sleep(0.3)
used_mb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
print(json.dumps({
    "provider": provider,
    "keys": n_keys,
    "used_heap_mb": round(used_mb, 1),
    "wall_sec": round(wall, 1),
}))
spark.stop()
'''


def main() -> int:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    large = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("SPARK_GRAFT_MASTER", None)
    results = []
    for provider in ("hdfs", "rocksdb"):
        for keys in (small, large):
            proc = subprocess.run(
                [sys.executable, "-c", _RUN, provider, str(keys)],
                cwd=REPO,
                env=env,
                capture_output=True,
                text=True,
                timeout=900,
            )
            if proc.returncode != 0:
                print(f"FAIL {provider}/{keys}: {proc.stderr[-2000:]}")
                return 1
            line = proc.stdout.strip().splitlines()[-1]
            print(line)
            results.append(json.loads(line))
    by = {(r["provider"], r["keys"]): r for r in results}
    hdfs_growth = (
        by[("hdfs", large)]["used_heap_mb"] - by[("hdfs", small)]["used_heap_mb"]
    )
    rocks_growth = (
        by[("rocksdb", large)]["used_heap_mb"]
        - by[("rocksdb", small)]["used_heap_mb"]
    )
    print(
        json.dumps(
            {
                "metric": "state_store_heap_growth_mb_at_10x_keys",
                "hdfs_backed": round(hdfs_growth, 1),
                "rocksdb": round(rocks_growth, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
