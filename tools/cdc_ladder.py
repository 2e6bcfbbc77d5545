#!/usr/bin/env python
"""CDC increment ladder at a scale rung (VERDICT r8 #8).

The ``stream_txn_cdc*`` families prove the incremental view-maintenance
algebra at sf0.01/sf0.1; this drives one ladder at a rung: N appends of
the rung's events into the transactional warehouse with the signed
change-feed fold (`cdc_apply_feed_once`) interleaved, then a real
RETRACTION (`delete_where`) folded as signed deletes — and after every
fold the maintained view is digest-compared against a from-scratch
recomputation over the CURRENT source snapshot. One double-counted or
lost window, or one unsubtracted delete, flips the digest.

Cost posture being proven: each fold reads only the change window (the
churn), never source history — while the recompute the digest checks it
against scans everything. At 100 TB those diverge by orders of
magnitude; equality of results is the whole point of the algebra.

Usage: python tools/cdc_ladder.py [SF_DIR] [--work /tmp/cdc_rung]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sf10")
    ap.add_argument("--work", default="/tmp/cdc_rung")
    ap.add_argument("--appends", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from healthcare_etl_pipeline_spark.catalog import load_table
    from healthcare_etl_pipeline_spark.operators.fingerprint import (
        table_digest,
    )
    from healthcare_etl_pipeline_spark.session import get_spark
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        TransactionalWarehouse,
    )
    from healthcare_etl_pipeline_spark.streaming.cdc import (
        cdc_apply_feed_once,
    )

    if os.path.isdir(args.work):
        shutil.rmtree(args.work)
    os.makedirs(args.work)

    spark = get_spark()
    wh = TransactionalWarehouse(spark, os.path.join(args.work, "wh"))
    wh.register_table(
        "event_log",
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
        primary_key=("event_id",),  # change feed needs row identity
    )
    wh.register_table(
        "event_agg",
        T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("value_sum", T.DoubleType()),
            ]
        ),
    )
    wh.create_all()

    ev = load_table(spark, args.sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    n_total = ev.count()
    print(f"events={n_total}, {args.appends} appends + 1 retraction", flush=True)

    def check(step: str) -> bool:
        view = wh.read("event_agg").select("event_type", "n", "value_sum")
        recompute = (
            wh.read("event_log")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("value_sum"),
            )
        )
        # double-sum order differs between the incremental fold and the
        # recompute; compare at the cent like every value oracle does
        r2 = lambda df: df.withColumn(  # noqa: E731
            "value_sum", F.round("value_sum", 2)
        )
        dv = {(r.bucket, r.n, r.s) for r in table_digest(r2(view)).collect()}
        dr = {
            (r.bucket, r.n, r.s)
            for r in table_digest(r2(recompute)).collect()
        }
        ok = dv == dr
        print(f"{'ok' if ok else 'FAIL'}  {step}: view==recompute "
              f"({len(dv)} buckets)", flush=True)
        return ok

    all_ok = True
    for i in range(args.appends):
        t0 = time.time()
        wh.append(ev.filter(F.col("event_id") % args.appends == i), "event_log")
        win = cdc_apply_feed_once(
            wh, "event_log", "event_agg",
            group_cols=["event_type"], value_col="value",
        )
        dt = time.time() - t0
        print(f"append {i + 1}/{args.appends}: window={win} [{dt:.1f}s]",
              flush=True)
        all_ok &= check(f"after append {i + 1}")

    # retraction: erase a deterministic ~3% slice, fold the signed feed
    t0 = time.time()
    n_del = wh.delete_where("event_log", F.col("event_id") % 31 == 5)
    win = cdc_apply_feed_once(
        wh, "event_log", "event_agg",
        group_cols=["event_type"], value_col="value",
    )
    print(f"retraction: deleted {n_del} rows, window={win} "
          f"[{time.time() - t0:.1f}s]", flush=True)
    all_ok &= check("after retraction")

    # drained consumer does zero work
    assert (
        cdc_apply_feed_once(
            wh, "event_log", "event_agg",
            group_cols=["event_type"], value_col="value",
        )
        is None
    ), "drained consumer must be a no-op"
    print("ok  drained consumer no-op", flush=True)
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
