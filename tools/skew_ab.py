#!/usr/bin/env python
"""Paired A/B: AQE skewJoin vs manual salting vs no handling, on a
DELIBERATELY skewed key (round-8 verdict item 4).

The testdata's own keys are uniform, so the harness manufactures skew:
a configurable share of lineitem rows remap to ONE hot supplier key
(``CASE WHEN l_orderkey % 10 < hot10 THEN min_key``). The join runs in
the sort-merge regime (auto-broadcast disabled — when the small side
broadcasts, skew in the shuffle never materializes and none of this
matters), three ways in one session, interleaved:

- plain   — AQE on, skewJoin on: the engine's default posture;
- salted  — explicit 8-bucket salting (operators/joins.salted_join),
            measured under the same session;
- none    — AQE skewJoin disabled for the query (the straggler
            baseline that motivates both treatments).

Each variant materializes the same count+sum aggregate; best-of-2 per
variant, variants interleaved so box drift hits all three equally.
Prints one JSON line. Results recorded in BENCH_NOTES.md; the outcome
gates operators/joins.skew_join.

Usage: python tools/skew_ab.py SF_DIR [hot10] [rounds]
       (hot10 = tenths of rows remapped to the hot key, default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.joins import salted_join
from healthcare_etl_pipeline_spark.session import get_spark

SKEW_CONF = "spark.sql.adaptive.skewJoin.enabled"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    hot10 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark()
    # sort-merge regime: a broadcast join would hide the skew entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    supp = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).select(
        "s_suppkey", "s_nationkey"
    )
    hot_key = supp.agg(F.min("s_suppkey")).collect()[0][0]
    skewed = li.select(
        F.when(F.col("l_orderkey") % 10 < hot10, F.lit(hot_key))
        .otherwise(F.col("l_suppkey"))
        .alias("s_suppkey"),
        "l_extendedprice",
    )

    def agg(joined):
        return joined.groupBy("s_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )

    def run(variant: str) -> tuple[float, int]:
        prev = spark.conf.get(SKEW_CONF)
        spark.conf.set(SKEW_CONF, "false" if variant == "none" else "true")
        try:
            if variant == "salted":
                j = salted_join(skewed, supp, key="s_suppkey", salt_buckets=8)
            else:
                j = skewed.join(supp, "s_suppkey")
            t0 = time.time()
            n = agg(j).count()
            return time.time() - t0, n
        finally:
            spark.conf.set(SKEW_CONF, prev)

    variants = ["plain", "salted", "none"]
    best: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(rounds):
        for v in variants:  # interleaved: drift hits all variants equally
            sec, n = run(v)
            best[v] = min(best.get(v, float("inf")), sec)
            rows[v] = n
    assert len(set(rows.values())) == 1, f"variant results differ: {rows}"
    print(
        json.dumps(
            {
                "metric": "skew_join_ab",
                "sf_dir": sf_dir,
                "hot_share": hot10 / 10.0,
                "groups": rows["plain"],
                "best_sec": {v: round(s, 2) for v, s in best.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
