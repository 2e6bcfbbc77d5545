"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count). A short
warmup query first so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from healthcare_etl_pipeline_spark.queries import all_queries
from healthcare_etl_pipeline_spark.session import get_spark

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q10_returned_items",
    "top_orders_per_customer",
    "rollup_order_volume",
    # ETL pipeline
    "patients_ingest_valid",
    "explode_consent_map",
    # windows / sessions / streaming
    "sessionize_events",
    "stream_tumbling_counts",
    # LLM-data ops
    "dedup_exact_lineitem",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "cosine_topk_bruteforce",
    "text_stats_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark()

    specs = all_queries()
    # warmup: touch the big fact table + codegen pipeline once
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n  # rowcount forced; result not used
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
