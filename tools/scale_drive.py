#!/usr/bin/env python
"""Spark-only SCALE drive: execute a subset of registered queries at a
large scale factor, materialize fully, and record rows + wall time.

Purpose (round-6 verdict #2, the sf10 rung): the bug class hunted at
10x the last oracle-checked rung is EXECUTION behavior — hot LSH
buckets going quadratic, band-selectivity collapse, shuffle spill,
executor OOM, driver-side collects that stopped being metadata-sized.
Those all manifest as failures, timeouts, or runaway candidate counts
WITHOUT an oracle. The DuckDB differential stays the correctness story
at the gate scales (its own cost on the LSH families is quadratic in
corpus size — 1659 s for dedup_embedding_lsh at sf1 already — so a
full differential at sf10 would measure DuckDB, not us).

Each query is materialized row-by-row (count over the full result) and
reported as ``ok name rows sec``; any exception reports FAIL and the
drive exits non-zero after finishing the list.

Usage:  python tools/scale_drive.py SF_DIR [query ...]
        (no names -> the scale-SENSITIVE default list below)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _default_heap_gb(cap_gb: int = 64) -> int:
    """Default driver heap: min(cap, ~80% of MemAvailable), floor 4 GB.
    A fixed 64g on a smaller host swaps or gets OOM-killed before Spark
    ever spills; reading /proc/meminfo keeps the big-box posture on big
    boxes without assuming one."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return max(4, min(cap_gb, int(avail_gb * 0.8)))
    except OSError:
        pass
    return cap_gb

# Families whose behavior changes with scale: LSH/banding candidate
# generation, ANN, rank cutoffs, sampling/splits, skew handling,
# sessionization/windows, sketches, dedup graphs.
SCALE_SENSITIVE = [
    "minhash_lsh_pairs",
    "minhash_dedup_survivors",
    "simhash_near_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "ngram_jaccard_prefix_pairs",
    "dedup_exact_lineitem",
    "dedup_exact_docs",
    "dedup_components_docs",
    "dedup_embedding_lsh_auto",  # planes='auto'; pinned-planes twin is quadratic here
    "minhash_index_dedup_increment",  # persisted-index bootstrap + 2 increments
    "decontamination_lsh_docs",
    "segment_dedup_docs",
    "intra_doc_dedup_docs",
    "lsh_eval_pr_sample_docs",  # exact ground truth is quadratic; sample at scale
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "cosine_topk_bruteforce",
    "bm25_topk_docs",
    "top_orders_per_customer",
    "stratified_sample_docs",
    "leakage_safe_split_docs",
    "hash_split_docs",
    "salted_join_lineitem_supplier",
    "heavy_hitter_tokens",
    "hll_distinct_users",
    "cms_sketch_tokens",
    "sessionize_events",
    "resample_gapfill_events",
    "rolling_active_users_events",
    "corpus_prep_pipeline",
    "pack_sequences_docs",
    "token_count_bpe",
    "text_stats_docs",
    "quality_filter_docs",
    "q1_pricing_summary",
    "q9_product_profit",
    "q18_large_volume_customers",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    names = sys.argv[2:] or SCALE_SENSITIVE

    # Size the single local JVM for the rung before the session is built:
    # the engine default (16g / 32 threads = 0.5 GB/core) is a small-SF
    # test posture, not a production spec — real clusters run 4-8 GB/core,
    # and at sf10 a 0.5 GB/core JVM hits Tungsten's per-task page floor
    # ([AGGREGATE_OUT_OF_MEMORY]) in wide hash aggregations long before
    # any algorithmic limit. Default to min(64g, ~80% of MemAvailable) so
    # smaller hosts don't swap or get OOM-killed; honor an explicit
    # override either way.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{_default_heap_gb()}g")

    import __spark_entry__ as entry
    from healthcare_etl_pipeline_spark.session import get_spark

    # High initial shuffle partitioning + AQE coalescing is the at-scale
    # posture (small stages coalesce back to few tasks; wide aggregations
    # get 8x less per-task state than cores=partitions). At sf10 the
    # 1.5B-row candidate dedup of the prefix join needs it: 32 partitions
    # put ~50M rows of aggregation state on every task simultaneously and
    # even spill() allocations fail ([SPILL_OUT_OF_MEMORY]).
    # storageFraction 0.2: bounded_persist caps cached ENTRIES, not bytes —
    # at sf10 a few GB-scale cached intermediates from earlier queries sit
    # in the eviction-protected half of unified memory and starve the next
    # query's execution pool (prefix join passed standalone, failed mid-
    # drive). A small protected region lets execution evict cache to disk.
    spark = get_spark(
        shuffle_partitions=256,
        extra_conf={"spark.memory.storageFraction": "0.2"},
    )
    qs = entry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    failed = []
    for name in names:
        t0 = time.monotonic()
        try:
            rows = qs[name](spark, sf_dir).count()
            dt = time.monotonic() - t0
            print(f"ok    {name}: {rows} rows [{dt:.1f}s]", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and keep driving
            dt = time.monotonic() - t0
            msg = str(exc).splitlines()[0][:200]
            print(f"FAIL  {name} [{dt:.1f}s]: {msg}", flush=True)
            failed.append(name)
        finally:
            # queries are independent failure probes: drop cached
            # intermediates so one query's persisted frames don't pin the
            # storage pool against the next query's execution memory
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001 — hygiene must not fail a drive
                pass
    print(f"\n{len(names) - len(failed)} ok, {len(failed)} FAIL")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
