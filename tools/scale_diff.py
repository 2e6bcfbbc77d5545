#!/usr/bin/env python
"""Digest-based value differential for the BIG scale-ladder rungs.

``tools/check_oracle.py`` collects both engines' full results into the
driver — the right gate at sf0.01, impossible at sf10+ for multi-million
row outputs (ORACLE_SF01.md had to exclude ``dedup_exact_lineitem`` and
could only rows-check the window/sessionize families at sf100). This
tool compares ENGINE-SIDE digests instead (operators/fingerprint.py):
each side reduces its result to ≤256 ``(bucket, count, sum-of-rowhash)``
rows, so a 591 M-row result costs one distributed aggregation and a
256-row driver compare. Equal digests ⇒ equal row multisets up to
mod-p hash collision; the digest mechanism itself is full-value-gated at
sf0.01 via the ``digest_*`` registry queries.

Per query it prints ``ok name rows=N [t_spark/t_duck]`` or a FAIL with
the first differing buckets; queries whose result schema has no portable
canonicalization (float arrays, maps) report ``skip`` with the reason —
the ladder docs must list them with a rationale, not drop them silently.

Usage:  python tools/scale_diff.py SF_DIR [query ...]
        (no names -> every registered query with an oracle)
Env:    SPARK_GRAFT_DUCK_MEM  caps DuckDB memory when co-hosted with a
        large Spark heap (same knob as check_oracle).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from healthcare_etl_pipeline_spark.catalog import TABLES, table_path
from healthcare_etl_pipeline_spark.operators.fingerprint import (
    digest_sql,
    table_digest,
)
from healthcare_etl_pipeline_spark.queries import all_queries
from healthcare_etl_pipeline_spark.session import get_spark


# The big-rung digest family list (the "32 families" of ORACLE_SF01.md's
# round-8 section, +ANN/embedding families once the float-array canon
# landed). Codified so the rung is reproducible: `--rung` selects it.
# Excluded with rationale (ORACLE_SF01.md "Remaining oracle-cost
# exclusions"): leakage_safe_split_docs (oracle recursive CC is
# clique-quadratic; value-matched at sf1), corpus_prep_pipeline at sf100
# only (DuckDB temp > 49 GB).
RUNG_FAMILIES = [
    # relational / analytics
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "rollup_order_volume",
    "cube_part_stats",
    "sql_interface_revenue_rank",
    "exact_percentiles",
    "approx_percentiles_value",
    "top_orders_per_customer",
    "set_ops_customers",
    "pivot_event_counts",
    "unpivot_part_measures",
    # events / windows / sessions
    "window_frame_functions",
    "session_window_users",
    "sessionize_events",
    "rolling_event_features",
    "rolling_active_users_events",
    "zscore_outlier_events",
    "retention_cohorts",
    "funnel_view_purchase",
    "resample_gapfill_events",
    "range_join_purchase_window",
    # documents / LLM prep
    "dedup_exact_lineitem",
    "dedup_exact_docs",
    "text_stats_docs",
    "quality_filter_docs",
    "heavy_hitter_tokens",
    "pack_sequences_docs",
    "hash_sample_docs",
    "hash_split_docs",
    "stratified_sample_docs",
    "weighted_sample_docs",
    "shuffle_shards_docs",
    # SQL front end (same text in both engines)
    "sql_interface_recursive_tree",
    "sql_interface_lateral_topk",
    "sql_interface_grouping_filter",
    # feature-store point-in-time join (round 9)
    "pit_feature_join_events",
    # export / interchange + training sampling + reporting (round 9)
    "warc_export_roundtrip",
    "contrastive_negatives_docs",
    "data_card_sources",
    # digest-canon self-gates
    "digest_lineitem",
    "digest_dedup_exact_lineitem",
    # embeddings / ANN (float-array canon, round 9)
    "digest_embeddings",
    "cosine_topk_bruteforce",
    "ann_ivf_cosine",
    "ann_lsh_cosine",
]


# Excluded from --wide (full-registry) big-rung drives, with rationale —
# oracle-side cost or synthetic-data shape, never engine limits
# (ORACLE_SF01.md):
#   leakage_safe_split_docs: the DuckDB oracle's recursive connected-
#   components is clique-quadratic; value-matched at sf1.
#   ann_ivfpq_recall_contract: tools/make_sf1.py builds big-rung
#   embeddings by TILING the 2,000 sf0.1 vectors (ANN cost scales with
#   count; vectors unchanged), so every probe has ~100 exact copies in
#   the corpus and even the deliberately-obsolete quantizer scores
#   recall 1.0 — the query's "drift must fire" assertion is vacuously
#   unreachable on tiled data. Value-checked at sf0.001/0.01/0.1 where
#   vectors are unique.
WIDE_EXCLUSIONS = {"leakage_safe_split_docs", "ann_ivfpq_recall_contract"}


def main() -> int:
    args = sys.argv[1:]
    if "--rung" in args:
        args.remove("--rung")
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(RUNG_FAMILIES)
    elif "--wide" in args:
        # the round-9 full-registry sweep: EVERY registered query rides
        # the digest differential at the given rung, not just the curated
        # RUNG_FAMILIES — chunk with explicit names for parallel drives.
        args.remove("--wide")
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(all_queries()) - WIDE_EXCLUSIONS
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        only = set(args[1:])

    spark = get_spark()
    con = duckdb.connect()
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if duck_mem:
        con.execute(f"SET memory_limit='{duck_mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )

    specs = all_queries()
    names = [n for n in sorted(specs) if not only or n in only]
    n_pass = n_fail = n_skip = 0
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            print(f"skip  {name}: no oracle")
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
        except Exception:
            # Including TypeError: a TypeError raised by the query
            # function itself is a real defect, not "undigestable".
            print(f"FAIL  {name}: SPARK PLAN ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        try:
            sdig = table_digest(sdf)
        except TypeError as e:
            # table_digest raises TypeError only for column types with
            # no portable canonicalization — a benign skip by contract.
            print(f"skip  {name}: undigestable ({e})")
            n_skip += 1
            continue
        except Exception:
            print(f"FAIL  {name}: SPARK PLAN ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        try:
            srows = {(r.bucket, r.n, r.s) for r in sdig.collect()}
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        t1 = time.time()
        try:
            cols = [
                (r[0], r[1])
                for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            ]
            osql = digest_sql(spec.oracle, cols)
        except TypeError as e:
            print(f"skip  {name}: undigestable oracle ({e})")
            n_skip += 1
            continue
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB DESCRIBE ERROR {e}")
            n_fail += 1
            continue
        try:
            orows = {tuple(r) for r in con.execute(osql).fetchall()}
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {e}")
            n_fail += 1
            continue
        t2 = time.time()
        total_s = sum(n for _, n, _ in srows)
        total_o = sum(n for _, n, _ in orows)
        if srows == orows:
            print(
                f"ok    {name}: rows={total_s} "
                f"[spark {t1 - t0:.1f}s / duck {t2 - t1:.1f}s]"
            )
            n_pass += 1
        else:
            diff_s = sorted(srows - orows)[:3]
            diff_o = sorted(orows - srows)[:3]
            print(
                f"FAIL  {name}: digest mismatch rows spark={total_s} "
                f"duck={total_o} spark_only={diff_s} duck_only={diff_o}"
            )
            n_fail += 1
    print(f"\n{n_pass} ok, {n_skip} skip, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
