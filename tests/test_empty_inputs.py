"""Degenerate-input robustness: every operator family must survive EMPTY
tables (schema-correct, zero rows) without raising — the local stand-in for
the empty partitions / empty date-slices a 100 TB run hits constantly.

Queries should return cleanly with zero (or their defined degenerate)
rows; an operator that crashes on empty input would kill a whole job at
scale for one empty slice.
"""

import os

import pytest

from healthcare_etl_pipeline_spark.catalog import SCHEMAS
from healthcare_etl_pipeline_spark.queries import all_queries

# one representative per operator family
REPRESENTATIVES = [
    "q1_pricing_summary",
    "top_orders_per_customer",
    "asof_join_purchase_click",
    "sessionize_events",
    "retention_cohorts",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "segment_dedup_docs",
    "text_stats_docs",
    "temperature_mix_docs",
    "hll_distinct_users",
    "cosine_topk_bruteforce",
    "kmeans_embeddings",
    "semantic_dedup_embeddings",
    "dedup_embedding_lsh",
    "interval_overlap_orders",
    "lsh_eval_pr_docs",
    "corpus_prep_pipeline",
    "audio_decode_wav",
    "video_frame_sample_y4m",
    "ann_lsh_cosine",
    "ann_lsh_recall_contract",
    "ann_ivf_cosine",
    "txn_time_travel_read",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for name, schema in SCHEMAS.items():
        spark.createDataFrame([], schema).write.parquet(
            os.path.join(str(d), f"{name}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    spec = all_queries()[name]
    df = spec.fn(spark, empty_sf_dir)
    rows = df.collect()  # must not raise; row count is query-defined
    assert isinstance(rows, list)
