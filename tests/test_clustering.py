"""Differential test: Spark k-means vs a NumPy reference of the identical
algorithm (same deterministic seeding, same tie-breaks, same iteration
count) on the real embeddings table."""

import numpy as np
import pytest

from healthcare_etl_pipeline_spark.catalog import load_table
from healthcare_etl_pipeline_spark.operators.clustering import kmeans_assign

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(ids, X, k, iters):
    order = np.argsort(ids)
    cents = X[order[:k]].astype(np.float64)
    for _ in range(iters):
        d = ((X[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes first minimum = same tie-break
        for i in range(k):
            if (assign == i).any():
                cents[i] = X[assign == i].astype(np.float64).mean(axis=0)
    d = ((X[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float32)

    out = {r.vec_id: r for r in kmeans_assign(emb, k=4, iters=3).collect()}
    ref_assign, ref_dist = _numpy_kmeans(ids, X, k=4, iters=3)

    mismatches = 0
    for i, vid in enumerate(ids):
        r = out[int(vid)]
        if r.cluster != int(ref_assign[i]):
            mismatches += 1
        else:
            assert r.dist_sq == pytest.approx(float(ref_dist[i]), abs=1e-4)
    # float summation order may flip exact-tie assignments; none expected on
    # real-valued embeddings, but tolerate a stray ulp-tie just in case
    assert mismatches <= len(ids) * 0.01

    # every cluster id in range, all docs assigned
    assert len(out) == len(ids)
    assert all(0 <= r.cluster < 4 for r in out.values())


def test_semantic_dedup_subset_of_exact_and_recall(spark):
    from healthcare_etl_pipeline_spark.operators.clustering import semantic_dedup
    from healthcare_etl_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = semantic_dedup(emb, k=4, dim=64, iters=3, threshold=0.2).collect()
    n_total = emb.count()
    assert len(out) == n_total  # full-corpus image, one row per vector

    dropped = {r.vec_id for r in out if not r.is_kept}
    exact_pairs = cosine_near_dup_pairs(emb, dim=64, threshold=0.2).collect()
    exact_dropped = {r.dup_id for r in exact_pairs}

    # within-cluster pairs ⊂ all pairs ⇒ dropped ⊆ exact-dropped
    assert dropped <= exact_dropped
    # and the clusters should still catch a meaningful share of the dups
    if exact_dropped:
        recall = len(dropped) / len(exact_dropped)
        assert recall >= 0.5, f"semantic dedup recall too low: {recall:.2f}"
