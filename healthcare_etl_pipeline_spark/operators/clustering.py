"""K-means clustering over embedding columns (Lloyd's algorithm) — corpus
clustering for diversity analysis / cluster-balanced sampling of training
data (the SemDeDup / cluster-then-sample family).

Spark shape — the iterative-algorithm discipline shared with
connected-components and BPE training:

- The CORPUS never moves: each round is one scan of the (checkpointed)
  embedding frame + one map-side-combined groupBy of per-cluster sums.
- Only the k centroids cross the driver boundary per round (k × dim
  floats — same class of driver traffic as BPE's single winning pair).
  They return to the plan inside an Arrow-batched numpy kernel: per-batch
  the k×dim distance matrix is vectorized across rows while accumulating
  LEFT-TO-RIGHT over dimensions — bit-identical IEEE doubles to a scalar
  ``(x-c)²`` fold, so results match the SQL oracle's list_reduce and the
  NumPy differential reference exactly. (The previous form inlined k·dim
  literal subtraction terms into one projection; at k=8, dim=64 that is a
  ~1500-node expression whole-stage codegen re-COMPILES every iteration —
  Janino compile time dominated the whole job, 6 compiles ≈ 45 s for 500
  rows. Assignment is map-only either way; the kernel keeps it that way
  without the per-iteration JIT bill.)
- Deterministic: centroids initialize from the k smallest ids, each
  round's assignment breaks distance ties by cluster index (least() takes
  the first minimum), and convergence is by fixed iteration count — same
  result on any cluster size or partitioning.

Exact SQL oracle-ability: float summation order inside avg() differs
between engines, and near-tie assignments could flip on 1-ulp distance
differences — so the registered query is rows-only and correctness is
pinned by a differential test against a NumPy reference implementation
(tests/test_clustering.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.cache import bounded_persist


def _assign_kernel(cents: list[list[float]], dim: int):
    """Arrow-batched assignment: struct(cluster, dist_sq) per vector.

    Distances accumulate left-to-right over dimensions (vectorized across
    the batch axis only), so every double is bit-identical to a scalar
    ``Σ (x_j - c_j)²`` fold — the property the kmeans_embeddings oracle
    (DuckDB list_reduce) and the NumPy differential test rely on. argmin
    takes the FIRST minimum, the same tie-break as an ascending when-chain.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf("struct<cluster: int, dist_sq: double>")
    def _assign(vec):
        if len(vec) == 0:
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int32"),
                    "dist_sq": pd.Series([], dtype="float64"),
                }
            )
        X = np.asarray(list(vec), dtype=np.float64)  # float32 widened exactly
        D = np.empty((X.shape[0], C.shape[0]), dtype=np.float64)
        for i in range(C.shape[0]):
            acc = np.zeros(X.shape[0], dtype=np.float64)
            for j in range(dim):
                d = X[:, j] - C[i, j]
                acc = acc + d * d  # left-to-right over dims: fold parity
            D[:, i] = acc
        cl = D.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": cl.astype("int32"),
                "dist_sq": D[np.arange(len(cl)), cl],
            }
        )

    return _assign


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    dim: int = 64,
    iters: int = 5,
) -> DataFrame:
    """Lloyd's k-means: ``iters`` rounds from a deterministic seed
    (embeddings of the ``k`` smallest ids), returning the final assignment
    (id, cluster, dist — squared L2, rounded 6 dp).
    """
    base = df.select(F.col(id_col), F.col(vec_col)).transform(bounded_persist)

    seed_rows = (
        base.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids: list[list[float]] = [list(r[0]) for r in seed_rows]
    if not centroids:
        # empty corpus (or an empty slice at scale): the assignment image
        # is empty too — return it with the contract schema instead of
        # letting least()/when() choke on zero centroid columns
        return base.select(
            F.col(id_col),
            F.lit(0).alias("cluster"),
            F.lit(0.0).alias("dist_sq"),
        )

    def assign(cents: list[list[float]]) -> DataFrame:
        kernel = _assign_kernel(cents, dim)
        return base.select(
            F.col(id_col), F.col(vec_col), kernel(F.col(vec_col)).alias("__a")
        ).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("__a.cluster").alias("cluster"),
            F.col("__a.dist_sq").alias("dist_sq"),
        )

    for _ in range(iters):
        assigned = assign(centroids)
        new_rows = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.avg(F.element_at(F.col(vec_col), j + 1)).alias(f"m{j}")
                    for j in range(dim)
                ]
            )
            .collect()
        )
        by_cluster = {r["cluster"]: [r[f"m{j}"] for j in range(dim)] for r in new_rows}
        # a cluster that lost all members keeps its previous centroid
        centroids = [by_cluster.get(i, centroids[i]) for i in range(k)]

    final = assign(centroids)
    return final.select(
        id_col, "cluster", F.round("dist_sq", 6).alias("dist_sq")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 8,
    dim: int = 64,
    iters: int = 5,
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): k-means the embedding space, then
    search for near-duplicate pairs ONLY within each cluster — the exact
    cosine re-rank runs on an equi-join keyed by cluster id, never on the
    full corpus cross product.

    Greedy survivor rule (same contract as the MinHash family): any id with
    a smaller-id partner at cosine ≥ ``threshold`` in its cluster is
    dropped. Output: (id, cluster, is_kept) for every input row.

    Scale posture: the quadratic term shrinks from n² to Σ|cluster|² — with
    balanced clusters a k-fold reduction that tightens as k grows; the
    cluster key also gives AQE a skew-split handle that the unkeyed BNLJ
    form cannot have. Cross-cluster near-dups are missed by construction
    (SemDeDup's documented recall trade) — the pytest suite measures that
    recall against the exact form.
    """
    from healthcare_etl_pipeline_spark.operators.similarity import cosine_fold

    assigned = (
        kmeans_assign(df, id_col, vec_col, k=k, dim=dim, iters=iters)
        .select(id_col, "cluster")
        .join(df.select(id_col, vec_col), id_col)
        .transform(bounded_persist)  # one pass feeds both join sides
    )
    a = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("a_vec"),
    )
    b = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("dup_id"),
        F.col(vec_col).alias("b_vec"),
    )
    dups = (
        a.join(b, "cluster")
        .where(F.col("keep_id") < F.col("dup_id"))
        .withColumn("cos_sim", cosine_fold(F.col("a_vec"), F.col("b_vec"), dim))
        .where(F.col("cos_sim") >= threshold)
        .select("dup_id")
        .distinct()
    )
    return (
        assigned.join(
            dups.withColumnRenamed("dup_id", id_col).withColumn(
                "__dup", F.lit(True)
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("is_kept"),
        )
    )
