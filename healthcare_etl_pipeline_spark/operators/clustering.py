"""K-means clustering over embedding columns (Lloyd's algorithm) — corpus
clustering for diversity analysis / cluster-balanced sampling of training
data (the SemDeDup / cluster-then-sample family).

Spark shape — the iterative-algorithm discipline shared with
connected-components and BPE training:

- The CORPUS never moves: each round is one scan of the (checkpointed)
  embedding frame + one map-side-combined groupBy of per-cluster sums.
- Only the k centroids cross the driver boundary per round (k × dim
  floats — same class of driver traffic as BPE's single winning pair).
  They return to the plan as INLINED LITERAL arithmetic: per-cluster
  squared-L2 distance is an explicit 64-term expression, so assignment
  runs in whole-stage codegen — no UDF, no broadcast join, no shuffle on
  the assignment side.
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


def _dist_sq(vec_col: Column, centroid: list[float], dim: int) -> Column:
    """Squared L2 distance to a literal centroid — explicit sum, codegen."""
    term: Column | None = None
    for j in range(dim):
        d = F.element_at(vec_col, j + 1).cast("double") - F.lit(float(centroid[j]))
        t = d * d
        term = t if term is None else term + t
    assert term is not None
    return term


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
        dists = [
            _dist_sq(F.col(vec_col), c, dim).alias(f"d{i}")
            for i, c in enumerate(cents)
        ]
        with_d = base.select(F.col(id_col), F.col(vec_col), *dists)
        best = F.least(*[F.col(f"d{i}") for i in range(len(cents))])
        cluster: Column = F.lit(len(cents) - 1)
        for i in range(len(cents) - 2, -1, -1):
            cluster = F.when(F.col(f"d{i}") == best, F.lit(i)).otherwise(cluster)
        return with_d.select(
            F.col(id_col),
            F.col(vec_col),
            cluster.alias("cluster"),
            best.alias("dist_sq"),
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
