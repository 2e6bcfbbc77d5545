"""Graph centrality over relational edge lists: PageRank as an iterative
DataFrame job.

Complements the transitive-closure operator (connected_components in
operators/dedup.py) with the other classic iterative graph kernel. Same
scale discipline as every iterative operator here:

- The edge list never moves: each round is one join (ranks ⋈ edges on the
  source key) + one map-side-combined groupBy of rank mass per target.
- Ranks are ``localCheckpoint``-ed eagerly per round — flat lineage, no
  plan blow-up with iteration count.
- Deterministic up to float addition order; consumers round (the oracle
  check rounds to 6 dp, far above the ~1e-12 reassociation noise of
  thousands-of-term sums).

Dangling nodes (no out-edges) would leak rank mass; callers either build
closed graphs (e.g. bidirectional edges, as the registered query does) or
accept the leak as the standard "random surfer teleports" reading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over a (src, dst) edge list: ``iters`` synchronous rounds
    from the uniform distribution.

    rank'(v) = (1-d)/N + d · Σ_{u→v} rank(u) / outdeg(u)

    Returns (node, rank) — rank unrounded; round at the consumer.
    """
    e = edges.select(src_col, dst_col).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col(src_col).alias("node"))
        .union(e.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy(src_col).agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            ranks.join(e, ranks["node"] == e[src_col])
            .join(outdeg, src_col)
            .select(
                F.col(dst_col).alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
