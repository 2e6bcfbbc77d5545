"""Incremental materialized-view maintenance over a micro-batch stream.

The pattern behind every streaming rollup table: each micro-batch is
reduced to PARTIAL aggregates (count / sum per group — map-side combined,
tiny), then merged into the running view state by key — delta maintenance,
never a recomputation over history. This is what `INSERT INTO ... ON
CONFLICT DO UPDATE` / Delta `MERGE INTO` do in a lakehouse deployment; the
in-engine state here is an eagerly checkpointed DataFrame so lineage stays
flat across arbitrarily many batches (same discipline as the iterative
connected-components / BPE loops).

Durability note: the file source + ``checkpointLocation`` give restartable
progress; production deployments persist the merged state per batch with a
transactional table-format MERGE (Delta/Iceberg — not in this container).
The merge step below is exactly the MERGE's dataframe form, so swapping the
sink is a one-line change in ``process``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class IncrementalAggView:
    """Running (group_cols → count, sum(value_col)) view maintained by
    merging per-batch partial aggregates."""

    def __init__(self, group_cols: list[str], value_col: str):
        self.group_cols = group_cols
        self.value_col = value_col
        self.state: DataFrame | None = None
        self.n_batches = 0

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(self.value_col).alias("value_sum"),
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        part = self._partial(batch_df)
        if self.state is None:
            merged = part
        else:
            s = self.state.alias("s")
            p = part.alias("p")
            cond: Column | None = None
            for c in self.group_cols:
                eq = F.col(f"s.{c}").eqNullSafe(F.col(f"p.{c}"))
                cond = eq if cond is None else cond & eq
            merged = s.join(p, cond, "full_outer").select(
                *[
                    F.coalesce(F.col(f"s.{c}"), F.col(f"p.{c}")).alias(c)
                    for c in self.group_cols
                ],
                (
                    F.coalesce(F.col("s.n"), F.lit(0))
                    + F.coalesce(F.col("p.n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("s.value_sum"), F.lit(0.0))
                    + F.coalesce(F.col("p.value_sum"), F.lit(0.0))
                ).alias("value_sum"),
            )
        # eager checkpoint: state must not chain lineage across batches
        self.state = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def result(self) -> DataFrame:
        if self.state is None:
            raise RuntimeError("no batches processed")
        return self.state


def maintain_incremental_view(
    stream: DataFrame,
    view: IncrementalAggView,
    *,
    checkpoint_dir: str,
) -> None:
    """Drive a bounded (availableNow) stream through the view's merge."""
    q = (
        stream.writeStream.foreachBatch(view.merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
