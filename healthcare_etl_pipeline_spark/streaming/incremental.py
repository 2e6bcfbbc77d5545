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

from pyspark.sql import DataFrame

from healthcare_etl_pipeline_spark.operators.incremental_agg import (
    AggSpec,
    finalize_exprs,
    merge_state,
    partial_exprs,
)


class IncrementalAggView:
    """Running per-group aggregate view maintained by merging per-batch
    partials. Default shape: (group_cols → n, value_sum); pass ``aggs``
    for any mergeable-algebra spec set (min/max/avg/HLL distinct — see
    operators/incremental_agg.py)."""

    def __init__(
        self,
        group_cols: list[str],
        value_col: str,
        aggs: list[AggSpec] | None = None,
    ):
        self.group_cols = group_cols
        self.specs = aggs or [
            AggSpec("n", "count"),
            AggSpec("value_sum", "sum", value_col),
        ]
        self.state: DataFrame | None = None
        self.n_batches = 0

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy(*self.group_cols).agg(
            *partial_exprs(self.specs)
        )

    def merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        merged = merge_state(
            self.state, self._partial(batch_df), self.group_cols, self.specs
        )
        # eager checkpoint: state must not chain lineage across batches
        self.state = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def result(self) -> DataFrame:
        """Finalized view: derived aggregates computed, sketches estimated."""
        if self.state is None:
            raise RuntimeError("no batches processed")
        return self.state.select(*finalize_exprs(self.specs, self.group_cols))


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
