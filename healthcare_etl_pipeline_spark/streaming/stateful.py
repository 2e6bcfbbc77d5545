"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in windowed aggregations
can't express: arbitrary per-key state machines. Demonstrated here as a
per-user running-totals accumulator (count, sum, last event time) — chosen
because its end-of-stream state has an exact batch-SQL equivalent, which
makes the operator oracle-checkable.

Scale notes:
- State lives in the state store partitioned by the grouping key: memory
  scales with |keys|, not event rate.
- A GroupStateTimeout (processing/event time) is how production jobs retire
  idle keys; the bounded test stream keeps NoTimeout for determinism.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts_micros bigint"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: "GroupState",  # noqa: F821 (runtime type from pyspark)
) -> Iterator[pd.DataFrame]:
    """Fold a micro-batch of one user's events into running totals."""
    if state.exists:
        n, total, last_ts_micros = state.get
    else:
        n, total, last_ts_micros = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            micros = int(batch_max.value // 1000)  # pandas Timestamp → µs
            last_ts_micros = (
                micros if last_ts_micros is None else max(last_ts_micros, micros)
            )
    state.update((n, total, last_ts_micros if last_ts_micros is not None else 0))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [pd.Timestamp(last_ts_micros * 1000) if last_ts_micros else pd.NaT],
        }
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an arbitrary-state streaming operator.

    Emits the updated totals for every user seen in each micro-batch
    (output mode "update"); after a bounded ``availableNow`` run the final
    emission per user equals the batch ``groupBy(user).agg(...)`` — the
    oracle relation.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
