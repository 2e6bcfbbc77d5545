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


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "n bigint, start_us bigint, last_us bigint"


def make_session_update_fn(gap_us: int):
    """Build the per-key update function for stateful sessionization.

    Semantics (matching the batch lag+cumsum definition):
    - events of one user are folded in (ts, event_id) order; a gap STRICTLY
      greater than ``gap_us`` closes the current session and starts a new one;
    - CLOSED sessions (a later event proved the gap) are emitted immediately
      — append semantics, each session exactly once;
    - the still-open last session is kept in state with an EVENT-TIME
      timeout at session_end (= last_ts + gap): when the watermark passes
      it, the key fires ``hasTimedOut``, the open session is emitted, and
      the state is removed — idle keys retire instead of living forever.
    """

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: "GroupState",  # noqa: F821
    ) -> Iterator[pd.DataFrame]:
        def session_frame(sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": [pd.Timestamp(s * 1000) for s, _, _ in sessions],
                    "session_end": [
                        pd.Timestamp((l + gap_us) * 1000) for _, l, _ in sessions
                    ],
                    "n_events": [n for _, _, n in sessions],
                }
            )

        if state.hasTimedOut:
            n, start_us, last_us = state.get
            state.remove()
            yield session_frame([(start_us, last_us, n)])
            return

        batch = pd.concat(list(pdfs))
        batch = batch.sort_values(["ts", "event_id"])
        # normalize to ns first: the Arrow exchange may hand datetime64[us]
        ts_us = (
            batch["ts"].astype("datetime64[ns]").astype("int64") // 1000
        ).to_numpy()

        if state.exists:
            n, start_us, last_us = state.get
        else:
            first = int(ts_us[0])
            n, start_us, last_us = 0, first, first

        closed: list[tuple[int, int, int]] = []  # (start_us, last_us, n)
        for t in ts_us:
            t = int(t)
            if t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            n += 1
            last_us = max(last_us, t)
        state.update((n, start_us, last_us))
        # retire this key once the watermark passes the open session's end
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        yield session_frame(closed)

    return _update


def stateful_session_windows(events: DataFrame, *, gap: str = "30 minutes") -> DataFrame:
    """Custom stateful sessionization with event-time key retirement.

    The ``applyInPandasWithState`` counterpart of the native
    ``session_window`` aggregation, for when per-session logic outgrows an
    aggregate (custom merge rules, per-session emissions, side effects).
    Requires a watermark on ``events`` (EventTimeTimeout reads it).

    Bounded-run contract (the oracle): after an ``availableNow`` run over a
    single-batch source, the emitted rows are exactly the batch
    sessionization MINUS each user's final session (still open in state; a
    longer-lived stream retires it via timeout — exercised in tests with a
    multi-batch source).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_update_fn(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
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
