"""Restartable CDC consumption of the transactional warehouse.

Closes the loop the reference's README frames as "an HTTP event triggers a
micro-batch" (reference README.md:49): committed writes to a warehouse
table become an incremental change feed (``TransactionalWarehouse.
read_changes``), and a derived aggregate view is maintained from the
deltas — never recomputed from history — with exactly-once semantics end
to end.

The design has NO separate cursor file to keep consistent with the data:
**the consumer's own transactional commits are the checkpoint**. Each sync
commits the merged view under ``batch_id = <prefix>__<lo>__<hi>`` where
(lo, hi] is the processed source-seq window; the cursor is recovered by
parsing the committed run_ids. Consequences:

- Crash AFTER the view commit, before anything else: restart re-derives
  ``lo = hi`` from the log — the window is never reprocessed.
- Crash BEFORE the commit: nothing was published, the window replays.
- Replay of an already-committed window (two drivers, a stale retry): the
  batch_id-keyed commit is idempotent — exactly one publish ever wins.
There is no instant at which the view and the cursor can disagree,
because they are the same write.

If ``vacuum`` expired part of an unconsumed window, ``read_changes``
raises :class:`IncrementalWindowExpiredError`; :func:`cdc_sync` then falls
back to a FULL REFRESH from the current snapshot (committed as
``<prefix>__refresh__<hi>``) — the same recovery Iceberg consumers
perform after snapshot expiry, made explicit instead of silently losing
the gap.

Scale shape: each sync reads only the changed runs (partition-pruned at
file-listing time), reduces them to per-group partials (map-side
combined), and full-outer-merges against the current view — cost
proportional to the CHANGE plus the view, never to source history.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from healthcare_etl_pipeline_spark.operators.incremental_agg import (
    AggSpec,
    merge_state,
    non_empty_filter,
    partial_exprs,
    signed_partial_exprs,
    supports_incremental_apply,
)
from healthcare_etl_pipeline_spark.sources.warehouse import (
    IncrementalWindowExpiredError,
    NonAppendChangeError,
    TransactionalWarehouse,
)

_WINDOW_RE = re.compile(r"^(?P<prefix>.+)__(?:(?P<lo>\d+)|refresh)__(?P<hi>\d+)$")


def cdc_cursor(wh: TransactionalWarehouse, prefix: str) -> int:
    """Highest source seq already folded into the view: recovered from the
    consumer's own committed run_ids (the log IS the checkpoint)."""
    hi = 0
    for run_id in wh.committed_run_ids():
        m = _WINDOW_RE.match(run_id)
        if m and m.group("prefix") == prefix:
            hi = max(hi, int(m.group("hi")))
    return hi


def source_watermark(wh: TransactionalWarehouse, source_table: str) -> int:
    """Highest committed seq that touched ``source_table`` (the view's own
    commits don't advance the source watermark). A merge-on-read delete
    stages only the table's TOMBSTONE sidecar, yet logically changes the
    table — it advances the watermark too, so a trailing delete is synced
    without waiting for the next append."""
    tomb = wh._tombstone_table(source_table)

    def _touches(entry: dict) -> bool:
        if source_table in entry.get("tables", ()) or tomb in entry.get(
            "tables", ()
        ):
            return True
        # a branch MERGE adopts runs via restores/replaces without
        # staging data of its own — it logically changes the table and
        # must advance the watermark (the strict appends feed then
        # raises and the net-feed path applies the adopted rows).
        # Rollback keeps its documented skip-until-refresh contract and
        # compaction stays a non-event, so only merge commits count.
        if entry.get("operation") == "merge_branch":
            for verb in ("restores", "replaces"):
                if source_table in entry.get(verb, {}) or tomb in entry.get(
                    verb, {}
                ):
                    return True
        return False

    # Cap at the published FRONTIER (every claimed seq below it has a
    # marker): a committer claims its seq before publishing, so a
    # later-claimed seq can become visible first — an uncapped max-seq
    # watermark would close a window over the still-unpublished seq and
    # the late commit's rows would never be folded into the view. A
    # crashed claimant stalls the feed until clear_stale_claims; data
    # reads are unaffected.
    frontier = wh.published_frontier()
    return max(
        (e["seq"] for e in wh.history() if _touches(e) and e["seq"] <= frontier),
        default=0,
    )


def default_aggs(value_col: str) -> list[AggSpec]:
    """The historical (n, value_sum) view shape, as algebra specs."""
    return [AggSpec("n", "count"), AggSpec("value_sum", "sum", value_col)]


def merge_partials(
    state: DataFrame | None,
    partial: DataFrame,
    group_cols: list[str],
    aggs: list[AggSpec] | None = None,
) -> DataFrame:
    """Full-outer delta merge of per-group partials — the DataFrame form
    of ``MERGE INTO``, delegating per-aggregate merge expressions to the
    mergeable algebra (operators/incremental_agg.py). Default specs keep
    the historical (n, value_sum) shape."""
    return merge_state(
        state, partial, group_cols, aggs or default_aggs("value")
    )


def _partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    aggs: list[AggSpec] | None = None,
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        *partial_exprs(aggs or default_aggs(value_col))
    )


def _publish_view(
    wh: TransactionalWarehouse,
    view_table: str,
    merged: DataFrame,
    batch_id: str,
) -> bool:
    """Commit ``merged`` as the NEW view state: the commit's ``replaces``
    retires every previous view run in the same marker rename, so readers
    flip from old state to new atomically (and never see both)."""
    old_runs = wh.committed_runs_for(view_table)
    txn = wh.begin(batch_id, operation="cdc-sync")
    if txn._already_committed:
        return False  # this exact window already published (idempotent)
    try:
        txn.stage(merged, view_table)
    except Exception:
        txn.abort()
        raise
    txn.replaces[view_table] = old_runs
    return txn.commit()


def cdc_sync_once(
    wh: TransactionalWarehouse,
    source_table: str,
    view_table: str,
    *,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
) -> tuple[int, int] | None:
    """Fold one incremental window of ``source_table`` changes into the
    ``view_table`` aggregate. Returns the processed (lo, hi] window, or
    None when the view is already current.

    ``aggs`` selects the maintained aggregates (default: count + sum of
    ``value_col``); any mergeable-algebra spec works, including HLL
    approx-distinct whose binary sketch state round-trips through the
    view table's parquet.

    Exactly-once: the window is derived from committed consumer run_ids
    and published under a window-keyed batch_id — see module docstring.
    """
    prefix = prefix or f"cdc_{source_table}_{view_table}"
    specs = aggs or default_aggs(value_col)
    lo = cdc_cursor(wh, prefix)
    hi = source_watermark(wh, source_table)
    if hi <= lo:
        return None
    changes = wh.read_changes(source_table, since=lo, until=hi)
    partial = _partial(changes, group_cols, value_col, specs)
    state = (
        wh.read(view_table) if wh.committed_runs_for(view_table) else None
    )
    merged = merge_partials(state, partial, group_cols, specs)
    _publish_view(wh, view_table, merged, f"{prefix}__{lo}__{hi}")
    return (lo, hi)


def cdc_apply_feed_once(
    wh: TransactionalWarehouse,
    source_table: str,
    view_table: str,
    *,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
) -> tuple[int, int] | None:
    """Fold one window of NET row-level changes (``read_change_feed``:
    insert / delete / update_preimage / update_postimage) into the view
    by SIGNED addition — the true-incremental path for windows containing
    updates/deletes/merges that the appends-only fold must reject.

    Legal only for invertible algebras (count/sum/avg — guard with
    :func:`supports_incremental_apply`); deletes subtract the preimage,
    updates subtract the preimage and add the postimage, and groups
    retracted to zero rows are dropped, so the result is exactly what a
    recomputation from the ``hi`` snapshot would produce. Cost stays
    proportional to the CHURN plus the view — never source history.
    Exactly-once bookkeeping is identical to :func:`cdc_sync_once` (the
    window-keyed view commit IS the checkpoint).
    """
    from pyspark.sql import functions as F  # local: keep module header slim

    prefix = prefix or f"cdc_{source_table}_{view_table}"
    specs = aggs or default_aggs(value_col)
    if not supports_incremental_apply(specs):
        raise ValueError(
            "cdc_apply_feed_once needs an invertible aggregate algebra —"
            " use cdc_full_refresh for min/max/approx_distinct views"
        )
    lo = cdc_cursor(wh, prefix)
    hi = source_watermark(wh, source_table)
    if hi <= lo:
        return None
    feed = wh.read_change_feed(source_table, since=lo, until=hi)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    partial = feed.groupBy(*group_cols).agg(
        *signed_partial_exprs(specs, sign)
    )
    state = (
        wh.read(view_table) if wh.committed_runs_for(view_table) else None
    )
    merged = merge_state(state, partial, group_cols, specs).filter(
        non_empty_filter(specs)
    )
    _publish_view(wh, view_table, merged, f"{prefix}__{lo}__{hi}")
    return (lo, hi)


def cdc_full_refresh(
    wh: TransactionalWarehouse,
    source_table: str,
    view_table: str,
    *,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
) -> int:
    """Rebuild the view from the CURRENT source snapshot — the recovery
    path after the incremental window expired (vacuum past an unconsumed
    compaction). Commits as ``<prefix>__refresh__<hi>`` so the cursor
    advances to ``hi`` atomically with the rebuilt state."""
    prefix = prefix or f"cdc_{source_table}_{view_table}"
    hi = source_watermark(wh, source_table)
    merged = _partial(wh.read(source_table), group_cols, value_col, aggs)
    _publish_view(wh, view_table, merged, f"{prefix}__refresh__{hi}")
    return hi


def cdc_sync_enriched_once(
    wh: TransactionalWarehouse,
    fact_table: str,
    dim_table: str,
    view_table: str,
    *,
    join_key: str,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
) -> tuple[int, int] | None:
    """Incrementally maintain an ENRICHED aggregate view: fact-table
    changes joined to a dimension, then folded into per-group state —
    the fact⋈dim shape of incremental view maintenance.

    Sound under this warehouse's semantics because both tables are
    append-only and multi-table commits are atomic: Δ(F ⋈ D) over an
    append-only dimension is ΔF ⋈ D_current whenever facts only ever
    reference dimension rows committed no later than themselves (the
    referential pattern an atomic multi-table ingest produces). Each
    sync therefore joins ONLY the fact delta — cost ∝ change, with the
    dimension side broadcast/pruned like any dim join — never a rescan
    of fact history. Exactly-once bookkeeping is identical to
    :func:`cdc_sync_once` (the view commit IS the checkpoint).

    Caveat: a fact whose dimension row is missing at sync time is
    DROPPED by the inner join, so this maintainer requires the
    atomic-ingest referential pattern above; when orphan facts are
    possible, group on the raw key instead and join the dimension at
    read time.
    """
    from pyspark.sql import functions as F  # local: keep module header slim

    prefix = prefix or f"cdc_{fact_table}_{dim_table}_{view_table}"
    specs = aggs or default_aggs(value_col)
    lo = cdc_cursor(wh, prefix)
    hi = source_watermark(wh, fact_table)
    if hi <= lo:
        return None
    changes = wh.read_changes(fact_table, since=lo, until=hi)
    dim = wh.read(dim_table)
    enriched = changes.join(F.broadcast(dim), join_key)
    partial = enriched.groupBy(*group_cols).agg(*partial_exprs(specs))
    state = (
        wh.read(view_table) if wh.committed_runs_for(view_table) else None
    )
    merged = merge_state(state, partial, group_cols, specs)
    _publish_view(wh, view_table, merged, f"{prefix}__{lo}__{hi}")
    return (lo, hi)


def cdc_sync_enriched(
    wh: TransactionalWarehouse,
    fact_table: str,
    dim_table: str,
    view_table: str,
    *,
    join_key: str,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
    max_rounds: int = 1000,
) -> int:
    """Drain all pending fact changes into the enriched view."""
    rounds = 0
    for _ in range(max_rounds):
        window = cdc_sync_enriched_once(
            wh,
            fact_table,
            dim_table,
            view_table,
            join_key=join_key,
            group_cols=group_cols,
            value_col=value_col,
            prefix=prefix,
            aggs=aggs,
        )
        if window is None:
            return rounds
        rounds += 1
    return rounds


def cdc_sync(
    wh: TransactionalWarehouse,
    source_table: str,
    view_table: str,
    *,
    group_cols: list[str],
    value_col: str,
    prefix: str | None = None,
    aggs: list[AggSpec] | None = None,
    max_rounds: int = 1000,
) -> int:
    """Drain all pending source changes into the view (poll-until-current).

    Non-append windows (merge/update/overwrite rewrites, MoR deletes)
    are applied INCREMENTALLY from the NET row-level change feed whenever
    the aggregate algebra is invertible and the table has a primary key —
    deletes subtract, updates subtract-then-add, cost ∝ churn. Full
    refresh remains only for (a) non-invertible algebras (min/max/HLL —
    removing the max needs state the view discarded) and (b) expired
    windows (vacuumed past an unconsumed rewrite), where NO feed exists.
    Returns the number of sync rounds performed."""
    specs = aggs or default_aggs(value_col)
    rounds = 0
    for _ in range(max_rounds):
        try:
            window = cdc_sync_once(
                wh,
                source_table,
                view_table,
                group_cols=group_cols,
                value_col=value_col,
                prefix=prefix,
                aggs=specs,
            )
        except NonAppendChangeError:
            # Branch-merge windows always FULL-REFRESH: when the view and
            # its cursor were maintained on the branch and merged along
            # with the source, the adopted source runs are already folded
            # — but they surface in the merge window's net feed (they
            # become live on MAIN only at the merge seq), so a signed
            # apply would double-count them. A refresh from the current
            # snapshot is correct in both directions (already-folded:
            # idempotent content; never-folded: picks the rows up).
            _lo = cdc_cursor(wh, prefix or f"cdc_{source_table}_{view_table}")
            _hi = source_watermark(wh, source_table)
            merge_window = any(
                e.get("operation") == "merge_branch"
                and _lo < e["seq"] <= _hi
                for e in wh.history()
            )
            # other logical (non-append) changes: true-incremental apply
            # from the NET change feed when the algebra admits subtraction
            if (
                not merge_window
                and supports_incremental_apply(specs)
                and wh._primary_keys.get(source_table)
            ):
                try:
                    window = cdc_apply_feed_once(
                        wh,
                        source_table,
                        view_table,
                        group_cols=group_cols,
                        value_col=value_col,
                        prefix=prefix,
                        aggs=specs,
                    )
                    if window is None:
                        return rounds
                    rounds += 1
                    continue
                except IncrementalWindowExpiredError:
                    pass  # feed inputs vacuumed — refresh below
            cdc_full_refresh(
                wh,
                source_table,
                view_table,
                group_cols=group_cols,
                value_col=value_col,
                prefix=prefix,
                aggs=specs,
            )
            rounds += 1
            continue
        except IncrementalWindowExpiredError:
            # vacuumed past an unconsumed window: no feed can be derived —
            # the always-correct recovery is a rebuild from the current
            # snapshot (works for every algebra, including min/max/HLL)
            cdc_full_refresh(
                wh,
                source_table,
                view_table,
                group_cols=group_cols,
                value_col=value_col,
                prefix=prefix,
                aggs=specs,
            )
            rounds += 1
            continue
        if window is None:
            return rounds
        rounds += 1
    return rounds
