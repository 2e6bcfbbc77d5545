"""Mergeable-aggregate algebra for incremental view maintenance.

Generalizes the count/sum-only delta merge used by the CDC consumer
(streaming/cdc.py) and the streaming rollup view
(streaming/incremental.py) to the full family of aggregates that admit
partial/merge/finalize decomposition over APPEND-ONLY input:

==================  ==========================  =========================
kind                partial (per batch)         merge (state ⊎ partial)
==================  ==========================  =========================
``count``           count(*)                    ``+``
``sum``             sum(col)                    ``+``
``min`` / ``max``   min/max(col)                least/greatest (null-skip)
``approx_distinct`` hll_sketch_agg(col)         hll_union (null-guarded)
``avg``             sum(col) + count(*)         both ``+``; finalize ÷
==================  ==========================  =========================

min/max are mergeable here precisely because the feeds are append-only
(a transactional-warehouse change feed or a file stream) — with
retractions they would need full recomputation, which is why engines
call these "insert-only materialized views".

``approx_distinct`` rides Spark's HyperLogLog sketch columns
(``hll_sketch_agg`` / ``hll_union`` / ``hll_sketch_estimate``, public
since Spark 3.5): the state stores the mergeable binary register set, so
distinct counting stays O(registers) per group across arbitrarily many
increments — never a re-scan of history. Estimates are engine-specific;
value-checked queries should emit them through the accuracy-contract
pattern (exact + within-tolerance boolean), as ``approx_distinct_users``
does.

All three phases are plain Column expressions — whole-stage-codegen'd,
no UDFs — and the merge is one full-outer join per increment, cost
proportional to |state| + |delta|.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KINDS = ("count", "sum", "min", "max", "approx_distinct", "avg")


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: ``kind`` over ``col`` (ignored for
    count), surfaced as ``name``."""

    name: str
    kind: str
    col: str | None = None

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown aggregate kind {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"aggregate {self.name!r} ({self.kind}) needs a col")


def _state_fields(spec: AggSpec) -> list[tuple[str, str]]:
    """(state_column, role) pairs backing one spec. avg stores sum+count."""
    if spec.kind == "avg":
        return [(f"{spec.name}__sum", "sum"), (f"{spec.name}__n", "count")]
    return [(spec.name, spec.kind)]


def partial_exprs(specs: list[AggSpec]) -> list[Column]:
    """Aggregate expressions reducing one increment to its partial state
    (use inside ``groupBy(...).agg(*partial_exprs(specs))``)."""
    out: list[Column] = []
    for spec in specs:
        for state_col, role in _state_fields(spec):
            if role == "count":
                out.append(F.count(F.lit(1)).alias(state_col))
            elif role == "sum":
                out.append(F.sum(F.col(spec.col).cast("double")).alias(state_col))
            elif role == "min":
                out.append(F.min(spec.col).alias(state_col))
            elif role == "max":
                out.append(F.max(spec.col).alias(state_col))
            elif role == "approx_distinct":
                out.append(F.hll_sketch_agg(spec.col).alias(state_col))
    return out


#: aggregate kinds with an INVERSE — a retraction (deleted/pre-update row)
#: can be SUBTRACTED from the state, so a NET row-level change feed applies
#: incrementally. min/max/approx_distinct are not invertible (removing the
#: current max needs the runner-up, which the state discarded) and fall
#: back to full refresh.
INVERTIBLE_KINDS = ("count", "sum", "avg")


def supports_incremental_apply(specs: list[AggSpec]) -> bool:
    """True iff a NET change feed (insert/delete/update_pre/postimage)
    can maintain these aggregates by signed addition alone. Requires a
    count-role state field: a group whose rows were ALL retracted must be
    DROPPED from the view (a recomputation would not emit it), and only a
    row count can witness emptiness."""
    return all(s.kind in INVERTIBLE_KINDS for s in specs) and any(
        role == "count" for s in specs for _, role in _state_fields(s)
    )


def signed_partial_exprs(specs: list[AggSpec], sign: Column) -> list[Column]:
    """Signed form of :func:`partial_exprs` for NET change-feed rows:
    ``sign`` is +1 for insert/update_postimage, -1 for delete/
    update_preimage, so the group's partial is the net delta — count adds
    the signs, sum adds sign·value. Only invertible kinds are legal."""
    out: list[Column] = []
    for spec in specs:
        for state_col, role in _state_fields(spec):
            if role == "count":
                out.append(F.sum(sign).alias(state_col))
            elif role == "sum":
                out.append(
                    F.sum(sign * F.col(spec.col).cast("double")).alias(
                        state_col
                    )
                )
            else:
                raise ValueError(
                    f"aggregate kind for {state_col!r} is not invertible —"
                    " guard with supports_incremental_apply()"
                )
    return out


def non_empty_filter(specs: list[AggSpec]) -> Column:
    """Predicate keeping only groups with surviving rows after a signed
    merge (count-role state > 0) — retracted-to-empty groups disappear
    from the view exactly as a recomputation would drop them."""
    for spec in specs:
        for state_col, role in _state_fields(spec):
            if role == "count":
                return F.col(state_col) > 0
    raise ValueError("no count-role state field to witness emptiness")


def _merge_one(role: str, s: Column, p: Column) -> Column:
    if role in ("count", "sum"):
        zero = F.lit(0) if role == "count" else F.lit(0.0)
        return F.coalesce(s, zero) + F.coalesce(p, zero)
    if role == "min":
        return F.least(s, p)  # least/greatest skip nulls
    if role == "max":
        return F.greatest(s, p)
    # approx_distinct: hll_union rejects null input, so guard both sides
    return (
        F.when(s.isNull(), p).when(p.isNull(), s).otherwise(F.hll_union(s, p))
    )


def merge_state(
    state: DataFrame | None,
    partial: DataFrame,
    group_cols: list[str],
    specs: list[AggSpec],
) -> DataFrame:
    """Full-outer delta merge of partial state into running state — the
    DataFrame form of ``MERGE INTO`` for mergeable aggregates."""
    if state is None:
        return partial
    s = state.alias("s")
    p = partial.alias("p")
    cond: Column | None = None
    for c in group_cols:
        eq = F.col(f"s.{c}").eqNullSafe(F.col(f"p.{c}"))
        cond = eq if cond is None else cond & eq
    cols = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"p.{c}")).alias(c) for c in group_cols
    ]
    for spec in specs:
        for state_col, role in _state_fields(spec):
            cols.append(
                _merge_one(
                    role, F.col(f"s.{state_col}"), F.col(f"p.{state_col}")
                ).alias(state_col)
            )
    return s.join(p, cond, "full_outer").select(*cols)


def finalize_exprs(specs: list[AggSpec], group_cols: list[str]) -> list[Column]:
    """User-facing projection of the state: derived aggregates (avg) are
    computed, sketches are estimated, everything else passes through."""
    out: list[Column] = [F.col(c) for c in group_cols]
    for spec in specs:
        if spec.kind == "avg":
            out.append(
                (F.col(f"{spec.name}__sum") / F.col(f"{spec.name}__n")).alias(
                    spec.name
                )
            )
        elif spec.kind == "approx_distinct":
            out.append(F.hll_sketch_estimate(spec.name).alias(spec.name))
        else:
            out.append(F.col(spec.name))
    return out
