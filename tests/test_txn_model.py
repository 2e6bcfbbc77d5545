"""Model-based randomized testing of the transactional warehouse: a
seeded random walk over append / merge / overwrite_where / compact /
optimize / rollback, checked after EVERY operation against a pure-Python
reference model of the table state and its snapshot history.

This is the cross-operation interaction coverage unit tests can't reach:
a rollback landing after a compaction that followed a merge that rewrote
an overwritten run, etc. Any divergence between the warehouse read and
the model — rows lost, duplicated, or resurrected — fails immediately
with the op trace.
"""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), True),
    ]
)
KEYS = range(20)
N_OPS = 12


def _df(spark, rows):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in rows], SCHEMA)


def _read_state(wh):
    out = {}
    for r in wh.read("kv").collect():
        assert r["k"] not in out, f"duplicate key {r['k']} in read"
        out[r["k"]] = r["v"]
    return out


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_random_walk_matches_reference_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    wh = TransactionalWarehouse(spark, str(tmp_path / f"model_wh_{seed}"))
    wh.register_table("kv", SCHEMA)
    wh.create_all()

    state: dict[int, int] = {}
    history: dict[int, dict[int, int]] = {}  # seq -> state copy
    trace: list[str] = []
    counter = 0

    def snap():
        seqs = wh.snapshots()
        if seqs:
            history[seqs[-1]["seq"]] = dict(state)

    for _ in range(N_OPS):
        op = rng.choice(
            ["append", "append", "merge", "overwrite", "compact", "optimize",
             "rollback"]
        )
        counter += 1
        if op == "append":
            # fresh keys only (append does not deduplicate)
            fresh = [k for k in KEYS if k not in state]
            ks = rng.sample(fresh, min(len(fresh), rng.randint(1, 4)))
            if not ks:
                continue
            rows = [(k, counter) for k in ks]
            wh.append(_df(spark, rows), "kv")
            state.update(dict(rows))
            trace.append(f"append{ks}")
        elif op == "merge":
            ks = rng.sample(list(KEYS), rng.randint(1, 4))
            rows = [(k, counter) for k in ks]
            wh.merge(_df(spark, rows), "kv", ["k"])
            state.update(dict(rows))
            trace.append(f"merge{ks}")
        elif op == "overwrite":
            lo = rng.randint(0, 15)
            hi = lo + rng.randint(1, 5)
            kept = [k for k in range(lo, hi + 1) if rng.random() < 0.5]
            rows = [(k, counter) for k in kept]
            wh.overwrite_where(
                _df(spark, rows), "kv", F.col("k").between(lo, hi)
            )
            for k in range(lo, hi + 1):
                state.pop(k, None)
            state.update(dict(rows))
            trace.append(f"overwrite[{lo},{hi}]->{kept}")
        elif op == "compact":
            wh.compact("kv")
            trace.append("compact")
        elif op == "optimize":
            wh.optimize("kv", zorder_by=("k", "v"))
            trace.append("optimize")
        elif op == "rollback":
            if not history:
                continue
            to = rng.choice(sorted(history))
            wh.rollback("kv", to)
            state = dict(history[to])
            trace.append(f"rollback->{to}")
        snap()
        got = _read_state(wh)
        assert got == state, f"divergence after {' | '.join(trace)}"

    # end-of-walk maintenance must not change the current read
    wh.vacuum(dead_run_retention_sec=3600.0)
    assert _read_state(wh) == state, f"vacuum changed state after {trace}"


@pytest.mark.parametrize("seed", [3, 41, 77])
def test_random_walk_extended_verbs(spark, tmp_path, seed):
    """Random walk over the LATE round-4 verb set — update_where,
    merge-on-read delete, metadata-only column rename, partition-spec
    toggling — interleaved with the original verbs, checked against the
    reference model after every op. Rollback restores the data AND
    tombstone tables to the same snapshot so the model's state-copy
    semantics hold across deletes."""
    rng = random.Random(seed)
    wh = TransactionalWarehouse(spark, str(tmp_path / f"model2_wh_{seed}"))
    wh.register_table("kv", SCHEMA, primary_key=("k",))
    wh.create_all()

    val_col = "v"  # current logical name of the value column

    def mk_df(rows):
        return spark.createDataFrame(
            [Row(k=k, **{val_col: v}) for k, v in rows],
            T.StructType(
                [
                    T.StructField("k", T.LongType(), False),
                    T.StructField(val_col, T.LongType(), True),
                ]
            ),
        )

    def read_state():
        out = {}
        for r in wh.read("kv").collect():
            assert r["k"] not in out, f"duplicate key {r['k']} in read"
            out[r["k"]] = r[val_col]
        return out

    state: dict[int, int] = {}
    history: dict[int, dict[int, int]] = {}
    trace: list[str] = []
    counter = 0

    def snap():
        seqs = wh.snapshots()
        if seqs:
            history[seqs[-1]["seq"]] = dict(state)

    for _ in range(N_OPS):
        op = rng.choice(
            ["append", "merge", "update", "delete", "rename", "spec",
             "compact", "rollback"]
        )
        counter += 1
        if op == "append":
            fresh = [k for k in KEYS if k not in state]
            ks = rng.sample(fresh, min(len(fresh), rng.randint(1, 4)))
            if not ks:
                continue
            rows = [(k, counter) for k in ks]
            wh.append(mk_df(rows), "kv")
            state.update(dict(rows))
            trace.append(f"append{ks}")
        elif op == "merge":
            ks = rng.sample(list(KEYS), rng.randint(1, 4))
            rows = [(k, counter) for k in ks]
            wh.merge(mk_df(rows), "kv", ["k"])
            state.update(dict(rows))
            trace.append(f"merge{ks}")
        elif op == "update":
            m, r = rng.randint(2, 5), rng.randint(0, 1)
            wh.update_where(
                "kv", F.col("k") % m == r, {val_col: F.col(val_col) + 1000}
            )
            for k in state:
                if k % m == r:
                    state[k] += 1000
            trace.append(f"update(k%{m}=={r})")
        elif op == "delete":
            if not state:
                continue
            ks = rng.sample(sorted(state), min(len(state), rng.randint(1, 3)))
            wh.delete_where("kv", F.col("k").isin(ks))
            for k in ks:
                state.pop(k, None)
            trace.append(f"delete{ks}")
        elif op == "rename":
            new = f"v{counter}"
            wh.rename_column("kv", val_col, new)
            val_col = new
            trace.append(f"rename->{new}")
        elif op == "spec":
            cur = wh.partition_columns("kv")
            new_spec = () if cur else ("k",)
            wh.set_partition_spec("kv", new_spec)
            trace.append(f"spec->{new_spec}")
        elif op == "compact":
            wh.compact("kv")
            trace.append("compact")
        elif op == "rollback":
            if not history:
                continue
            to = rng.choice(sorted(history))
            cur_seq = wh.snapshots()[-1]["seq"]
            # renames/specs are table METADATA shared by all snapshots —
            # rolling back data must not un-rename; roll data+tombstones
            wh.rollback("kv", to)
            try:
                wh.rollback("__tomb_kv", to)
            except Exception:
                pass  # tombstone table may have no runs at `to`
            state = dict(history[to])
            # model keys whose values predate metadata updates: the
            # snapshot copy already reflects value state at `to`
            trace.append(f"rollback {cur_seq}->{to}")
        snap()
        got = read_state()
        assert got == state, f"divergence after {' | '.join(trace)}"

    wh.vacuum(dead_run_retention_sec=3600.0)
    assert read_state() == state, f"vacuum changed state after {trace}"


@pytest.mark.parametrize("seed", [11, 57, 123])
def test_random_walk_with_branches(spark, tmp_path, seed):
    """Dual-state random walk: ops land on MAIN or on a live BRANCH, the
    model tracks both states independently, and merge attempts are
    verified against the fast-forward rule — conflict iff main touched
    the table after the fork; on success main adopts the branch state
    atomically and the walk re-forks. Reads of BOTH refs are checked
    against their model after every op (branch isolation in both
    directions is the invariant unit tests can't stress across op
    interleavings)."""
    from healthcare_etl_pipeline_spark.sources.warehouse import (
        BranchConflictError,
    )

    rng = random.Random(seed)
    wh = TransactionalWarehouse(spark, str(tmp_path / f"br_wh_{seed}"))
    wh.register_table("kv", SCHEMA)
    wh.create_all()
    wh.append(_df(spark, [(0, 0), (1, 0)]), "kv")

    def read_state(handle):
        out = {}
        for r in handle.read("kv").collect():
            assert r["k"] not in out
            out[r["k"]] = r["v"]
        return out

    epoch = 0
    dev = wh.create_branch(f"dev{epoch}")
    main_state = {0: 0, 1: 0}
    branch_state = dict(main_state)
    main_dirty = False
    trace: list[str] = []
    counter = 0

    def apply_op(handle, state, tag):
        nonlocal counter
        counter += 1
        op = rng.choice(["append", "merge", "overwrite", "compact"])
        if op == "append":
            fresh = [k for k in KEYS if k not in state]
            ks = rng.sample(fresh, min(len(fresh), rng.randint(1, 3)))
            if not ks:
                return False
            rows = [(k, counter) for k in ks]
            handle.append(_df(spark, rows), "kv")
            state.update(dict(rows))
            trace.append(f"{tag}:append{ks}")
            return True
        elif op == "merge":
            ks = rng.sample(list(KEYS), rng.randint(1, 3))
            rows = [(k, counter) for k in ks]
            handle.merge(_df(spark, rows), "kv", ["k"])
            state.update(dict(rows))
            trace.append(f"{tag}:merge{ks}")
            return True
        elif op == "overwrite":
            lo = rng.randint(0, 15)
            hi = lo + rng.randint(1, 4)
            kept = [k for k in range(lo, hi + 1) if rng.random() < 0.5]
            rows = [(k, counter) for k in kept]
            handle.overwrite_where(
                _df(spark, rows), "kv", F.col("k").between(lo, hi)
            )
            for k in range(lo, hi + 1):
                state.pop(k, None)
            state.update(dict(rows))
            trace.append(f"{tag}:overwrite[{lo},{hi}]")
            return True
        else:
            handle.compact("kv")
            trace.append(f"{tag}:compact")
            return True

    branch_committed = False
    for _ in range(14):
        side = rng.choice(["main", "branch", "branch", "try_merge"])
        if side == "main":
            main_dirty |= bool(apply_op(wh, main_state, "main"))
        elif side == "branch":
            branch_committed |= bool(apply_op(dev, branch_state, "dev"))
        else:
            trace.append(
                f"try_merge(dirty={main_dirty},committed={branch_committed})"
            )
            if main_dirty and branch_committed:
                # fast-forward rule: main advanced on a table the branch
                # also touched -> refuse
                with pytest.raises(BranchConflictError):
                    wh.merge_branch(f"dev{epoch}")
            else:
                rep = wh.merge_branch(f"dev{epoch}")
                assert rep["merged"] == branch_committed, (rep, trace)
                if rep["merged"]:
                    main_state = dict(branch_state)
                # re-fork (a merged branch can't fast-forward again)
                wh.delete_branch(f"dev{epoch}")
                epoch += 1
                dev = wh.create_branch(f"dev{epoch}")
                branch_state = dict(main_state)
                main_dirty = False
                branch_committed = False
        assert read_state(wh) == main_state, (
            f"MAIN diverged after {' | '.join(trace)}"
        )
        assert read_state(dev) == branch_state, (
            f"BRANCH diverged after {' | '.join(trace)}"
        )

    # maintenance respects both refs
    wh.vacuum(dead_run_retention_sec=3600.0)
    assert read_state(wh) == main_state, trace
    assert read_state(dev) == branch_state, trace
