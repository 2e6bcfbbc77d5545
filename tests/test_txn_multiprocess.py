"""Multi-PROCESS committer races: the O_EXCL/conditional-PUT claims must
serialize commits across separate Python processes (separate drivers on a
shared filesystem), not just threads in one interpreter
(tests/test_txn_concurrency.py covers the thread case).

Children never start a JVM: the commit protocol is pure file/metadata
operations, so each child stages its parquet with pyarrow directly into
the transaction's private staging dir and drives begin→publish→claim→
marker for real. The parent then verifies the outcome with Spark reads.

Covers VERDICT r4 "What's missing #2": N-process commit storm on one
warehouse, plus a committer killed between seq-claim and marker (the
crash the protocol tolerates as a harmless sequence hole).
"""

import multiprocessing as mp
import os
from datetime import datetime

import pytest

from healthcare_etl_pipeline_spark.sources.commit_backend import (
    ConditionalPutBackend,
    LocalFSBackend,
)
from healthcare_etl_pipeline_spark.sources.warehouse import (
    TransactionalWarehouse,
)

BACKENDS = {
    "localfs": LocalFSBackend,
    "conditional_put": ConditionalPutBackend,
}


def _stage_with_pyarrow(txn, table: str, row_id: str) -> None:
    """Stage one pipeline_runs row without Spark (child processes must not
    each boot a JVM; the protocol under test is file ops, not the write)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sd = txn._stage_dir(table)
    os.makedirs(sd, exist_ok=True)
    ts = datetime(2026, 1, 1)
    tbl = pa.table(
        {
            "id": pa.array([row_id], pa.string()),
            "pipeline_name": pa.array(["mp"], pa.string()),
            "status": pa.array(["completed"], pa.string()),
            "started_at": pa.array([ts], pa.timestamp("us")),
            "completed_at": pa.array([ts], pa.timestamp("us")),
            "input_record_count": pa.array([1], pa.int64()),
            "output_record_count": pa.array([1], pa.int64()),
            "errors": pa.array([None], pa.string()),
            "dag_definition": pa.array([None], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(sd, "part-00000.parquet"))
    if table not in txn.staged_tables:
        txn.staged_tables.append(table)


def _commit_worker(root, backend_name, batch_id, mode, barrier, q):
    """One committer process. mode: 'commit' | 'kill_after_claim'.

    Two barrier phases, per the begin() contract (warehouse.py): the
    retry-wipe in begin(batch_id) is CRASH recovery and must not race a
    live same-batch peer's in-flight staging — so all processes finish
    begin() before any stages; the commit race itself is then driven
    concurrently, which is the protocol under test. Timeouts are generous:
    a spawned child pays the full pyspark import before its first wait,
    >60s under co-located test load."""
    wh = TransactionalWarehouse(None, root, backend=BACKENDS[backend_name]())
    txn = wh.begin(batch_id)
    barrier.wait(timeout=240)  # every begin() done before any stage
    _stage_with_pyarrow(txn, "pipeline_runs", f"row-{batch_id}-{os.getpid()}")
    barrier.wait(timeout=240)  # all committers hit commit() together
    if mode == "kill_after_claim":
        # replicate commit() up to the claim, then die hard: data
        # published, seq claimed, NO marker — must stay invisible forever
        for table in sorted(txn.staged_tables):
            wh.backend.publish_dir(
                txn._stage_dir(table), wh.run_dir(table, txn.run_id)
            )
        wh._claim_seq(txn.run_id)
        os._exit(9)
    q.put((batch_id, txn.commit()))


def _run_storm(root, backend_name, batches, kill_batches=()):
    ctx = mp.get_context("spawn")
    all_ids = list(batches) + list(kill_batches)
    barrier = ctx.Barrier(len(all_ids))
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_commit_worker,
            args=(
                root,
                backend_name,
                bid,
                "kill_after_claim" if bid in kill_batches else "commit",
                barrier,
                q,
            ),
        )
        for bid in all_ids
    ]
    [p.start() for p in procs]
    [p.join(timeout=300) for p in procs]
    commits: list[tuple[str, bool]] = []
    while not q.empty():
        commits.append(q.get())
    # keyed by process index: batch ids may repeat (same-batch storms)
    exit_codes = {
        f"{bid}#{i}": p.exitcode
        for i, (bid, p) in enumerate(zip(all_ids, procs))
    }
    return commits, exit_codes


@pytest.fixture(params=sorted(BACKENDS))
def backend_name(request):
    return request.param


def test_process_storm_distinct_batches(spark, tmp_path, backend_name):
    root = str(tmp_path / "wh")
    TransactionalWarehouse(None, root).create_all()
    batches = [f"mp{i}" for i in range(5)]
    commits, codes = _run_storm(root, backend_name, batches)
    assert all(c == 0 for c in codes.values()), codes
    assert dict(commits) == {b: True for b in batches}

    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    snaps = wh.snapshots()
    seqs = [s["seq"] for s in snaps]
    assert sorted(seqs) == list(range(1, 6))  # strict, gap-free total order
    assert wh.read("pipeline_runs").count() == 5
    # every snapshot prefix is a stable read
    for i, s in enumerate(snaps, start=1):
        assert wh.read("pipeline_runs", as_of=s["seq"]).count() == i


def test_process_storm_same_batch_exactly_once(spark, tmp_path, backend_name):
    """4 processes race to commit the SAME batch_id: exactly one marker,
    exactly one row, regardless of which process published the data."""
    root = str(tmp_path / "wh")
    TransactionalWarehouse(None, root).create_all()
    commits, codes = _run_storm(root, backend_name, ["dup"] * 4)
    assert all(c == 0 for c in codes.values()), codes
    # exactly ONE process reports the winning commit; peers lose gracefully
    assert sum(1 for _, ok in commits if ok) == 1, commits

    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    assert wh.read("pipeline_runs").count() == 1
    snaps = wh.snapshots()
    # exactly one snapshot; losers' claimed seqs are harmless holes, so
    # the winning seq may be any of 1..4
    assert len(snaps) == 1 and 1 <= snaps[0]["seq"] <= 4
    # markers: exactly one, for 'dup'
    assert wh.is_committed("dup")


def test_killed_between_claim_and_marker(spark, tmp_path, backend_name):
    """One committer dies between seq-claim and marker: its seq becomes a
    hole readers never see, its data stays invisible, fsck flags the run
    as an orphan, and vacuum reclaims it."""
    root = str(tmp_path / "wh")
    TransactionalWarehouse(None, root).create_all()
    live = [f"ok{i}" for i in range(3)]
    commits, codes = _run_storm(
        root, backend_name, live, kill_batches=["victim"]
    )
    assert codes["victim#3"] == 9
    assert dict(commits) == {b: True for b in live}

    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    seqs = sorted(s["seq"] for s in wh.snapshots())
    assert len(seqs) == 3 and len(set(seqs)) == 3
    # the victim's claimed seq is a hole: claimed but in NO marker
    holes = set(wh._claimed_seqs()) - set(seqs)
    assert len(holes) == 1 and set(seqs) | holes == {1, 2, 3, 4}
    assert wh.read("pipeline_runs").count() == 3  # victim's row invisible
    report = wh.fsck()
    assert "victim" in report.get("pipeline_runs", {}).get("orphans", [])
    wh.vacuum()
    assert not os.path.isdir(wh.run_dir("pipeline_runs", "victim"))
    assert wh.read("pipeline_runs").count() == 3  # reads stable throughout

    # and a post-crash retry of the victim batch lands it cleanly
    t = wh.begin("victim")
    _stage_with_pyarrow(t, "pipeline_runs", "row-victim-retry")
    assert t.commit() is True
    assert wh.read("pipeline_runs").count() == 4


# -- branch refs under multi-process races ------------------------------------


def _branch_worker(root, backend_name, action, name, barrier, q):
    wh = TransactionalWarehouse(None, root, backend=BACKENDS[backend_name]())
    barrier.wait(timeout=240)
    if action == "create":
        try:
            wh.create_branch(name)
            q.put(("created", True))
        except ValueError:
            q.put(("created", False))
    elif action == "commit":
        view = wh.branch(name)
        txn = view.begin()
        _stage_with_pyarrow(
            txn, "pipeline_runs", f"row-{name}-{os.getpid()}"
        )
        q.put(("committed", txn.commit()))
    elif action == "merge":
        from healthcare_etl_pipeline_spark.sources.warehouse import (
            BranchConflictError,
        )

        try:
            q.put(("merged", wh.merge_branch(name)["merged"]))
        except BranchConflictError:
            q.put(("merged", False))
    elif action == "union_merge":
        from healthcare_etl_pipeline_spark.sources.warehouse import (
            BranchConflictError,
        )

        try:
            q.put(
                (
                    "merged",
                    wh.merge_branch(name, strategy="union")["merged"],
                )
            )
        except BranchConflictError:
            q.put(("merged", False))


def _run_branch_race(root, backend_name, actions):
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(len(actions))
    q = ctx.Queue()
    procs = [
        ctx.Process(
            target=_branch_worker,
            args=(root, backend_name, act, name, barrier, q),
        )
        for act, name in actions
    ]
    [p.start() for p in procs]
    [p.join(timeout=300) for p in procs]
    out = []
    while not q.empty():
        out.append(q.get())
    assert all(p.exitcode == 0 for p in procs)
    return out


def test_branch_create_race_one_winner(spark, tmp_path, backend_name):
    """4 processes race create_branch('dev'): the ref is one conditional
    PUT, so exactly one wins — on both backends."""
    root = str(tmp_path / "wh")
    TransactionalWarehouse(None, root).create_all()
    results = _run_branch_race(
        root, backend_name, [("create", "dev")] * 4
    )
    assert sum(1 for _, ok in results if ok) == 1, results
    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    assert wh.list_branches() == ["dev"]


def test_branch_commit_storm_isolated_from_main(spark, tmp_path, backend_name):
    """4 processes commit concurrently onto one branch: strict seq order
    on the shared chain, all rows visible on the branch, ZERO on main."""
    root = str(tmp_path / "wh")
    boot = TransactionalWarehouse(None, root, backend=BACKENDS[backend_name]())
    boot.create_all()
    boot.create_branch("dev")
    results = _run_branch_race(
        root, backend_name, [("commit", "dev")] * 4
    )
    assert [ok for _, ok in results] == [True] * 4
    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    assert wh.read("pipeline_runs").count() == 0
    dev = wh.branch("dev")
    assert dev.read("pipeline_runs").count() == 4
    seqs = [s["seq"] for s in dev.snapshots()]
    assert len(seqs) == len(set(seqs)) == 4
    assert wh.fsck() == {}


def test_concurrent_merge_is_idempotent(spark, tmp_path, backend_name):
    """Two processes race merge_branch of the same branch. The merge
    commit carries pure set verbs (restores/replaces), so even the
    both-pass-the-conflict-check interleaving converges: the fold applies
    the same sets twice. Final main state equals the branch tip either
    way, and reads stay consistent."""
    root = str(tmp_path / "wh")
    boot = TransactionalWarehouse(None, root, backend=BACKENDS[backend_name]())
    boot.create_all()
    boot.create_branch("dev")
    view = boot.branch("dev")
    txn = view.begin("devwork")
    _stage_with_pyarrow(txn, "pipeline_runs", "row-dev")
    assert txn.commit()
    results = _run_branch_race(root, backend_name, [("merge", "dev")] * 2)
    assert sum(1 for _, ok in results if ok) >= 1, results
    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    assert wh.read("pipeline_runs").count() == 1
    assert wh.fsck() == {}


def test_union_merge_storm_of_diverged_branches(spark, tmp_path, backend_name):
    """3 processes race UNION merges of 3 different branches while main
    has advanced since every fork: merges must converge to the row union
    (each side's appends exactly once), with zero lost or doubled runs —
    the divergent-merge equivalent of the commit storm."""
    root = str(tmp_path / "wh")
    boot = TransactionalWarehouse(None, root, backend=BACKENDS[backend_name]())
    boot.create_all()
    txn = boot.begin("main-pre")
    _stage_with_pyarrow(txn, "pipeline_runs", "row-main-pre")
    assert txn.commit()
    names = [f"d{i}" for i in range(3)]
    for n in names:
        boot.create_branch(n)
        view = boot.branch(n)
        txn = view.begin(f"{n}-work")
        _stage_with_pyarrow(txn, "pipeline_runs", f"row-{n}")
        assert txn.commit()
    txn = boot.begin("main-post")  # main diverges AFTER every fork
    _stage_with_pyarrow(txn, "pipeline_runs", "row-main-post")
    assert txn.commit()

    results = _run_branch_race(
        root, backend_name, [("union_merge", n) for n in names]
    )
    assert [ok for _, ok in results] == [True] * 3, results
    wh = TransactionalWarehouse(spark, root, backend=BACKENDS[backend_name]())
    rows = sorted(r.id for r in wh.read("pipeline_runs").collect())
    assert rows == sorted(
        ["row-main-pre", "row-main-post"] + [f"row-{n}" for n in names]
    )
    assert wh.fsck() == {}, wh.fsck()
