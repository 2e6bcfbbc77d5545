"""The warehouse commit log as a FIRST-CLASS Spark data source (Spark 4
Python Data Source API, ``pyspark.sql.datasource``).

``spark.read.format("warehouse_commits")`` scans exactly the committed
snapshot, and ``spark.readStream.format("warehouse_commits")`` turns the
commit log into a streaming source whose OFFSETS ARE SNAPSHOT SEQS — each
microbatch is a half-open seq window of append commits, so Structured
Streaming's own offset checkpointing provides exactly-once consumption
with no separate cursor state (the property the driver-loop consumer in
streaming/cdc.py builds by hand). Works against the same on-disk layout
as :class:`~.warehouse.TransactionalWarehouse`, reading ONLY files and
markers — no warehouse object, no Spark session inside the reader, so
executors can evaluate partitions independently.

Scope contract (documented, asserted where cheap): append-only tables —
a commit carrying ``replaces`` for the table (compaction/rewrite) is
skipped exactly like :meth:`read_changes`; column-mapping renames and
partition-spec epochs are NOT remapped here (use the warehouse reader
for evolved tables). ``branch`` option applies the same ref-visibility
fold as a branch view.

Options: ``root`` (warehouse dir), ``table``, ``schema_ddl`` (required
for non-built-in tables), ``starting_seq`` (default 0), ``branch``.

The SINK side closes the loop: ``writeStream.format("warehouse_commits")``
lands every microbatch as ONE warehouse transaction with
``batch_id = stream-<batchId>`` — idempotent replay, atomic multi-file
publish, visible to readers all-or-nothing (see
:class:`_CommitLogStreamWriter`).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

RUN_ID_COL = "__run_id"


# -- pure manifest-log helpers (file ops only; run anywhere) -----------------


def _read_manifests(root: str) -> list[dict]:
    """Checkpoint + marker tail, sorted by (seq, run_id) — the same fold
    as TransactionalWarehouse._read_manifests, reimplemented over pure
    file ops so reader code needs no warehouse object."""
    txn = os.path.join(root, "_txn")
    commits = os.path.join(txn, "commits")
    if not os.path.isdir(commits):
        return []
    out: list[dict] = []
    covered: set[str] = set()
    try:
        with open(os.path.join(txn, "checkpoint.json"), encoding="utf-8") as fh:
            cp = json.load(fh)
        out = list(cp["manifests"])
        covered = {f"{r}.json" for r in cp["covered"]}
    except (OSError, json.JSONDecodeError, KeyError):
        out, covered = [], set()
    for f in sorted(os.listdir(commits)):
        if f.endswith(".json") and not f.startswith(".") and f not in covered:
            try:
                with open(os.path.join(commits, f), encoding="utf-8") as fh:
                    out.append(json.load(fh))
            except (OSError, json.JSONDecodeError):
                continue
    return sorted(out, key=lambda m: (m.get("seq", 0), m["run_id"]))


def _ref_filter(ms: list[dict], root: str, branch: str | None) -> list[dict]:
    if branch is None:
        return [m for m in ms if not m.get("branch")]
    ref_path = os.path.join(root, "_txn", "refs", f"{branch}.json")
    with open(ref_path, encoding="utf-8") as fh:
        base = int(json.load(fh)["base_seq"])
    return [
        m
        for m in ms
        if (not m.get("branch") and m.get("seq", 0) <= base)
        or m.get("branch") == branch
    ]


def _append_runs(
    root: str, table: str, branch: str | None, lo: int, hi: int
) -> list[tuple[int, str]]:
    """(seq, run_id) of APPEND commits touching ``table`` with
    lo < seq <= hi — rewrites (``replaces``) are skipped, per the
    incremental-scan contract."""
    out = []
    for m in _ref_filter(_read_manifests(root), root, branch):
        seq = m.get("seq", 0)
        if (
            lo < seq <= hi
            and table in m.get("tables", ())
            and not m.get("replaces", {}).get(table)
        ):
            out.append((seq, m["run_id"]))
    return out


def _live_runs(root: str, table: str, branch: str | None) -> list[str]:
    """The committed-live fold (adds, replaces, restores in seq order)."""
    live: set[str] = set()
    for m in _ref_filter(_read_manifests(root), root, branch):
        if table in m.get("tables", ()):
            live.add(m["run_id"])
        live.difference_update(m.get("replaces", {}).get(table, ()))
        live.update(m.get("restores", {}).get(table, ()))
    return sorted(live)


def _max_seq(root: str, branch: str | None) -> int:
    ms = _ref_filter(_read_manifests(root), root, branch)
    return max((m.get("seq", 0) for m in ms), default=0)


def _claimed_seqs(root: str) -> list[int]:
    """Seqs claimed in ``_txn/seqs`` (mirror of the warehouse's
    _claimed_seqs) — the set of seqs that MAY eventually publish a
    marker. Claim precedes marker in the commit protocol, so
    claimed-but-unpublished seqs are in-flight commits (or crash
    holes)."""
    d = os.path.join(root, "_txn", "seqs")
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.endswith(".claim"):
            try:
                out.append(int(f[: -len(".claim")]))
            except ValueError:
                pass
    return out


def _offset_with_holes(root: str, branch: str | None, floor: int) -> dict:
    """Streaming offset that cannot skip an in-flight commit.

    The commit protocol claims seq N (``_txn/seqs``) BEFORE publishing
    the marker, so a later-claimed seq N+1 can become visible first. A
    plain max-seq offset would then consume the window (lo, N+1] and
    the late-published seq-N commit would fall inside an
    already-committed window — skipped forever. Instead the offset
    carries ``holes``: claimed-but-unpublished seqs below the high
    watermark. A hole that later publishes leaves the holes list, and
    :meth:`partitions` emits it as part of the first window that
    observes the fill (``start.holes - end.holes``). A crash hole
    (claim with no marker, committer dead) simply stays a hole — the
    stream never stalls waiting on it. Marker seqs are checked against
    the UNFILTERED log so another ref's commits are never mistaken for
    holes."""
    published = {m.get("seq", 0) for m in _read_manifests(root)}
    hi = max(_max_seq(root, branch), floor)
    holes = sorted(
        s
        for s in _claimed_seqs(root)
        if floor < s <= hi and s not in published
    )
    return {"seq": hi, "holes": holes}


class _RunPartition(InputPartition):
    def __init__(self, run_dir: str):
        self.run_dir = run_dir


def _read_run_batches(run_dir: str, spark_schema: T.StructType) -> Iterator:
    """Arrow batches of one run dir, aligned to the declared schema
    (column order + types); hive partition subdirs are resolved."""
    import pyarrow as pa
    import pyarrow.dataset as ds
    from pyspark.sql.pandas.types import to_arrow_schema

    if not os.path.isdir(run_dir):
        return
    target = to_arrow_schema(spark_schema)
    d = ds.dataset(run_dir, format="parquet", partitioning="hive")
    tbl = d.to_table()
    cols = []
    for f in target:
        if f.name in tbl.column_names:
            cols.append(tbl.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(len(tbl), f.type))
    aligned = pa.table(cols, schema=target)
    yield from aligned.to_batches(max_chunksize=65536)


class _CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options["root"]
        self._table = options["table"]
        self._branch = options.get("branch")
        self._start = int(options.get("starting_seq", 0))

    def initialOffset(self) -> dict:
        return {"seq": self._start, "holes": []}

    def latestOffset(self) -> dict:
        return _offset_with_holes(self._root, self._branch, self._start)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # Normal window: published append commits in (start, end]. Seqs
        # in end.holes have no marker yet, so _append_runs can't (and
        # must not) return them — they are emitted by the FIRST window
        # whose start still lists them as holes and whose end does not
        # (deterministic from the two offsets alone, so a replayed
        # microbatch reproduces exactly the same runs).
        runs = _append_runs(
            self._root, self._table, self._branch, start["seq"], end["seq"]
        )
        filled = sorted(
            set(start.get("holes", ())) - set(end.get("holes", ()))
        )
        if filled:
            fill_set = set(filled)
            for m in _ref_filter(
                _read_manifests(self._root), self._root, self._branch
            ):
                if (
                    m.get("seq", 0) in fill_set
                    and self._table in m.get("tables", ())
                    and not m.get("replaces", {}).get(self._table)
                ):
                    runs.append((m.get("seq", 0), m["run_id"]))
        return [
            _RunPartition(
                os.path.join(
                    self._root, self._table, f"{RUN_ID_COL}={run_id}"
                )
            )
            for _, run_id in sorted(runs)
        ] or [_RunPartition("")]  # empty batch: one no-op partition

    def read(self, partition: _RunPartition) -> Iterator:
        if not partition.run_dir:
            return
        yield from _read_run_batches(partition.run_dir, self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream's own checkpoint

    def stop(self) -> None:
        pass


class _CommitLogBatchReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options["root"]
        self._table = options["table"]
        self._branch = options.get("branch")

    def partitions(self) -> Sequence[InputPartition]:
        runs = _live_runs(self._root, self._table, self._branch)
        return [
            _RunPartition(
                os.path.join(self._root, self._table, f"{RUN_ID_COL}={r}")
            )
            for r in runs
        ] or [_RunPartition("")]

    def read(self, partition: _RunPartition) -> Iterator:
        if not partition.run_dir:
            return
        yield from _read_run_batches(partition.run_dir, self._schema)


class WarehouseCommitsDataSource(DataSource):
    """format name: ``warehouse_commits``."""

    @classmethod
    def name(cls) -> str:
        return "warehouse_commits"

    def schema(self):
        ddl = self.options.get("schema_ddl")
        if ddl:
            # a DDL string: parsed by the engine (no session exists in
            # the data-source worker, so StructType.fromDDL can't run here)
            return ddl
        from healthcare_etl_pipeline_spark.sources.warehouse import (
            TABLE_SCHEMAS,
        )

        table = self.options["table"]
        if table in TABLE_SCHEMAS:
            return TABLE_SCHEMAS[table]
        raise ValueError(
            f"{table!r} is not a built-in table — pass schema_ddl"
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _CommitLogBatchReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool):
        return _CommitLogBatchWriter(schema, dict(self.options), overwrite)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return _CommitLogStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return _CommitLogStreamWriter(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(WarehouseCommitsDataSource)


# -- streaming SINK: each microbatch is one warehouse transaction -------------


class _PendingFiles(WriterCommitMessage):
    def __init__(self, paths: list):
        self.paths = paths


class _StagedParquetWriter:
    """Shared executor/driver halves of the warehouse sink: executors
    stream their partition's rows into a pending parquet file and report
    its path; the driver folds every pending file into ONE warehouse
    transaction. Subclasses adapt this to the batch
    (:class:`_CommitLogBatchWriter`) and streaming
    (:class:`_CommitLogStreamWriter`) writer protocols.

    CHECK constraints are not evaluated on this path (no session exists
    in the sink worker) — enforce upstream or on read for sunk tables.
    """

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._root = options["root"]
        self._table = options["table"]
        self._branch = options.get("branch")
        self._pending = os.path.join(
            self._root, self._table, ".staging", "__stream_pending__"
        )

    # rows per buffered chunk: bounds executor memory to one chunk of
    # Python tuples regardless of partition size (the parquet writer
    # streams row groups to disk)
    CHUNK_ROWS = 65536

    def write(self, iterator) -> "_PendingFiles":
        import itertools
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = to_arrow_schema(self._schema)
        writer = None
        path = None
        try:
            while True:
                rows = [
                    tuple(r)
                    for r in itertools.islice(iterator, self.CHUNK_ROWS)
                ]
                if not rows:
                    break
                cols = list(zip(*rows))
                batch = pa.record_batch(
                    [
                        pa.array(cols[i], type=f.type)
                        for i, f in enumerate(target)
                    ],
                    schema=target,
                )
                if writer is None:
                    os.makedirs(self._pending, exist_ok=True)
                    path = os.path.join(
                        self._pending, f"{uuid.uuid4().hex}.parquet"
                    )
                    writer = pq.ParquetWriter(path, target)
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        return _PendingFiles([path] if path is not None else [])

    def _commit_txn(
        self,
        paths: list,
        run_id: str,
        operation: str,
        *,
        overwrite: bool = False,
    ) -> None:
        """Fold the pending files into ONE warehouse transaction.

        ``run_id`` makes the commit idempotent (a replay into an
        already-committed run_id drops its files and no-ops).
        ``overwrite`` additionally retires every run live on the target
        ref at commit time — atomic truncate-and-load."""
        from healthcare_etl_pipeline_spark.sources.warehouse import (
            TransactionalWarehouse,
        )

        wh = TransactionalWarehouse(None, self._root)
        txn = wh.begin(run_id)
        if self._branch:
            txn.branch = self._branch  # land commits on a ref
        if txn._already_committed:
            # replay after a post-commit crash: drop the re-written
            # pending files, the marker already exists
            self._drop_paths(paths)
            txn.commit()
            return
        if overwrite:
            view = wh.branch(self._branch) if self._branch else wh
            live = view.committed_runs_for(self._table)
            if live:
                txn.replaces[self._table] = live
        stage = txn._stage_dir(self._table)
        os.makedirs(stage, exist_ok=True)
        for i, p in enumerate(paths):
            os.replace(p, os.path.join(stage, f"part-{i:05d}.parquet"))
        if self._table not in txn.staged_tables:
            txn.staged_tables.append(self._table)
        txn.operation = operation
        txn.commit()
        try:  # drop the pending dir when drained (fsck hygiene)
            os.rmdir(self._pending)
        except OSError:
            pass

    @staticmethod
    def _drop_paths(paths: list) -> None:
        for p in paths:
            try:
                os.remove(p)
            except OSError:
                pass


class _CommitLogStreamWriter(_StagedParquetWriter, DataSourceStreamWriter):
    """Exactly-once streaming sink THROUGH the warehouse commit protocol.

    The driver-side ``commit(messages, batchId)`` lands each microbatch
    as one transaction with ``batch_id = stream-<batchId>`` — a retried
    microbatch replays into an already-committed run_id and no-ops (the
    same idempotence contract as every warehouse ingest), and a crash
    before the marker leaves nothing visible. Readers see each
    microbatch atomically or not at all.
    """

    def commit(self, messages, batchId: int) -> None:
        paths = [p for m in messages if m is not None for p in m.paths]
        if not paths:
            # zero-row microbatch: nothing to stage — committing anyway
            # would publish an empty run + manifest per idle trigger,
            # polluting history and the CDC append feed with no-op
            # commits. Replays are safe without a marker: the same
            # batchId replays the same (empty) source window.
            return
        self._commit_txn(paths, f"stream-{batchId}", "stream")

    def abort(self, messages, batchId: int) -> None:
        self._drop_paths(
            [p for m in messages if m is not None for p in m.paths]
        )


class _CommitLogBatchWriter(_StagedParquetWriter, DataSourceWriter):
    """``df.write.format("warehouse_commits")`` — one atomic warehouse
    transaction per save.

    ``mode("append")`` publishes the files as a new append commit;
    ``mode("overwrite")`` additionally retires every previously-live run
    of the table in the SAME commit (atomic truncate-and-load — readers
    see old data or new data, never a mix, and time travel keeps the old
    snapshot addressable). Pass option ``batch_id`` to make retried jobs
    idempotent (same contract as :meth:`TransactionalWarehouse.begin`);
    without it every save is a fresh commit.
    """

    def __init__(
        self, schema: T.StructType, options: dict, overwrite: bool
    ):
        super().__init__(schema, options)
        self._overwrite = overwrite
        self._batch_id = options.get("batch_id")

    def commit(self, messages) -> None:
        import uuid

        paths = [p for m in messages if m is not None for p in m.paths]
        if not paths and not self._overwrite:
            return  # empty append: a no-op, not an empty commit
        run_id = self._batch_id or uuid.uuid4().hex
        self._commit_txn(
            paths,
            run_id,
            "overwrite" if self._overwrite else "batch-write",
            overwrite=self._overwrite,
        )

    def abort(self, messages) -> None:
        self._drop_paths(
            [p for m in messages if m is not None for p in m.paths]
        )
