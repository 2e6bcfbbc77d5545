"""Warehouse: the 5 reference tables as partitioned Parquet directories.

Re-expresses the reference's PostgreSQL schema (reference:
app/models/patient.py — patients :34-52, consent_records :58-76,
clinical_records :82-99, audit_log :105-116, pipeline_runs :122-136) and the
DDL bootstrap (app/main.py:30-32 `create_all`).

Physical design for 100 TB (SURVEY.md §1.4):
- `clinical_records` partitioned by `resource_type` — replaces the reference's
  ix_clinical_resource_type index (patient.py:97) with partition pruning.
- `audit_log` partitioned by `dt = date(timestamp)` — replaces
  ix_audit_timestamp (patient.py:116); appends land in today's partition.
- `patients` unpartitioned (point lookups by id/mrn ride parquet min/max +
  dictionary filters); mrn uniqueness is enforced by the ingest anti-join
  (operators/ingest.py), not the store.
- run counts are LongType, deliberately fixing the reference's String(16)
  oddity (patient.py:133-134).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PATIENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("encrypted_name", T.StringType(), False),
        T.StructField("encrypted_dob", T.StringType(), True),
        T.StructField("encrypted_ssn", T.StringType(), True),
        T.StructField("mrn", T.StringType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

CONSENT_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("consent_type", T.StringType(), False),
        T.StructField("granted", T.BooleanType(), False),
        T.StructField("granted_at", T.TimestampType(), True),
        T.StructField("revoked_at", T.TimestampType(), True),
        T.StructField("source_document", T.StringType(), True),
    ]
)

CLINICAL_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("patient_id", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("fhir_resource", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("recorded_at", T.TimestampType(), False),
    ]
)

AUDIT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("actor", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("resource_type", T.StringType(), False),
        T.StructField("resource_id", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("dt", T.DateType(), False),  # partition column
    ]
)

PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("pipeline_name", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("completed_at", T.TimestampType(), True),
        T.StructField("input_record_count", T.LongType(), True),
        T.StructField("output_record_count", T.LongType(), True),
        T.StructField("errors", T.StringType(), True),
        T.StructField("dag_definition", T.StringType(), True),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "patients": PATIENTS_SCHEMA,
    "consent_records": CONSENT_RECORDS_SCHEMA,
    "clinical_records": CLINICAL_RECORDS_SCHEMA,
    "audit_log": AUDIT_LOG_SCHEMA,
    "pipeline_runs": PIPELINE_RUNS_SCHEMA,
}

PARTITION_COLUMNS: dict[str, list[str]] = {
    "patients": [],
    "consent_records": [],
    "clinical_records": ["resource_type"],
    "audit_log": ["dt"],
    "pipeline_runs": [],
}

CONSENT_TYPES = ("data_sharing", "research", "treatment")
RUN_STATUSES = ("pending", "running", "completed", "failed")


class Warehouse:
    """A directory-backed warehouse of the 5 reference tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        if table not in TABLE_SCHEMAS:
            raise KeyError(f"unknown warehouse table {table!r}")
        return os.path.join(self.root, table)

    def create_all(self) -> None:
        """DDL bootstrap (reference app/main.py:30-32): materialize empty tables."""
        for table, schema in TABLE_SCHEMAS.items():
            if not os.path.exists(self.path(table)):
                empty = self.spark.createDataFrame([], schema)
                self._write(empty, table, mode="overwrite")

    def read(self, table: str) -> DataFrame:
        return self.spark.read.schema(TABLE_SCHEMAS[table]).parquet(self.path(table))

    def append(self, df: DataFrame, table: str) -> None:
        """Append-only write; columns are aligned to the declared schema."""
        schema = TABLE_SCHEMAS[table]
        aligned = df.select(
            *[df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        self._write(aligned, table, mode="append")

    def _write(self, df: DataFrame, table: str, mode: str) -> None:
        writer = df.write.mode(mode)
        parts = PARTITION_COLUMNS[table]
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.path(table))

    def compact(
        self, table: str, *, target_file_mb: int = 128, sort_by: str | None = None
    ) -> int:
        """Rewrite a table into size-targeted files (small-files maintenance).

        Streaming/micro-batch appends leave one small file per batch per
        partition; at scale the file count, not the byte count, dominates
        scan planning and open() overhead. Compaction reads the table,
        coalesces to ceil(bytes / target) files, optionally sorts within
        partitions (tighter parquet min/max stats → better row-group
        pruning on ``sort_by`` predicates), and atomically swaps via a
        staged directory + rename. Returns the new file count.
        """
        import math
        import pathlib
        import shutil

        path = self.path(table)
        current = self.read(table)
        n_bytes = sum(
            f.stat().st_size for f in pathlib.Path(path).rglob("*.parquet")
        )
        n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
        compacted = current.repartition(n_files)
        if sort_by:
            compacted = compacted.sortWithinPartitions(sort_by)
        staging = path + ".compact.tmp"
        writer = compacted.write.mode("overwrite")
        parts = PARTITION_COLUMNS[table]
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(staging)
        old = path + ".compact.old"
        shutil.move(path, old)
        shutil.move(staging, path)
        shutil.rmtree(old)
        return n_files


# ---------------------------------------------------------------------------
# Transactional warehouse: multi-table atomic ingest (reference parity)
# ---------------------------------------------------------------------------

RUN_ID_COL = "__run_id"
_RUN_ID_RE = re.compile(r"[^A-Za-z0-9_.-]")


def _sanitize_run_id(raw: str) -> str:
    return _RUN_ID_RE.sub("_", raw)[:128]


class Transaction:
    """One multi-table atomic write unit.

    Stage any number of tables under ``<table>/__run_id=<run_id>/``; nothing
    is visible to readers until :meth:`commit` publishes the run via ONE
    atomic commit-marker rename. ``abort()`` (or a crash — no marker) leaves
    the staged files permanently invisible; ``vacuum`` reclaims them.
    """

    def __init__(self, warehouse: "TransactionalWarehouse", run_id: str):
        self._wh = warehouse
        self.run_id = run_id
        self.staged_tables: list[str] = []
        self.replaces: dict[str, list[str]] = {}
        self._done = False

    def stage(self, df: DataFrame, table: str) -> None:
        if self._done:
            raise RuntimeError(f"transaction {self.run_id} already finished")
        schema = self._wh.table_schema(table)
        aligned = df.select(
            *[df[f.name].cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        writer = aligned.write.mode("append")
        parts = self._wh.partition_columns(table)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self._wh.run_dir(table, self.run_id))
        if table not in self.staged_tables:
            self.staged_tables.append(table)

    def commit(self) -> bool:
        """Publish every staged table at once.

        The marker write is the commit point: stage all tables, fsync a
        manifest to a temp name, ``os.replace`` it to
        ``_txn/commits/<run_id>.json`` — POSIX-atomic, so readers see either
        the whole multi-table batch or none of it. Returns False (no-op) if
        this run_id is already committed (idempotent re-run).
        """
        if self._done:
            raise RuntimeError(f"transaction {self.run_id} already finished")
        self._done = True
        marker = self._wh.marker_path(self.run_id)
        if os.path.exists(marker):
            return False
        manifest = {
            "run_id": self.run_id,
            "tables": sorted(self.staged_tables),
            # per-table run_ids this commit logically supersedes (compaction):
            # readers drop them the same instant this marker appears
            "replaces": self.replaces,
            # monotone snapshot sequence — the time-travel axis. Assigned at
            # commit time from the current marker set; concurrent committers
            # from SEPARATE drivers could race to the same seq (the commit
            # itself stays atomic — only snapshot ordering would tie), so
            # multi-driver deployments should serialize commits the way any
            # single-metastore table format does.
            "seq": self._wh._next_seq(),
            "format_version": 2,
        }
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(marker), f".tmp.{self.run_id}.{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, marker)
        return True

    def abort(self) -> None:
        """Discard the staged (never-visible) files."""
        self._done = True
        for table in self.staged_tables:
            shutil.rmtree(self._wh.run_dir(table, self.run_id), ignore_errors=True)


class TransactionalWarehouse(Warehouse):
    """Warehouse with an atomic multi-table commit protocol.

    Closes the reference's single-transaction ingest semantics
    (reference app/api/routes.py:148 — patients + consents + clinical +
    audit + run row in ONE session.commit()) without a database: the
    Iceberg-style recipe of staged data files + an atomically-renamed
    commit marker.

    Layout::

        <root>/<table>/__run_id=<id>/[<part>=<val>/]*.parquet   # staged data
        <root>/_txn/commits/<id>.json                           # commit point

    - ``__run_id`` doubles as a hive partition column, so "committed only"
      is a partition-pruning ``isin`` filter — at 100 TB the reader prunes
      at file-listing time and never opens uncommitted files, and the
      committed-id set lives in a marker directory (one tiny JSON per
      batch; the listing is the metastore round-trip, not a data scan).
    - A crash anywhere before the marker rename leaves every staged file
      invisible to every reader — no partial multi-table state, the
      failure the round-2 ordered-append design could not rule out.
    - Idempotent re-ingest: pass a stable ``batch_id`` to :meth:`begin`;
      a re-run of an already-committed batch becomes a no-op, and a
      half-staged crashed attempt is wiped and restaged cleanly.
    - ``compact`` folds committed runs back into few large files (the
      small-files story is unchanged).
    """

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark, root)
        self._extra_schemas: dict[str, T.StructType] = {}
        self._extra_partitions: dict[str, list[str]] = {}

    # -- table registry -----------------------------------------------------

    def register_table(
        self,
        name: str,
        schema: T.StructType,
        *,
        partition_by: tuple[str, ...] = (),
    ) -> None:
        """Declare an additional transactional table beyond the 5 reference
        ones — e.g. a streaming sink target. Same commit protocol, same
        committed-only reads."""
        if name in TABLE_SCHEMAS:
            raise ValueError(f"{name!r} is a built-in table")
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"bad table name {name!r}")
        self._extra_schemas[name] = schema
        self._extra_partitions[name] = list(partition_by)

    def table_schema(self, table: str) -> T.StructType:
        if table in TABLE_SCHEMAS:
            return TABLE_SCHEMAS[table]
        if table in self._extra_schemas:
            return self._extra_schemas[table]
        raise KeyError(f"unknown warehouse table {table!r}")

    def partition_columns(self, table: str) -> list[str]:
        return (
            PARTITION_COLUMNS[table]
            if table in PARTITION_COLUMNS
            else self._extra_partitions.get(table, [])
        )

    def all_tables(self) -> list[str]:
        return [*TABLE_SCHEMAS, *self._extra_schemas]

    def path(self, table: str) -> str:
        if table in self._extra_schemas:
            return os.path.join(self.root, table)
        return super().path(table)

    def txn_root(self) -> str:
        return os.path.join(self.root, "_txn")

    def marker_path(self, run_id: str) -> str:
        return os.path.join(self.txn_root(), "commits", f"{run_id}.json")

    def run_dir(self, table: str, run_id: str) -> str:
        return os.path.join(self.path(table), f"{RUN_ID_COL}={run_id}")

    def _manifests(self) -> list[dict]:
        """All commit manifests in snapshot order (seq, then run_id for
        legacy seq-less markers, which sort first)."""
        commits = os.path.join(self.txn_root(), "commits")
        if not os.path.isdir(commits):
            return []
        out = []
        for f in sorted(os.listdir(commits)):
            if f.endswith(".json") and not f.startswith("."):
                with open(os.path.join(commits, f), encoding="utf-8") as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda m: (m.get("seq", 0), m["run_id"]))

    def _next_seq(self) -> int:
        return max((m.get("seq", 0) for m in self._manifests()), default=0) + 1

    def snapshots(self) -> list[dict]:
        """The table history: one row per commit, in snapshot order —
        [{seq, run_id, tables}]. Any entry's seq or run_id is a valid
        ``as_of`` for :meth:`read`."""
        return [
            {
                "seq": m.get("seq", 0),
                "run_id": m["run_id"],
                "tables": m.get("tables", []),
            }
            for m in self._manifests()
        ]

    def committed_run_ids(self) -> list[str]:
        return sorted({m["run_id"] for m in self._manifests()})

    def committed_runs_for(
        self, table: str, as_of: int | str | None = None
    ) -> list[str]:
        """run_ids whose data is live for ``table``: committed (within the
        ``as_of`` snapshot prefix, when given) and not superseded by a
        compaction commit's ``replaces`` entry inside that same prefix."""
        manifests = self._manifests()
        if as_of is not None:
            if isinstance(as_of, str):
                seqs = [m.get("seq", 0) for m in manifests if m["run_id"] == as_of]
                if not seqs:
                    raise KeyError(f"unknown snapshot run_id {as_of!r}")
                as_of = seqs[0]
            manifests = [m for m in manifests if m.get("seq", 0) <= as_of]
        included: list[str] = []
        replaced: set[str] = set()
        for m in manifests:
            if table in m.get("tables", ()):
                included.append(m["run_id"])
            replaced.update(m.get("replaces", {}).get(table, ()))
        return sorted(r for r in included if r not in replaced)

    def changed_runs_for(
        self, table: str, since: int | str, until: int | str | None = None
    ) -> list[str]:
        """run_ids appended to ``table`` AFTER snapshot ``since`` and up to
        ``until`` (default: current), EXCLUDING compaction rewrites —
        a compaction commit carries a ``replaces`` entry and introduces no
        new rows, so an incremental consumer must skip it (the same rule as
        Iceberg's incremental append scan)."""

        def resolve(s: int | str) -> int:
            if isinstance(s, str):
                seqs = [
                    m.get("seq", 0) for m in self._manifests() if m["run_id"] == s
                ]
                if not seqs:
                    raise KeyError(f"unknown snapshot run_id {s!r}")
                return seqs[0]
            return s

        lo = resolve(since)
        hi = resolve(until) if until is not None else None
        return sorted(
            m["run_id"]
            for m in self._manifests()
            if table in m.get("tables", ())
            and lo < m.get("seq", 0)
            and (hi is None or m.get("seq", 0) <= hi)
            and not m.get("replaces", {}).get(table)
        )

    def read_changes(
        self, table: str, since: int | str, until: int | str | None = None
    ) -> DataFrame:
        """Incremental (CDC-style) read: only rows appended between the
        ``since`` snapshot (exclusive) and ``until`` (inclusive; default
        current). The downstream-sync primitive — a consumer that
        checkpoints the last seq it processed reads exactly-once without
        ever rescanning the table. Same partition-pruning ``isin`` plan as
        :meth:`read`: the run_id set prunes at file-listing time, so the
        scan cost is proportional to the CHANGE, not the table."""
        runs = self.changed_runs_for(table, since, until)
        schema = self.table_schema(table)
        if not runs:
            return self.spark.createDataFrame([], schema)
        with_run = T.StructType(
            schema.fields + [T.StructField(RUN_ID_COL, T.StringType(), True)]
        )
        return (
            self.spark.read.schema(with_run)
            .parquet(self.path(table))
            .filter(F.col(RUN_ID_COL).isin(runs))
            .drop(RUN_ID_COL)
        )

    def begin(self, batch_id: str | None = None) -> Transaction:
        """Open a transaction; ``batch_id`` makes the ingest idempotent.

        If ``batch_id`` was already committed, the returned transaction's
        ``commit()`` reports False and ``stage()`` raises — callers should
        check :meth:`is_committed` first for a clean skip. If a previous
        attempt crashed mid-stage (staged dirs, no marker), its leftovers
        are wiped so the retry stages from scratch instead of doubling rows.
        """
        run_id = _sanitize_run_id(batch_id) if batch_id else uuid.uuid4().hex
        if batch_id and not self.is_committed(run_id):
            for table in self.all_tables():
                shutil.rmtree(self.run_dir(table, run_id), ignore_errors=True)
        txn = Transaction(self, run_id)
        if self.is_committed(run_id):
            txn._done = True  # already-committed: stage() raises, commit() false
        return txn

    def is_committed(self, run_id: str) -> bool:
        return os.path.exists(self.marker_path(run_id))

    def create_all(self) -> None:
        """DDL bootstrap: just the directory skeleton — data arrives via txns."""
        for table in self.all_tables():
            os.makedirs(self.path(table), exist_ok=True)
        os.makedirs(os.path.join(self.txn_root(), "commits"), exist_ok=True)

    def read(self, table: str, as_of: int | str | None = None) -> DataFrame:
        """Committed-runs-only read (snapshot = commit set at plan time).

        ``as_of`` time-travels: pass a snapshot seq (int) or a committed
        run_id (str) to read the table exactly as that commit left it —
        later commits are excluded, and compactions that happened AFTER the
        target snapshot do not hide the original runs (their files are
        still on disk until :meth:`vacuum`, which expires time travel to
        superseded snapshots, like any table format's snapshot expiry).
        """
        committed = self.committed_runs_for(table, as_of=as_of)
        schema = self.table_schema(table)
        if not committed:
            return self.spark.createDataFrame([], schema)
        with_run = T.StructType(
            schema.fields + [T.StructField(RUN_ID_COL, T.StringType(), True)]
        )
        return (
            self.spark.read.schema(with_run)
            .parquet(self.path(table))
            .filter(F.col(RUN_ID_COL).isin(committed))
            .drop(RUN_ID_COL)
        )

    def append(self, df: DataFrame, table: str) -> None:
        """Single-table append = a one-table transaction (auto-commit)."""
        txn = self.begin()
        try:
            txn.stage(df, table)
        except Exception:
            txn.abort()
            raise
        txn.commit()

    def forget(self, predicates: dict[str, "Column"]) -> dict[str, int]:
        """Right-to-be-forgotten: atomically rewrite tables WITHOUT the rows
        matching each table's predicate (GDPR erasure / consent revocation).

        ``predicates`` maps table → the Column identifying rows to ERASE
        (e.g. ``{"patients": col("id") == pid, "consent_records":
        col("patient_id") == pid}``). All rewrites stage under ONE
        transaction whose marker ``replaces`` every live run of every
        touched table — the single rename makes the subject disappear from
        all tables at the same instant, never from some but not others.
        Returns per-table erased-row counts.

        The erased bytes remain in superseded run dirs until
        :meth:`vacuum` — as with every table format, erasure is complete
        only after snapshot expiry (and time travel to pre-erasure
        snapshots dies with it, which for GDPR is the point).

        Scale shape: identical to compaction — one filtered scan + write
        per table; the filter prunes/pushes down like any other predicate.
        """
        txn = self.begin()
        erased: dict[str, int] = {}
        try:
            for table, pred in predicates.items():
                old_runs = self.committed_runs_for(table)
                current = self.read(table)
                erased[table] = current.filter(pred).count()
                txn.stage(current.filter(~pred | pred.isNull()), table)
                txn.replaces[table] = old_runs
        except Exception:
            txn.abort()
            raise
        txn.commit()
        return erased

    def compact(
        self, table: str, *, target_file_mb: int = 128, sort_by: str | None = None
    ) -> int:
        """Transactional compaction: rewrite every live run of ``table`` into
        one size-targeted run, published atomically.

        The compacted data stages under a fresh run_id whose commit marker
        carries ``replaces[table] = [old run_ids]`` — the single marker
        rename simultaneously publishes the new files and retires the old
        ones, so readers never see both (or neither). The superseded run
        dirs become dead weight reclaimed by :meth:`vacuum`.
        """
        import math
        import pathlib

        old_runs = self.committed_runs_for(table)
        current = self.read(table)
        n_bytes = sum(
            f.stat().st_size
            for run in old_runs
            for f in pathlib.Path(self.run_dir(table, run)).rglob("*.parquet")
        )
        n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
        compacted = current.repartition(n_files)
        if sort_by:
            compacted = compacted.sortWithinPartitions(sort_by)
        txn = self.begin()
        try:
            txn.stage(compacted, table)
        except Exception:
            txn.abort()
            raise
        txn.replaces[table] = old_runs
        txn.commit()
        return n_files

    def vacuum(self) -> list[str]:
        """Remove run dirs that are dead for their table: never committed
        (crashed/aborted stage) or superseded by a compaction commit.

        Returns the reclaimed run_ids. Safe any time: a dead run is
        invisible by construction, so deleting it cannot change any reader.
        """
        reclaimed: set[str] = set()
        prefix = f"{RUN_ID_COL}="
        for table in self.all_tables():
            tdir = self.path(table)
            if not os.path.isdir(tdir):
                continue
            live = set(self.committed_runs_for(table))
            for entry in os.listdir(tdir):
                if entry.startswith(prefix):
                    run_id = entry[len(prefix):]
                    if run_id not in live:
                        shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
                        reclaimed.add(run_id)
        return sorted(reclaimed)
