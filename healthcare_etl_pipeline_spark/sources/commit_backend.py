"""Commit backends: the storage primitives the transactional warehouse's
atomicity actually rests on, extracted behind one small seam.

The commit protocol (sources/warehouse.py `Transaction.commit`) needs
exactly two primitives from storage:

1. ``put_if_absent(path, data)`` — atomically create a small metadata
   object (commit marker, snapshot-seq claim) if and only if it does not
   exist, with all-or-nothing content visibility. This is the
   serialization point of every commit.
2. ``publish_dir(src, dest)`` — make a staged directory of data files
   visible at its final path, such that a dest reported as *complete* by
   one committer is never a half-written directory.

On a POSIX filesystem (local disk, HDFS, NFS) both have native atomic
forms: hard-link create-if-absent and directory rename. S3-class object
stores have **no atomic rename** — but every major store now exposes a
conditional PUT (S3 ``If-None-Match: *``, GCS ``x-goog-if-generation-
match: 0``, Azure ``If-None-Match: *``), which is primitive (1) exactly.
:class:`ConditionalPutBackend` therefore re-derives primitive (2) from
primitive (1) alone — claim, non-atomic copy, completion sentinel — so
the same commit protocol holds where rename atomicity does not exist.
(The reference sidesteps all of this by delegating atomicity to
Postgres, reference app/api/routes.py:148; a 100 TB deployment cannot.)

Durability note: both backends fsync metadata objects before making them
visible, so a published commit marker survives power loss (object stores
give this implicitly — a PUT acks only after durable write).
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Callable

#: publish_dir outcomes
PUBLISHED = "published"  # this committer made dest visible and complete
EXISTS = "exists"  # another committer already completed dest
IN_FLIGHT = "in_flight"  # another committer claimed dest but has not
#                          (yet) completed it — treat as lost race

#: completion sentinel written inside a copied run dir. Underscore-prefixed
#: names are hidden from Spark/Hadoop file listings (HiddenFileFilter), so
#: readers never see it as data.
PUBLISH_SENTINEL = "_PUBLISHED"


class CommitBackend:
    """Interface: the two storage primitives a commit needs."""

    name = "abstract"

    def put_if_absent(self, path: str, data: str) -> bool:
        """Atomically create ``path`` with ``data`` iff it does not exist.

        Returns True iff THIS call created it. Content visibility is
        all-or-nothing: no reader ever observes a partially-written
        object at ``path``.
        """
        raise NotImplementedError

    def publish_dir(self, src: str, dest: str) -> str:
        """Make staged dir ``src`` visible at ``dest``.

        Returns :data:`PUBLISHED` (we won and dest is complete),
        :data:`EXISTS` (a peer already completed dest — for the same
        run_id, so semantically the same batch), or :data:`IN_FLIGHT`
        (a peer claimed dest but completion is not yet observable).
        On PUBLISHED the backend consumed ``src``; otherwise ``src`` is
        left for the caller to discard.
        """
        raise NotImplementedError

    def is_complete_dir(self, dest: str) -> bool:
        """True iff ``dest`` was fully published (used by retries/fsck)."""
        raise NotImplementedError


def _atomic_create(path: str, data: str, *, mkdirs: bool = True) -> bool:
    """write tmp → fsync → hard-link to final name: create-if-absent with
    all-or-nothing content (a reader can never open a half-written file,
    because the final name appears only after the fsync'd tmp is linked).
    ``mkdirs=False`` raises FileNotFoundError if the parent is gone —
    used where a vanished parent means "stand down", not "recreate"."""
    d = os.path.dirname(path)
    if mkdirs:
        os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp.{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


class LocalFSBackend(CommitBackend):
    """POSIX filesystem backend (local disk / HDFS / NFS): native atomic
    rename for data publish, hard-link create-if-absent for metadata."""

    name = "localfs"

    def put_if_absent(self, path: str, data: str) -> bool:
        return _atomic_create(path, data)

    def publish_dir(self, src: str, dest: str) -> str:
        try:
            os.rename(src, dest)
            return PUBLISHED
        except OSError:
            # rename is atomic: if dest exists at all, it is complete
            if os.path.isdir(dest):
                return EXISTS
            if not os.path.exists(src):
                # our staging was wiped by a same-batch begin() retry —
                # that retry (or a live peer) owns publishing this batch
                return IN_FLIGHT
            raise

    def is_complete_dir(self, dest: str) -> bool:
        return os.path.isdir(dest)


class ConditionalPutBackend(CommitBackend):
    """Object-store backend: NO rename atomicity assumed anywhere.

    The only primitive assumed from the store is a conditional PUT
    (put-if-absent with atomic full-object visibility) — which S3, GCS
    and Azure all provide natively. It is simulated here on the local
    filesystem by :func:`_atomic_create`; swapping in a real store means
    replacing that one call with the store's conditional PUT.

    ``publish_dir`` is re-derived from conditional PUT alone:

    1. claim ``.publish.<dest-name>`` (a hidden sibling object) via
       put-if-absent — exactly one ATTEMPT (run_id + nonce) proceeds;
       losers observe IN_FLIGHT until step 3.
    2. copy ``src``'s files to ``dest`` one object at a time. This is
       NON-atomic and interruptible — harmless, because nothing reads
       ``dest`` until the commit marker (itself a conditional PUT that
       happens only after step 3) exists, and a crashed half-copy with no
       marker is invisible to every reader and reclaimed by fsck/vacuum.
    3. put-if-absent the ``_PUBLISHED`` sentinel inside ``dest`` — the
       completion point. Only after it exists may any committer treat
       ``dest`` as complete (EXISTS) and proceed toward the marker.

    ``race_hook(event, path)`` is a test seam: called at every protocol
    step so tests can inject crashes/delays between any two object
    operations and prove the protocol holds at each interleaving.
    Events: ``put``, ``claim_won``, ``claim_lost``, ``copy_file``,
    ``sentinel``, ``published``.
    """

    name = "conditional_put"

    def __init__(self, race_hook: Callable[[str, str], None] | None = None):
        self._hook = race_hook or (lambda event, path: None)

    def put_if_absent(self, path: str, data: str) -> bool:
        self._hook("put", path)
        return _atomic_create(path, data)

    def _claim_path(self, dest: str) -> str:
        # dot-prefixed sibling of dest: invisible to Spark/Hadoop file
        # listings (HiddenFileFilter), so readers scanning the parent dir
        # never try to parse the claim as data
        return os.path.join(
            os.path.dirname(dest), ".publish." + os.path.basename(dest)
        )

    def _sentinel_path(self, dest: str) -> str:
        return os.path.join(dest, PUBLISH_SENTINEL)

    def publish_dir(self, src: str, dest: str) -> str:
        if not os.path.isdir(src):
            # staging wiped by a same-batch begin() retry — the wiper (or
            # a live peer with intact staging) owns publishing this batch
            return EXISTS if self.is_complete_dir(dest) else IN_FLIGHT
        token = os.path.basename(src)  # run_id.nonce: unique per attempt
        if not _atomic_create(self._claim_path(dest), token):
            self._hook("claim_lost", dest)
            return EXISTS if self.is_complete_dir(dest) else IN_FLIGHT
        self._hook("claim_won", dest)
        copied = 0
        try:
            for root, _dirs, files in os.walk(src):
                rel = os.path.relpath(root, src)
                out = dest if rel == "." else os.path.join(dest, rel)
                os.makedirs(out, exist_ok=True)
                for f in sorted(files):
                    self._hook("copy_file", os.path.join(rel, f))
                    shutil.copy2(os.path.join(root, f), os.path.join(out, f))
                    copied += 1
            if copied == 0 and not os.path.isdir(src):
                raise FileNotFoundError(src)  # wiped between check and walk
        except FileNotFoundError:
            # src wiped UNDER us (same-batch begin() retry racing this
            # copy): undo the partial dest, RELEASE the claim — safe, we
            # still hold it and no sentinel exists — and stand down
            shutil.rmtree(dest, ignore_errors=True)
            self.clear_claim(dest)
            return IN_FLIGHT
        # lease re-verify: a same-batch begin() retry that judged this
        # attempt dead may have cleared the claim mid-copy — if we no
        # longer own it, undo and stand down rather than completing a
        # dest another attempt may now be writing
        try:
            with open(self._claim_path(dest), encoding="utf-8") as fh:
                owner = fh.read()
        except OSError:
            owner = None
        if owner != token:
            shutil.rmtree(dest, ignore_errors=True)
            return IN_FLIGHT
        self._hook("sentinel", dest)
        try:
            _atomic_create(self._sentinel_path(dest), "", mkdirs=False)
        except FileNotFoundError:
            # dest swept from under us between verify and sentinel
            shutil.rmtree(dest, ignore_errors=True)
            self.clear_claim(dest)
            return IN_FLIGHT
        self._hook("published", dest)
        shutil.rmtree(src, ignore_errors=True)
        return PUBLISHED

    def is_complete_dir(self, dest: str) -> bool:
        return os.path.exists(self._sentinel_path(dest))

    def clear_claim(self, dest: str) -> None:
        """Retry support: drop a dead committer's claim + partial dest so
        a fresh attempt of the same run_id can republish (begin() calls
        this only for run_ids with no commit marker — i.e. provably
        uncommitted batches)."""
        try:
            os.unlink(self._claim_path(dest))
        except OSError:
            pass
