"""Session-scoped transactions over copy-on-write parquet tables.

Reference surface: StartTransaction / Commit / Rollback statements
(axiom/sql/presto/ast/AstStatements.h:687-713). The Spark-first mechanism
is an UNDO LOG of file-level metadata operations, composing with cow.py's
file-granular copy-on-write:

- inside a transaction, a DML's superseded files are RENAMED into a
  ``_txn_undo_<id>/`` subdirectory instead of deleted (Spark readers skip
  ``_``-prefixed paths, so the table immediately reflects the mutation);
- files a DML adds (COW rewrites, INSERT appends) are recorded;
- ROLLBACK deletes the added files and renames the superseded ones back —
  bit-identical restoration, since data files are immutable;
- COMMIT deletes the undo directories.

Every operation is O(files touched) directory metadata — no data is copied
at BEGIN, so a transaction over a 100 TB table costs nothing until (and
proportionally to) what it mutates. Plain directories still have no
cross-session isolation (cow.py's documented caveat); a lakehouse
deployment would put Delta/Iceberg under the same statement surface.
"""

from __future__ import annotations

import os
import shutil
import uuid


def _local(p: str) -> str:
    return p.removeprefix("file://").removeprefix("file:")


# Name of the added-files manifest inside each undo dir (crash recovery).
_MANIFEST = "_added.manifest"


def recover_orphans(table_path: str, active_id: str | None = None) -> int:
    """Roll back orphaned transactions left by a crashed process.

    Without this, a process dying between BEGIN and COMMIT leaves its
    uncommitted DML permanently visible (the superseded files sit hidden in
    ``_txn_undo_*`` forever) — an aborted transaction would silently
    commit. Called on table registration (PrestoSession.register_table);
    recovery semantics are ROLLBACK: uncommitted added files are deleted
    and superseded files are restored. Returns #orphans recovered.
    ``active_id`` protects the current session's live transaction."""
    path = _local(table_path)
    if not os.path.isdir(path):
        return 0
    n = 0
    for name in os.listdir(path):
        if not name.startswith("_txn_undo_"):
            continue
        if active_id is not None and name == f"_txn_undo_{active_id}":
            continue
        d = os.path.join(path, name)
        manifest = os.path.join(d, _MANIFEST)
        if os.path.exists(manifest):
            with open(manifest) as m:
                for added in m.read().splitlines():
                    f = os.path.join(path, added)
                    if os.path.exists(f):
                        os.remove(f)
        for entry in os.listdir(d):
            if entry == _MANIFEST:
                continue
            os.rename(os.path.join(d, entry), os.path.join(path, entry))
        shutil.rmtree(d, ignore_errors=True)
        n += 1
    return n


class Transaction:
    """Undo log for one BEGIN..COMMIT/ROLLBACK span."""

    def __init__(self) -> None:
        self.id = uuid.uuid4().hex[:12]
        # table path → undo dir (superseded files moved here)
        self._undo: dict[str, str] = {}
        # files created inside the transaction (absolute paths)
        self._added: set[str] = set()

    def undo_dir(self, table_path: str) -> str:
        """The undo directory for a table, created on first use."""
        path = _local(table_path)
        d = self._undo.get(path)
        if d is None:
            d = os.path.join(path, f"_txn_undo_{self.id}")
            os.makedirs(d, exist_ok=True)
            self._undo[path] = d
        return d

    def retire(self, table_path: str, file_path: str) -> None:
        """Take a superseded data file out of the table. A file the
        TRANSACTION ITSELF created is simply deleted (rollback must not
        restore it); a pre-transaction file moves to the undo dir."""
        f = _local(file_path)
        if f in self._added:
            self._added.discard(f)
            os.remove(f)
            return
        os.rename(f, os.path.join(self.undo_dir(table_path), os.path.basename(f)))

    def record_added(self, file_path: str) -> None:
        f = _local(file_path)
        self._added.add(f)
        # Persist for crash recovery: a process that dies between BEGIN and
        # COMMIT leaves its undo dirs behind; recover_orphans() needs the
        # added-file list on disk to delete the uncommitted files (the
        # in-memory set dies with the process). The added file always lives
        # in the table directory, so its parent locates the undo dir.
        with open(
            os.path.join(self.undo_dir(os.path.dirname(f)), _MANIFEST), "a"
        ) as m:
            m.write(os.path.basename(f) + "\n")

    def commit(self) -> None:
        """Make the transaction permanent: drop the undo state. On a
        versioned table (sources/versions.py) the undo dir's superseded
        files move to the retired store and ONE version is recorded for
        the whole transaction — intermediate DML states were never
        snapshotted, so the log shows the txn as a single atomic commit."""
        from verax_spark.sources import versions

        for table, d in self._undo.items():
            if versions.enabled(table):
                for name in os.listdir(d):
                    if name != _MANIFEST:
                        versions.retire_file(
                            table, os.path.join(d, name)
                        )
                versions.record(table)
            shutil.rmtree(d, ignore_errors=True)
        self._undo.clear()
        self._added.clear()

    def rollback(self) -> None:
        """Restore every table to its pre-transaction file set."""
        for f in self._added:
            if os.path.exists(f):
                os.remove(f)
        for table, d in self._undo.items():
            for name in os.listdir(d):
                if name == _MANIFEST:
                    continue
                os.rename(os.path.join(d, name), os.path.join(table, name))
            shutil.rmtree(d, ignore_errors=True)
        self._undo.clear()
        self._added.clear()


def snapshot_names(path: str) -> set[str]:
    """Data-file names currently visible in a table directory."""
    return {
        n
        for n in os.listdir(_local(path))
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    }
