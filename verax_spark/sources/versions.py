"""Table version history (time travel) over writable parquet tables.

Reference surface: ``TableVersionExpression``
(axiom/sql/presto/ast/AstFunctions.h:535; grammar
axiom/sql/presto/grammar/PrestoSql.g4:561-567) — ``FOR TIMESTAMP AS OF``
/ ``FOR VERSION AS OF`` (and the strict ``BEFORE`` variant) attached to a
table reference. The Spark-first mechanism is the same idea as Delta's
``_delta_log``, reduced to file-granular JSON manifests:

- every committed mutation of a versioned table writes
  ``_versions/v<N>.json`` — the live data-file basenames plus a wall-clock
  commit timestamp (the underscore prefix keeps it invisible to Spark's
  parquet reader, like ``_txn_undo_*``);
- copy-on-write superseded files RETIRE into ``_versions/retired/``
  instead of being deleted, so every recorded snapshot stays readable;
- reading version N is ``spark.read.parquet(*resolved)`` where each
  manifest basename resolves live-dir-first, then retired — a plain
  multi-file parquet scan with full pushdown/pruning, no special reader;
- cost: O(files touched) metadata per commit. Retired data accumulates
  until ``vacuum`` (exposed as ``CALL system.vacuum(table, keep)``),
  which drops all but the newest ``keep`` manifests and deletes retired
  files no surviving manifest references.

Inside a transaction no version is recorded until COMMIT — intermediate
states are not snapshots (atomicity); ROLLBACK records nothing.
"""

from __future__ import annotations

import json
import os
import time


def _local(p: str) -> str:
    return p.removeprefix("file://").removeprefix("file:")


def _vdir(path: str) -> str:
    return os.path.join(_local(path), "_versions")


def _retired_dir(path: str) -> str:
    return os.path.join(_vdir(path), "retired")


def _data_names(path: str) -> list[str]:
    return sorted(
        n
        for n in os.listdir(_local(path))
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def enabled(path: str) -> bool:
    return os.path.isdir(_vdir(path))


def _manifests(path: str) -> list[tuple[int, str]]:
    """(version, manifest-path) ascending; empty when versioning is off."""
    d = _vdir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append((int(n[1:-5]), os.path.join(d, n)))
            except ValueError:
                continue
    return sorted(out)


def current_version(path: str) -> int | None:
    ms = _manifests(path)
    return ms[-1][0] if ms else None


def record(path: str) -> int:
    """Snapshot the current live file set as the next version. Creates the
    log (v0 = current state) on first call. Returns the version number."""
    d = _vdir(path)
    os.makedirs(_retired_dir(path), exist_ok=True)
    cur = current_version(path)
    n = 0 if cur is None else cur + 1
    manifest = {
        "version": n,
        "ts": time.time(),
        "files": _data_names(path),
    }
    tmp = os.path.join(d, f".v{n}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(d, f"v{n}.json"))
    return n


def ensure_initial(path: str) -> None:
    """Start the version log (v0 = the table as registered) if absent."""
    if not enabled(path):
        record(path)


def retire_file(path: str, file_path: str) -> None:
    """Move a superseded data file into the retired store (it remains
    reachable from older manifests). Falls back to delete when versioning
    is not enabled for this table."""
    f = _local(file_path)
    if not enabled(path):
        os.remove(f)
        return
    dest = os.path.join(_retired_dir(path), os.path.basename(f))
    if os.path.exists(dest):  # basenames are uuid-unique; never expected
        raise FileExistsError(f"retired name collision: {dest}")
    os.rename(f, dest)


def files_at(
    path: str,
    version: int | None = None,
    timestamp: float | None = None,
    before: bool = False,
) -> list[str]:
    """Absolute data-file paths of a recorded snapshot.

    Exactly one of ``version``/``timestamp`` must be given. ``before``
    selects the newest snapshot strictly older than the bound (the
    grammar's BEFORE state) instead of <=.
    """
    ms = _manifests(path)
    if not ms:
        raise ValueError(f"table {path!r} has no version history")
    chosen = None
    if version is not None:
        for v, m in ms:
            if (v < version) if before else (v <= version):
                chosen = (v, m)
        if chosen is None or (not before and chosen[0] != version):
            have = f"{ms[0][0]}..{ms[-1][0]}"
            raise ValueError(
                f"version {version} {'(BEFORE)' if before else ''} not in "
                f"history {have} of {path!r}"
            )
    else:
        assert timestamp is not None
        for v, m in ms:
            with open(m) as f:
                ts = json.load(f)["ts"]
            if (ts < timestamp) if before else (ts <= timestamp):
                chosen = (v, m)
        if chosen is None:
            raise ValueError(
                f"no version of {path!r} at or before the given timestamp"
            )
    with open(chosen[1]) as f:
        names = json.load(f)["files"]
    base, retired = _local(path), _retired_dir(path)
    out = []
    for n in names:
        live = os.path.join(base, n)
        out.append(live if os.path.exists(live) else os.path.join(retired, n))
    missing = [p for p in out if not os.path.exists(p)]
    if missing:
        raise ValueError(
            f"snapshot v{chosen[0]} of {path!r} is no longer complete "
            f"(vacuumed?): missing {missing[:3]}"
        )
    return out


def vacuum(path: str, keep: int = 1) -> int:
    """Drop all but the newest ``keep`` manifests and delete retired files
    no surviving manifest references. Returns #files deleted."""
    if keep < 1:
        raise ValueError("vacuum keep must be >= 1")
    ms = _manifests(path)
    if not ms:
        return 0
    drop, survive = ms[:-keep], ms[-keep:]
    referenced: set[str] = set()
    for _, m in survive:
        with open(m) as f:
            referenced.update(json.load(f)["files"])
    deleted = 0
    retired = _retired_dir(path)
    if os.path.isdir(retired):
        for n in os.listdir(retired):
            if n not in referenced:
                os.remove(os.path.join(retired, n))
                deleted += 1
    for _, m in drop:
        os.remove(m)
    return deleted
