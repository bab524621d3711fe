"""Scan-parallelism layout cache for under-split parquet inputs.

Spark parallelizes a parquet scan at ROW-GROUP granularity: a 600k-row
file written as one row group is read by exactly one task no matter how
many cores the cluster has (splits that don't contain a row-group start
produce zero rows). The reference owns its physical layouts outright —
``TableLayout`` in axiom/connectors/ConnectorMetadata.h:176-353 models the
connector's right to organize table storage (bucketing, sort, file
sizing) — and any production lake runs compaction/ingest jobs that size
row groups to the cluster. This module is that layout job, run lazily:

* If a table's files already expose enough row groups to feed the local
  cores (the always-true case at real scale, where 100 TB arrives as
  thousands of 128 MB files), the original path is returned untouched —
  zero cost, zero copies.
* Only when an input is BOTH small (bounded by ``MAX_REWRITE_BYTES``) and
  under-split (fewer row groups than cores, with enough rows to matter)
  is it rewritten once — driver-side via pyarrow for an exact schema
  round-trip (including legacy TIMESTAMP(NANOS) columns Spark reads as
  int64) — into a single file with ~``rows/target`` row-group sizing.

The cache key fingerprints the source (absolute path + per-file size +
mtime), so a regenerated dataset can never serve a stale layout
(ADVICE r03: data identity must be part of any cross-run cache key).
Writes are atomic (tmp dir + ``os.replace``), so concurrent sessions race
benignly.
"""

from __future__ import annotations

import hashlib
import os
import shutil

# Inputs larger than this are left alone: at that size the writer already
# emitted multiple row groups (parquet writers cap row groups well below
# 1 GB), and a driver-side rewrite would be the expensive path.
MAX_REWRITE_BYTES = 4 << 30
# Don't bother re-chunking tiny tables; a single task reads them faster
# than the scheduler can fan out.
MIN_REWRITE_ROWS = 50_000
# Aim for ~2 splits per core so stragglers overlap.
_SPLITS_PER_CORE = 2

def _default_cache_root() -> str:
    # Per-user location (ADVICE r04): a world-shared /tmp path keyed by a
    # computable fingerprint lets any local user pre-plant substituted data.
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "verax-layout-cache")


_CACHE_ROOT = os.environ.get("VERAX_LAYOUT_CACHE") or _default_cache_root()


def _cache_root_usable(root: str) -> bool:
    """Refuse to serve from a cache root owned by another uid."""
    try:
        st = os.stat(root)
    except FileNotFoundError:
        try:
            os.makedirs(root, mode=0o700, exist_ok=True)
            st = os.stat(root)
        except OSError:
            return False
    if hasattr(os, "geteuid") and st.st_uid != os.geteuid():
        return False
    return True


def _dataset_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                out.append(os.path.join(root, n))
    return out


def _fingerprint(files: list[str]) -> str:
    h = hashlib.sha256()
    for f in files:
        st = os.stat(f)
        # st_mtime_ns: whole-second mtimes could alias a same-second
        # regeneration of the source file to a stale cached layout.
        h.update(f"{os.path.abspath(f)}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()[:24]


def ensure_parallel_layout(path: str, cores: int | None = None) -> str:
    """Return a path whose parquet layout can feed ``cores`` scan tasks.

    Returns ``path`` unchanged unless the input is provably under-split
    (fewer row groups than cores) AND small enough to rewrite cheaply; in
    that case returns a cached single-file copy re-chunked to
    ``~rows / (2*cores)`` rows per row group. Identical rows/schema —
    only the physical chunking differs.
    """
    if os.environ.get("VERAX_LAYOUT_CACHE_DISABLE"):
        return path
    if cores is None:
        cores = os.cpu_count() or 8
    try:
        import pyarrow.parquet as pq

        files = _dataset_files(path)
        if not files:
            return path
        total_bytes = 0
        total_rows = 0
        total_rgs = 0
        for f in files:
            total_bytes += os.path.getsize(f)
            md = pq.ParquetFile(f).metadata
            total_rows += md.num_rows
            total_rgs += md.num_row_groups
        if (
            total_rgs >= cores
            or total_rows < MIN_REWRITE_ROWS
            or total_bytes > MAX_REWRITE_BYTES
        ):
            return path

        if not _cache_root_usable(_CACHE_ROOT):
            return path
        key = _fingerprint(files)
        dst = os.path.join(_CACHE_ROOT, key)
        final = os.path.join(dst, "data.parquet")
        if os.path.exists(final):
            return dst

        import pyarrow as pa

        table = pa.concat_tables(pq.read_table(f) for f in files)
        target_splits = _SPLITS_PER_CORE * cores
        rg_rows = max(1, total_rows // target_splits)
        tmp = dst + f".tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        # version 2.6 preserves nanosecond timestamp logical types, so the
        # rewrite is invisible to readers that special-case them.
        pq.write_table(
            table,
            os.path.join(tmp, "data.parquet"),
            row_group_size=rg_rows,
            version="2.6",
            compression="snappy",
        )
        try:
            os.replace(tmp, dst)
        except OSError:
            # concurrent writer won the race; use theirs
            shutil.rmtree(tmp, ignore_errors=True)
        return dst if os.path.exists(final) else path
    except Exception:  # noqa: BLE001 — layout is an optimization, never a failure
        return path
