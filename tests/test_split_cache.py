"""Layout cache: under-split parquet gets re-chunked; content identical;
well-split inputs untouched; fingerprint invalidation on rewrite."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from verax_spark.sources import split_cache as sc


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    root = tmp_path / "cache"
    monkeypatch.setattr(sc, "_CACHE_ROOT", str(root))
    return root


def _write_one_rg(path, rows):
    t = pa.table({"k": list(range(rows)), "v": [float(i) for i in range(rows)]})
    pq.write_table(t, path, row_group_size=rows)


def test_under_split_is_rechunked(tmp_path, cache_root):
    src = str(tmp_path / "t.parquet")
    _write_one_rg(src, 60_000)
    out = sc.ensure_parallel_layout(src, cores=8)
    assert out != src
    f = os.path.join(out, "data.parquet")
    md = pq.ParquetFile(f).metadata
    assert md.num_rows == 60_000
    assert md.num_row_groups >= 8  # enough splits for the cores
    # identical content and schema
    assert pq.read_table(f).sort_by("k").equals(pq.read_table(src).sort_by("k"))
    # second call hits the cache (same path back, no new tmp dirs)
    assert sc.ensure_parallel_layout(src, cores=8) == out


def test_well_split_and_tiny_inputs_untouched(tmp_path, cache_root):
    tiny = str(tmp_path / "tiny.parquet")
    _write_one_rg(tiny, 100)  # below MIN_REWRITE_ROWS
    assert sc.ensure_parallel_layout(tiny, cores=8) == tiny

    chunky = str(tmp_path / "chunky.parquet")
    t = pa.table({"k": list(range(60_000))})
    pq.write_table(t, chunky, row_group_size=60_000 // 16)
    assert sc.ensure_parallel_layout(chunky, cores=8) == chunky


def test_fingerprint_invalidation(tmp_path, cache_root):
    src = str(tmp_path / "t.parquet")
    _write_one_rg(src, 60_000)
    first = sc.ensure_parallel_layout(src, cores=8)
    # regenerate the source with different content; mtime/size change
    time.sleep(0.01)
    t = pa.table(
        {"k": list(range(1, 60_001)), "v": [0.0] * 60_000}
    )
    pq.write_table(t, src, row_group_size=60_000)
    os.utime(src, (time.time() + 5, time.time() + 5))
    second = sc.ensure_parallel_layout(src, cores=8)
    assert second != first
    got = pq.read_table(os.path.join(second, "data.parquet"))
    assert got.column("k")[0].as_py() == 1


def test_disable_env(tmp_path, cache_root, monkeypatch):
    src = str(tmp_path / "t.parquet")
    _write_one_rg(src, 60_000)
    monkeypatch.setenv("VERAX_LAYOUT_CACHE_DISABLE", "1")
    assert sc.ensure_parallel_layout(src, cores=8) == src


def test_nanos_timestamp_roundtrip(tmp_path, cache_root):
    """Legacy TIMESTAMP(NANOS) columns must survive the rewrite bit-for-bit
    (Spark reads them as int64 under nanosAsLong)."""
    ts = pa.array(range(60_000), type=pa.int64()).cast(pa.timestamp("ns"))
    t = pa.table({"ts": ts, "k": list(range(60_000))})
    src = str(tmp_path / "ev.parquet")
    pq.write_table(t, src, row_group_size=60_000, version="2.6")
    out = sc.ensure_parallel_layout(src, cores=8)
    assert out != src
    got = pq.read_table(os.path.join(out, "data.parquet"))
    assert got.schema.field("ts").type == pa.timestamp("ns")
    assert got.sort_by("k").equals(t.sort_by("k"))


def test_foreign_owned_cache_root_refused(tmp_path, cache_root, monkeypatch):
    """A cache root owned by another uid must not be served from (a local
    attacker could pre-plant substituted data under a predictable key)."""
    src = str(tmp_path / "t.parquet")
    _write_one_rg(src, 60_000)
    monkeypatch.setattr(sc.os, "geteuid", lambda: os.geteuid() + 1)
    out = sc.ensure_parallel_layout(src, cores=16)
    assert out == src  # refused: original path served untouched


def test_fingerprint_uses_mtime_ns(tmp_path):
    """Same-second regeneration must change the fingerprint (st_mtime_ns,
    not whole-second mtime)."""
    src = tmp_path / "t.parquet"
    _write_one_rg(str(src), 1000)
    fp1 = sc._fingerprint([str(src)])
    st = os.stat(src)
    # same size, same whole-second mtime, different nanoseconds
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    fp2 = sc._fingerprint([str(src)])
    assert fp1 != fp2
