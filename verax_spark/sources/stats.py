"""Table/column statistics from parquet footers — the reference's
TableLayout stats surface on Spark.

Reference: axiom/connectors/ConnectorMetadata.h:51-93 (per-column
ColumnStatistics: null fraction, min/max, value counts) and :262-269
(`TableLayout::sample` — planning-time estimates must come from metadata or
bounded samples, NEVER a full scan).

Everything here is a driver-side metadata read (pyarrow over the parquet
footers): no Spark job, no data pages touched — the planner can consult it
per table per query for free. Selectivity estimation walks the typed Expr
DSL structurally (uniformity assumption over [min, max]); anything it cannot
prove falls back to the caller's sampling path (sampleFilters analog), so
estimates are never silently wrong — just sampled instead.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ColumnStats:
    """Footer-aggregated statistics for one column (ColumnStatistics analog:
    ConnectorMetadata.h:51-93)."""

    min: object | None
    max: object | None
    null_count: int
    num_values: int
    # Exact footer NDV when every row group recorded one and their key
    # ranges are pairwise disjoint (sums are then exact); None otherwise.
    # Most writers omit it — callers needing uniqueness must combine this
    # with declared constraints (catalog.DECLARED_UNIQUE_COLUMNS): min/max/
    # count alone can NEVER prove distinctness ([1,2,2,4] passes every
    # range test).
    distinct_count: int | None = None
    # Total compressed bytes of this column's chunks across all files —
    # the per-ColumnGroup scan-cost input of the layout planner (a
    # re-sorted bucketed copy compresses each column differently than the
    # source's natural order; the planner compares the PRUNED column set's
    # bytes per layout, ref TableLayout stats ConnectorMetadata.h:262-269).
    byte_size: int = 0

    @property
    def null_fraction(self) -> float:
        total = self.num_values + self.null_count
        return self.null_count / total if total else 0.0


@dataclass(frozen=True)
class TableStats:
    """TableLayout-level statistics (ConnectorMetadata.h:262-269 analog).

    ``subfields`` carries per-path statistics for nested columns — the
    reference keeps statistics per complex-type path, not just per column
    (ConnectorMetadata.h:51-93), feeding subfield-pushdown decisions. Keys
    are dotted parquet paths with the map repetition level elided:
    ``s.a`` for struct field a, ``m.key`` / ``m.value`` for a map's key and
    value streams."""

    num_rows: int
    total_bytes: int
    columns: dict[str, ColumnStats] = field(default_factory=dict)
    subfields: dict[str, ColumnStats] = field(default_factory=dict)

    def path_stats(self, path: str) -> ColumnStats | None:
        """Stats for a column or dotted subfield path."""
        return self.columns.get(path) or self.subfields.get(path)


def _merge_min(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _merge_max(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def _canon_path(path: str) -> str:
    """Parquet's physical nesting levels elided from a dotted path:
    ``m.key_value.key`` → ``m.key``; ``a.list.element`` → ``a.element``."""
    return ".".join(
        p for p in path.split(".") if p not in ("key_value", "list")
    )


# process-wide footer cache: (files, sizes, mtimes) → TableStats. Footers
# are immutable for a given file state, so caching is exact; the key dies
# with the files it describes (same invalidation rule as the history
# fingerprint). Re-planning the same tables then costs zero I/O.
_STATS_CACHE: dict[tuple, "TableStats | None"] = {}


def _stats_key(paths: list[str]) -> tuple | None:
    import os as _os

    key = []
    for p in sorted(paths):
        local = p.removeprefix("file://").removeprefix("file:")
        try:
            st = _os.stat(local)
        except OSError:
            return None
        key.append((local, st.st_size, int(st.st_mtime)))
    return tuple(key)


def parquet_stats(paths: list[str]) -> TableStats | None:
    """Aggregate footer metadata across the files of one table. Returns None
    if any file lacks a readable footer (caller falls back to sampling).
    Nested column chunks (struct fields, map key/value streams) aggregate
    into per-path subfield statistics. Cached per file state (footers are
    immutable; see _STATS_CACHE)."""
    key = _stats_key(paths)
    if key is not None and key in _STATS_CACHE:
        return _STATS_CACHE[key]
    out = _parquet_stats_uncached(paths)
    if key is not None:
        if len(_STATS_CACHE) > 256:
            _STATS_CACHE.clear()
        _STATS_CACHE[key] = out
    return out


def _parquet_stats_uncached(paths: list[str]) -> TableStats | None:
    import pyarrow.parquet as pq

    num_rows = 0
    total_bytes = 0
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    counts: dict[str, int] = {}
    bytes_: dict[str, int] = {}
    nested: set[str] = set()
    # per-column (group_min, group_max, group_distinct) — kept only while
    # EVERY row group of the column reports a distinct_count with min/max
    rg_total = 0
    ndv_groups: dict[str, list[tuple[object, object, int]]] = {}
    try:
        for p in paths:
            path = p.removeprefix("file://").removeprefix("file:")
            meta = pq.ParquetFile(path).metadata
            num_rows += meta.num_rows
            for rg in range(meta.num_row_groups):
                group = meta.row_group(rg)
                rg_total += 1
                total_bytes += group.total_byte_size
                for ci in range(group.num_columns):
                    col = group.column(ci)
                    name = col.path_in_schema
                    if "." in name:
                        name = _canon_path(name)
                        nested.add(name)
                    bytes_[name] = bytes_.get(name, 0) + (
                        col.total_compressed_size or 0
                    )
                    st = col.statistics
                    if st is None:
                        mins[name] = maxs[name] = None
                        continue
                    if st.has_min_max:
                        mins[name] = _merge_min(mins.get(name), st.min)
                        maxs[name] = _merge_max(maxs.get(name), st.max)
                        if st.distinct_count:
                            ndv_groups.setdefault(name, []).append(
                                (st.min, st.max, st.distinct_count)
                            )
                    nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
                    counts[name] = counts.get(name, 0) + (st.num_values or 0)
    except Exception:
        return None

    def _ndv(name: str) -> int | None:
        groups = ndv_groups.get(name)
        if not groups or len(groups) != rg_total:
            return None
        if len(groups) == 1:
            return groups[0][2]
        # sums are exact only when group key ranges never overlap
        ordered = sorted(groups)
        for (_, prev_max, _), (nxt_min, _, _) in zip(ordered, ordered[1:]):
            if not nxt_min > prev_max:
                return None
        return sum(g[2] for g in ordered)

    def _cs(name: str) -> ColumnStats:
        return ColumnStats(
            mins.get(name),
            maxs.get(name),
            nulls.get(name, 0),
            counts.get(name, 0),
            _ndv(name),
            bytes_.get(name, 0),
        )

    names = set(mins) | set(nulls) | set(bytes_)
    columns = {n: _cs(n) for n in names - nested}
    subfields = {n: _cs(n) for n in names & nested}
    return TableStats(num_rows, total_bytes, columns, subfields)


def table_stats(df) -> TableStats | None:
    """Footer stats for a DataFrame that is a bare parquet scan (column
    pruning allowed; anything row-changing → None)."""
    from verax_spark.optimizer.query_graph import _NON_SCAN_OPS

    try:
        plan = df._jdf.queryExecution().analyzed().toString()
        if any(op in plan for op in _NON_SCAN_OPS):
            return None
        files = df.inputFiles()
    except Exception:
        return None
    if not files or any(".parquet" not in f.rsplit("/", 1)[-1] for f in files):
        return None
    return parquet_stats(list(files))


# ---------------------------------------------------------------------------
# Structural selectivity estimation over the Expr DSL.
_NUMERIC = (int, float)


def _as_number(v) -> float | None:
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, _NUMERIC):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.timestamp()
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day).timestamp()
    return None


def _range_fraction(cs: ColumnStats, lo: float | None, hi: float | None) -> float | None:
    """P(lo ≤ col ≤ hi) under uniformity over footer [min, max]."""
    mn, mx = _as_number(cs.min), _as_number(cs.max)
    if mn is None or mx is None:
        return None
    span = mx - mn
    lo = mn if lo is None else max(lo, mn)
    hi = mx if hi is None else min(hi, mx)
    if hi < lo:
        return 0.0
    if span <= 0:
        return 1.0
    return (1.0 - cs.null_fraction) * (hi - lo) / span


_CMP = {"lt", "lte", "gt", "gte", "eq", "between"}

# per-item equality selectivity when neither value range nor NDV is in the
# footers (System R's classic 1/10; the reference's "default selectivity"
# fallback when filter sampling is disabled, OptimizerOptions.h:52-57)
_DEFAULT_EQ_SELECTIVITY = 0.1


def _as_col_range(e) -> tuple[str, float | None, float | None] | None:
    """(column, lo, hi) when ``e`` is a one-sided/two-sided range over a
    single column with literal bounds; None otherwise."""
    from verax_spark.plans.expr import Call, Col, Lit

    if not isinstance(e, Call):
        return None
    fn = e.fn.lower()
    if fn not in ("lt", "lte", "gt", "gte", "between"):
        return None
    if not (
        isinstance(e.args[0], Col)
        and all(isinstance(a, Lit) for a in e.args[1:])
    ):
        return None
    vals = [_as_number(a.value) for a in e.args[1:]]
    if any(v is None for v in vals):
        return None
    name = e.args[0].name
    if fn == "between":
        return name, vals[0], vals[1]
    if fn in ("lt", "lte"):
        return name, None, vals[0]
    return name, vals[0], None


def selectivity(stats: TableStats, expr) -> float | None:
    """Estimated fraction of rows satisfying ``expr``, or None when the
    expression shape/type is outside what footer stats can answer (the
    caller then samples — sampleFilters, JoinSample.cpp family)."""
    from verax_spark.functions.registry import canonicalize
    from verax_spark.plans.expr import Call, Col, Lit

    expr = canonicalize(expr)

    def est(e) -> float | None:
        if not isinstance(e, Call):
            return None
        fn = e.fn.lower()
        if fn == "and":
            # Same-column range conjuncts form an INTERVAL INTERSECTION,
            # not an independence product: ``lo <= c AND c < hi`` under
            # naive multiplication estimates P(c >= lo) x P(c < hi) — for a
            # 3-month window in a 7-year span that is 22% instead of the
            # true 3.6% (6x), which once inflated an orders date-slice from
            # 0.5M to 3.3M rows and blocked its broadcast.
            conj: list = []

            def flat(x) -> None:
                if isinstance(x, Call) and x.fn.lower() == "and":
                    for a in x.args:
                        flat(a)
                else:
                    conj.append(x)

            flat(e)
            ranges: dict[str, list] = {}
            others: list = []
            for c in conj:
                r = _as_col_range(c)
                if r is None:
                    others.append(c)
                    continue
                name, lo, hi = r
                cur = ranges.setdefault(name, [None, None])
                if lo is not None:
                    cur[0] = lo if cur[0] is None else max(cur[0], lo)
                if hi is not None:
                    cur[1] = hi if cur[1] is None else min(cur[1], hi)
            out = 1.0
            for name, (lo, hi) in ranges.items():
                cs = stats.path_stats(name)
                if cs is None:
                    return None
                f = _range_fraction(cs, lo, hi)
                if f is None:
                    return None
                out *= f
            for c in others:
                p = est(c)
                if p is None:
                    return None
                out *= p
            return out
        if fn == "or":
            parts = [est(a) for a in e.args]
            if any(p is None for p in parts):
                return None
            out = 0.0
            for p in parts:
                out = out + p - out * p
            return out
        if fn == "not":
            inner = est(e.args[0])
            return None if inner is None else 1.0 - inner
        if fn == "in" and isinstance(e.args[0], Col) and all(
            isinstance(a, Lit) for a in e.args[1:]
        ):
            # IN-list: n/(value range) for integer domains, n/NDV when the
            # footer reports distinct counts, else the classic default
            # equality selectivity per item (the "default selectivity"
            # fallback the reference uses when filter sampling is off,
            # OptimizerOptions.h:52-57)
            cs = stats.path_stats(e.args[0].name)
            n = len(e.args) - 1
            if cs is not None:
                mn, mx = _as_number(cs.min), _as_number(cs.max)
                if (
                    mn is not None
                    and mx is not None
                    and isinstance(cs.min, int)
                    and mx > mn
                ):
                    return min(1.0, n * (1.0 - cs.null_fraction) / (mx - mn + 1))
                if cs.distinct_count:
                    return min(1.0, n / cs.distinct_count)
            return min(1.0, n * _DEFAULT_EQ_SELECTIVITY)
        if fn not in _CMP:
            return None
        if not (isinstance(e.args[0], Col) and all(
            isinstance(a, Lit) for a in e.args[1:]
        )):
            return None
        # dotted names reach into subfield statistics (per-path stats,
        # ConnectorMetadata.h:51-93): Col("s.a") uses s.a's own chunk stats
        cs = stats.path_stats(e.args[0].name)
        if cs is None:
            return None
        vals = [_as_number(a.value) for a in e.args[1:]]
        if any(v is None for v in vals):
            return None
        if fn == "between":
            return _range_fraction(cs, vals[0], vals[1])
        v = vals[0]
        if fn in ("lt", "lte"):
            return _range_fraction(cs, None, v)
        if fn in ("gt", "gte"):
            return _range_fraction(cs, v, None)
        # eq: uniform 1/range for integers, else unknown → sample
        mn, mx = _as_number(cs.min), _as_number(cs.max)
        if (
            mn is not None
            and mx is not None
            and isinstance(cs.min, int)
            and mx > mn
        ):
            if v < mn or v > mx:
                return 0.0
            return (1.0 - cs.null_fraction) / (mx - mn + 1)
        return None

    return est(expr)
