"""Table catalog over the driver's parquet testdata.

The reference models tables through connector metadata — a ``Table`` with
physical layouts carrying partitioning/sort/bucketing info
(axiom/connectors/ConnectorMetadata.h:176-353). Spark's DataSource V2 covers
the mechanics (split enumeration, pushdown, pruning); this module is the thin
metadata layer: name → DataFrame with optional size hints used by our
planning helpers to pick broadcast candidates, mirroring how the reference's
optimizer consults table cardinality (optimizer/Schema.h, TableLayout stats).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The ten driver tables (TESTDATA.md). `region` and `nation` are fixed-size
# dimensions; the rest scale linearly with sf.
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTRA_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTRA_TABLES

# Tables small enough (at any sf the driver uses — and on real deployments,
# by nature: geography dimensions) to always broadcast.
BROADCAST_TABLES = frozenset({"region", "nation"})

# Declared unique-key (primary-key) constraints of the driver schema — the
# connector-metadata contract the reference's layouts carry
# (axiom/connectors/ConnectorMetadata.h:176-353 table metadata). The
# optimizer TRUSTS these like a database trusts DECLARE PRIMARY KEY; parquet
# footers can only FALSIFY uniqueness (nulls present, or pigeonhole: more
# values than [min, max] slots), never prove it — min/max/count stats admit
# duplicates like [1, 2, 2, 4]. `lineitem` is absent: its key is composite
# (l_orderkey, l_linenumber). Column names are schema-unique in this
# catalog, so a flat set suffices.
DECLARED_UNIQUE_COLUMNS = frozenset({
    "r_regionkey",
    "n_nationkey",
    "c_custkey",
    "s_suppkey",
    "p_partkey",
    "o_orderkey",
    "event_id",
    "doc_id",
    "vec_id",
})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (application id, sf_dir, table) → DataFrame; see Catalog.table.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# (application id, sf_dir, table, id(df)) → (df, TableStats). Footer stats
# are pure file metadata, so they are as immutable as the scan plans above —
# but _stats was per-Catalog-instance and a harness builds a fresh
# Catalog per query, so every planning helper (_semi_if_big, layout
# costing) re-read parquet footers on every call (~10-50 ms x tables
# touched, a measurable slice of the r08 sf0.1 steady regression).
# The value PINS the DataFrame whose id() is in the key: a GC-recycled
# object id can therefore never alias a stale entry (ADVICE r09), and
# flush_metadata_cache clears this cache alongside _SCAN_CACHE so a
# vacuum/rewrite re-reads footers.
_STATS_CACHE: dict[tuple[str, str, str, int], tuple[DataFrame, object]] = {}


@dataclass
class Catalog:
    """Resolves table names to DataFrames for one scale-factor directory."""

    spark: SparkSession
    sf_dir: str = DEFAULT_SF_DIR
    _cache: dict[str, DataFrame] = field(default_factory=dict)
    _stats: dict[str, object] = field(default_factory=dict)

    # every catalog table name (used by the layout planner's walk)
    all_tables = ALL_TABLES

    def _layout_policy(self):
        """The planner-installed layout policy, if any: None (legacy
        per-call layout_keys), "flat", or {table: bucket-col tuple}
        (optimizer/layouts.py — the per-query ColumnGroup choice moved
        into the planner, ref axiom/optimizer/Schema.h:238-264)."""
        from verax_spark.optimizer.layouts import active_policy

        return active_policy()

    def chosen_layout(self, name: str) -> tuple[str, ...] | None:
        """Bucket columns of the physical layout THIS catalog will serve
        for ``name``, or None for the flat scan — lets a query branch its
        shape on the planner's layout decision (q16's direct-bucket-join
        vs semi-reduced shape) without declaring the choice itself."""
        pol = self._layout_policy()
        if pol == "flat":
            return None
        if isinstance(pol, dict):
            cols = pol.get(name, ())
            return tuple(cols) or None
        from verax_spark.sources.layout import registered_layout

        entry = registered_layout(
            os.path.join(self.sf_dir, f"{name}.parquet"), name
        )
        return tuple(entry["bucket_cols"]) if entry else None

    def stats(self, name: str):
        """Footer-derived TableStats (row count, bytes, per-column min/max/
        nulls) — the TableLayout statistics surface (ref
        axiom/connectors/ConnectorMetadata.h:51-93, :262-269). Driver-side
        metadata read, cached; never a Spark job."""
        if name not in self._stats:
            df = self.table(name)
            # id(df) distinguishes layout-served plans: _SCAN_CACHE returns
            # the same object for the same (table, layout), so stats never
            # leak across physical layouts with different byte sizes
            key = (
                self.spark.sparkContext.applicationId,
                self.sf_dir,
                name,
                id(df),
            )
            entry = _STATS_CACHE.get(key)
            if entry is None:
                from verax_spark.sources.stats import table_stats

                entry = (df, table_stats(df))
                _STATS_CACHE[key] = entry
            self._stats[name] = entry[1]
        return self._stats[name]

    def table(
        self, name: str, layout_keys: "frozenset[str] | set | tuple | None" = None
    ) -> DataFrame:
        """Resolve ``name`` to a DataFrame, choosing among the table's
        physical layouts (ref TableLayout / per-query ColumnGroup choice,
        ConnectorMetadata.h:176-353, Schema.h:238-264).

        ``layout_keys`` is the set of columns THIS QUERY joins or
        aggregates this table on. None (default) = take any registered
        bucketed layout (SQL front door, generic callers — the planner
        then exploits or ignores it). An explicit set = take the bucketed
        layout only when its bucket columns are a subset of the declared
        keys; otherwise serve the flat source scan — a bucketed copy the
        query cannot exploit still costs its re-sorted files' worse
        compression (~18% more bytes measured on lineitem at sf100), so a
        scan-bound query declares ``layout_keys=()`` and keeps the flat
        files."""
        lk = (
            None
            if layout_keys is None
            else frozenset(k.lower() for k in layout_keys)
        )
        if name not in self._cache:
            # session-scoped scan cache: DataFrames are immutable logical
            # plans, so reusing one across Catalog instances is safe and
            # skips repeated footer/schema reads (~0.1-0.5 s per
            # spark.read.parquet — material when a harness builds a fresh
            # Catalog per query). Keyed by application id so a restarted
            # session never sees stale plans.
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            # layout choice: registry metadata only (no JVM on the miss path)
            from verax_spark.sources.layout import (
                attach_layout_entry,
                registered_layout,
            )

            pol = self._layout_policy()
            if pol == "flat":
                entry = None
            elif isinstance(pol, dict):
                cols = tuple(pol.get(name, ()))
                entry = (
                    registered_layout(
                        path, name, frozenset(c.lower() for c in cols)
                    )
                    if cols
                    else None
                )
            else:
                entry = registered_layout(path, name, lk)
            use_layout = entry is not None
            key = (
                self.spark.sparkContext.applicationId,
                self.sf_dir,
                name,
                entry["table"] if use_layout else None,
            )
            shared = _SCAN_CACHE.get(key)
            if shared is not None:
                self._cache[name] = shared
                return shared
            if use_layout:
                bucketed = attach_layout_entry(self.spark, entry)
                if bucketed is not None:
                    self._cache[name] = bucketed
                    _SCAN_CACHE[key] = bucketed
                    return bucketed
            # Split fixup: if the input is a small single-row-group file —
            # Spark scans can't parallelize below row-group granularity —
            # serve a re-chunked copy. No-op on well-split inputs (every
            # real-scale dataset).
            from verax_spark.sources.split_cache import ensure_parallel_layout

            path = ensure_parallel_layout(
                path, self.spark.sparkContext.defaultParallelism
            )
            if name == "events":
                # events.ts arrives either as parquet TIMESTAMP (micros) —
                # read as TIMESTAMP_NTZ — or as the legacy TIMESTAMP(NANOS)
                # layout Spark can only read as int64 nanos. Normalize both
                # to TimestampType (session TZ is UTC, so the cast is exact).
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                from pyspark.sql import functions as F
                from pyspark.sql.types import LongType

                df = self.spark.read.parquet(path)
                if isinstance(df.schema["ts"].dataType, LongType):
                    df = df.withColumn(
                        "ts", F.timestamp_micros(F.expr("ts div 1000"))
                    )
                else:
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
                self._cache[name] = df
            else:
                self._cache[name] = self.spark.read.parquet(path)
            _SCAN_CACHE[key] = self._cache[name]
        return self._cache[name]

    def derived(self, name: str, derived: dict) -> DataFrame:
        """Base table plus requested derived columns ({col: canonical SQL
        over the base columns}) — the consumer-side of materialized-
        projection layouts (reference ColumnGroup, Schema.h:238-264: a
        physical copy with computed columns, chosen per query).

        Physical choice: when the planner policy selected a projection
        copy covering this request (key ``<name>@proj`` = entry digest),
        serve the copy — precomputed columns, plus row-group pruning from
        its sort order. Otherwise compute the expressions inline over
        whatever ``table()`` serves. Results are identical by
        construction: a copy only covers a request when every requested
        (column, SQL) pair string-matches what was materialized.

        The request is also RECORDED so the planner's flat costing pass
        (optimizer/layouts.choose_layouts) knows this query consumes
        these derived columns — inline expressions in the optimized plan
        are not reliably recognizable as a projection-copy demand."""
        from pyspark.sql import functions as F

        from verax_spark.optimizer.layouts import record_derived_request
        from verax_spark.sources.layout import (
            attach_projection_entry,
            derived_digest,
            projection_covering,
        )

        record_derived_request(name, derived)
        pol = self._layout_policy()
        if isinstance(pol, dict) and pol.get(f"{name}@proj"):
            path = os.path.join(self.sf_dir, f"{name}.parquet")
            entry = projection_covering(path, name, derived)
            chosen = pol[f"{name}@proj"]
            # stored as a 1-tuple: decision/feedback persistence round-trips
            # every policy value through list<->tuple uniformly
            if isinstance(chosen, (tuple, list)):
                chosen = chosen[0] if chosen else None
            if (
                entry is not None
                and derived_digest(entry["derived"]) == chosen
            ):
                key = (
                    self.spark.sparkContext.applicationId,
                    self.sf_dir,
                    name,
                    f"proj:{entry['table']}",
                )
                df = _SCAN_CACHE.get(key)
                if df is None:
                    df = attach_projection_entry(self.spark, entry)
                    if df is not None:
                        _SCAN_CACHE[key] = df
                if df is not None:
                    extra = set(entry["derived"]) - set(derived)
                    if extra:
                        df = df.drop(*extra)
                    return df
        df = self.table(name)
        return df.withColumns({c: F.expr(sql) for c, sql in derived.items()})

    def __getattr__(self, name: str) -> DataFrame:
        if name in ALL_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = ALL_TABLES) -> None:
        """Register temp views so spark.sql() sees the catalog. Tables whose
        parquet is absent in this sf_dir are skipped (recorded in
        ``self.missing``) — partial directories (e.g. a TPC-H-only scale
        run) still get a working session for the tables they do have."""
        self.missing: list[str] = []
        for name in names:
            if not os.path.exists(os.path.join(self.sf_dir, f"{name}.parquet")):
                self.missing.append(name)
                continue
            self.table(name).createOrReplaceTempView(name)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    cat = Catalog(spark, sf_dir)
    return {name: cat.table(name) for name in ALL_TABLES}
