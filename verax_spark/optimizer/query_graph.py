"""Query graph + cost-based join ordering above Catalyst.

Reference model (axiom/optimizer/): a DerivedTable holds BaseTables, single-
table filters, and equi-JoinEdges with equivalence classes
(DerivedTable.h:36-238, QueryGraph.h:416-464); `makeJoins` enumerates join
orders starting from the highest-filtered table, costing candidates with
sampled selectivities (Optimization.cpp:1555, JoinSample.cpp) and deciding
broadcast vs partitioned distribution (Schema.h:167-171).

Spark-first translation: we don't re-plan what AQE can fix at runtime; we
decide the two things that must be right *before* execution because they are
baked into the DataFrame DAG:

1. join ORDER (Catalyst reorders only with CBO stats it usually lacks over
   raw parquet) — greedy smallest-effective-cardinality-first, the same
   heuristic family as the reference's startingScore + greedy candidate
   expansion (branch-and-bound memoization is overkill for the linear/star
   graphs this layer targets; document and keep the surface);
2. BROADCAST hints for dimension sides under threshold, from sampled sizes
   (isBroadcastableType analog) — letting Catalyst skip the shuffle.

Cardinality comes from parquet FOOTER metadata for base-table row counts
(the reference's TableLayout stats, axiom/connectors/ConnectorMetadata.h:
262-269 — planning must never scan all base rows) plus `sample()` probes for
filter selectivity (sampleFilters analog), corrected by recorded history when
available (VeloxHistory analog). Join fanout is estimated by hash-sampling
the KEY DOMAIN on both sides of each edge (keep keys with
xxhash64(key) % mod == 0 — complete per-key groups survive, so per-key match
counts are unbiased; ref axiom/optimizer/JoinSample.cpp:28-60,
JoinEdge::guessFanout QueryGraph.h:643-652) and feeds the greedy order:
candidates are ranked by estimated RESULT growth, not by their base size
alone, so a small table reached over a high-fanout edge is demoted.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_BROADCAST_ROWS = 1_000_000  # ~rows that comfortably broadcast
# bytes-aware broadcast gate (Distribution::broadcast is byte-denominated in
# the reference, Schema.h:167-171): a side broadcasts when EITHER its row
# count clears broadcast_rows OR its estimated bytes fit the exchange budget
# while rows stay under a hard hash-build cap. A 2M-row × 24-byte filtered
# fact slice (~50 MB) beats re-shuffling a 60M-row probe side; a 10M-row
# build never broadcasts regardless of bytes (hash-build time dominates).
DEFAULT_BROADCAST_BYTES = 64 << 20
BROADCAST_ROW_CAP = 4_000_000

# -- transfer cost model (ref Cost struct RelationOp.h:39-74; constants
# Cost.h:95-123 — shuffle ≈ 12 units/byte vs unit memcpy: moving bytes
# between workers dominates, so the objective is byte-denominated) --------
SHUFFLE_COST_PER_BYTE = 1.0  # both sides cross the wire once
BROADCAST_REPLICATION = 8.0  # build side is copied to ~W workers
# Scanning a leaf is cheaper per byte than shuffling it (columnar read vs
# serialize+wire+deserialize; ref Cost.h:95-123 charges unit cost for local
# reads vs ~12x for shuffles). Leaf scan cost is a CONSTANT across join
# orders — every plan scans each leaf once — so adding it never changes the
# relative order of ordinary plans; it exists so an INDEX-LOOKUP candidate
# (which prunes the build scan) can be costed against them.
SCAN_COST_PER_BYTE = 0.3
# Per-probe-row key-compare charge of an index lookup, the reference's
# lookupCost shape: kKeyCompareCost * log2(range + 2) (Schema.cpp:450,
# Schema.h:241-264). Denominated here as bytes-touched-per-compare.
LOOKUP_COMPARE_BYTES = 8.0
_TYPE_WIDTH = {"string": 24.0, "binary": 24.0}  # est bytes; nested below


def _row_width(schema) -> float:
    """Estimated serialized row width in bytes from the schema — fixed
    per-type widths (numerics 8, strings ~24, nested ~48), the same
    schema-driven estimate Spark's own statistics default to when column
    stats are absent."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    total = 0.0
    for f in schema.fields:
        t = f.dataType
        if isinstance(t, (ArrayType, MapType, StructType)):
            total += 48.0
        else:
            total += _TYPE_WIDTH.get(t.simpleString(), 8.0)
    return max(total, 8.0)

# analyzed-plan operators that change row counts: footer metadata is only
# valid for bare scans (column pruning keeps counts; these do not)
_NON_SCAN_OPS = ("Filter", "Join", "Aggregate", "Generate", "Window",
                 "GlobalLimit", "LocalLimit", "Sample", "Distinct", "Union")


def _parquet_row_count(df: DataFrame) -> int | None:
    """Base-table row count from parquet footers — a driver-side metadata
    read, no Spark job, no data scan. Returns None when df is not a bare
    parquet scan (then the caller decides how to probe)."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None
    if any(op in plan for op in _NON_SCAN_OPS):
        return None
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    names = [f.rsplit("/", 1)[-1] for f in files]
    if all(".orc" in n for n in names):
        # ORC footers carry exact row counts too (driver-side metadata
        # read, no Spark job) — connector tables stored as ORC otherwise
        # pay a count() job per planning pass.
        return _orc_row_count(files)
    if any(".parquet" not in n for n in names):
        return None
    from verax_spark.sources.stats import parquet_stats

    stats = parquet_stats(list(files))  # process-cached footer read
    return None if stats is None else stats.num_rows


_ORC_COUNT_CACHE: dict[tuple, int] = {}


def _orc_row_count(files: list[str]) -> int | None:
    try:
        from pyarrow import orc as pa_orc
    except ImportError:
        return None
    total = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        try:
            st = os.stat(path)
            ck = (path, st.st_size, st.st_mtime_ns)
            n = _ORC_COUNT_CACHE.get(ck)
            if n is None:
                n = pa_orc.ORCFile(path).nrows
                _ORC_COUNT_CACHE[ck] = n
        except Exception:  # noqa: BLE001 - unreadable/foreign ORC: fall back
            return None
        total += n
    return total


@dataclass
class TableRef:
    """BaseTable analog: a relation plus its single-table filter.

    The predicate may be a Spark Column or a typed DSL Expr
    (verax_spark.plans.expr) — Expr predicates additionally unlock
    metadata-only selectivity estimation (sources/stats.selectivity) because
    their structure is inspectable; Columns always estimate by sampling.

    ``bucketed_by`` declares the table's physical layout (TableLayout
    bucketing, ConnectorMetadata.h:291-353): (bucket column names, bucket
    count). Two sides bucketed identically on the join keys are already
    co-partitioned — the cost model charges them zero shuffle
    (Distribution::isSamePartition, Schema.h:190)."""

    name: str
    df: DataFrame
    predicate: object | None = None  # Column | Expr | None
    bucketed_by: tuple[tuple[str, ...], int] | None = None
    # catalog table name behind the scan when known — lets the lookup-join
    # path stream probes against the bucketed layout (sources/layout.py)
    catalog_name: str | None = None
    # declared unique-key constraints beyond catalog.DECLARED_UNIQUE_COLUMNS
    # (trusted contract; footers can falsify but never prove uniqueness)
    unique_keys: frozenset = frozenset()

    def spark_predicate(self) -> Column | None:
        if self.predicate is None:
            return None
        if isinstance(self.predicate, Column):
            return self.predicate
        return self.predicate.to_spark()

    def filtered(self) -> DataFrame:
        pred = self.spark_predicate()
        return self.df.filter(pred) if pred is not None else self.df


@dataclass
class JoinEdge:
    """Equi-join edge (QueryGraph.h:416-464): left.key == right.key."""

    left: str
    right: str
    left_key: str
    right_key: str


@dataclass
class QueryGraph:
    """DerivedTable analog: tables + edges; plan() emits the ordered,
    hinted DataFrame join tree."""

    tables: dict[str, TableRef] = field(default_factory=dict)
    edges: list[JoinEdge] = field(default_factory=list)
    sample_fraction: float = 0.05
    broadcast_rows: int = DEFAULT_BROADCAST_ROWS
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES
    history: "ExecutionHistory | None" = None
    fanout_mod: int = 16  # key-domain hash-sample rate for fanout probes
    last_order: list[str] = field(default_factory=list)  # chosen join order
    # build-side reduction via imported semijoins ("existences",
    # ref optimizer/Plan.h:134-151, DerivedTable::import DerivedTable.cpp:293)
    semijoin_reduction: bool = True
    semijoin_factor: float = 10.0  # min big/partner row ratio to fire
    reductions: list[tuple[str, str]] = field(default_factory=list)
    # exact-enumeration bounds: branch-and-bound DP is exact to
    # ``dp_max_tables`` relations; ``dp_budget`` caps combination
    # evaluations (dense cliques) — past either, greedy takes over
    dp_max_tables: int = 14
    dp_budget: int = 500_000

    def table(
        self,
        name: str,
        df: DataFrame,
        predicate: Column | None = None,
        *,
        bucketed_by: tuple[tuple[str, ...], int] | None = None,
        unique_keys: frozenset | set | tuple = frozenset(),
    ) -> "QueryGraph":
        catalog_name = None
        if bucketed_by is None:
            # discover the physical layout behind the scan (views over
            # bucketed catalog tables included) — the reference optimizer
            # reads its ColumnGroups the same way (Schema.h:238-264)
            from verax_spark.sources.layout import bucket_layout_of_df

            found = bucket_layout_of_df(df)
            if found is not None:
                bucketed_by = (found[0], found[1])
                catalog_name = found[2]
        self.tables[name] = TableRef(
            name, df, predicate, bucketed_by, catalog_name,
            frozenset(unique_keys),
        )
        return self

    def edge(self, left: str, left_key: str, right: str, right_key: str) -> "QueryGraph":
        self.edges.append(JoinEdge(left, right, left_key, right_key))
        return self

    # -- implied edges from equality classes (addImpliedJoins analog) --------
    def add_implied_edges(self) -> list[JoinEdge]:
        """Close the join graph under equality transitivity: a.k=b.k and
        b.k=c.k imply a.k=c.k (ref Column::Equivalence QueryGraph.h:154-157,
        416-419; DerivedTable::addImpliedJoins DerivedTable.cpp:90). The
        implied edges widen the enumeration space — without them a chain
        graph forces the middle table early even when joining the two
        endpoints first is far cheaper. Inner-join equivalence classes make
        this rewrite exact. Idempotent; returns the edges added."""
        parent: dict[tuple[str, str], tuple[str, str]] = {}

        def find(x: tuple[str, str]) -> tuple[str, str]:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a: tuple[str, str], b: tuple[str, str]) -> None:
            parent[find(a)] = find(b)

        for e in self.edges:
            union((e.left, e.left_key), (e.right, e.right_key))
        classes: dict[tuple[str, str], list[tuple[str, str]]] = {}
        for node in list(parent):
            classes.setdefault(find(node), []).append(node)
        existing = {
            frozenset([(e.left, e.left_key), (e.right, e.right_key)])
            for e in self.edges
        }
        added: list[JoinEdge] = []
        for members in classes.values():
            for i, (t1, k1) in enumerate(members):
                for t2, k2 in members[i + 1 :]:
                    if t1 == t2:
                        continue
                    pair = frozenset([(t1, k1), (t2, k2)])
                    if pair in existing:
                        continue
                    existing.add(pair)
                    added.append(JoinEdge(t1, t2, k1, k2))
        self.edges.extend(added)
        return added

    # -- cardinality estimation (TableLayout stats + sampleFilters analog) ---
    def _base_rows(self, ref: TableRef) -> float:
        meta = _parquet_row_count(ref.df)
        if meta is not None:
            return float(meta)
        # non-parquet relation (in-memory test data): count is the fallback
        return float(ref.df.count())

    def _estimate_rows(self, ref: TableRef) -> float:
        # per-instance memo: a planning pass consults the same scan estimate
        # from several places (DP, fanout fast path) — sample once
        if not hasattr(self, "_est_memo"):
            self._est_memo: dict[str, float] = {}
        memo_key = self._signature(ref)
        if memo_key in self._est_memo:
            return self._est_memo[memo_key]
        out = self._estimate_rows_uncached(ref)
        self._est_memo[memo_key] = out
        return out

    def _estimate_rows_uncached(self, ref: TableRef) -> float:
        if self.history is not None:
            remembered = self.history.lookup(self._signature(ref))
            if remembered is not None:
                return remembered
        base = self._base_rows(ref)
        if ref.predicate is None or base == 0:
            return base
        # metadata-only fast path: Expr predicates over footer column stats
        # (ConnectorMetadata.h:51-93 ColumnStatistics) — zero Spark jobs
        from verax_spark.plans.expr import Expr as _DslExpr

        if isinstance(ref.predicate, _DslExpr):
            from verax_spark.sources.stats import selectivity, table_stats

            stats = table_stats(ref.df)
            if stats is not None:
                sel = selectivity(stats, ref.predicate)
                if sel is not None:
                    return base * sel
        if base <= 10_000:
            return float(ref.filtered().count())
        # selectivity from a sampled probe — never a full-table filter count
        sample = ref.df.sample(fraction=self.sample_fraction, seed=42)
        n_sample = sample.count()
        if n_sample == 0:
            return base
        hits = sample.filter(ref.spark_predicate()).count()
        return base * (hits / n_sample)

    # -- join fanout sampling (JoinSample.cpp:28-60 analog) ------------------
    def _edge_fanout(self, e: JoinEdge, mod: int | None = None) -> tuple[float, float]:
        """(left→right, right→left) fanout: expected matches per probe row.

        Hash-samples the shared key domain (xxhash64(key) % mod == 0): both
        sides keep the SAME sampled keys with all their rows, so per-key
        match counts are exact for sampled keys and the ratio estimator is
        unbiased. One small aggregation job per edge; scans prune to the key
        column only.
        """
        mod = self.fanout_mod if mod is None else mod
        fps = (
            f"{self._fingerprint(self.tables[e.left])},"
            f"{self._fingerprint(self.tables[e.right])}"
        )
        sig = (
            f"edge:{e.left}.{e.left_key}={e.right}.{e.right_key}|mod={mod}|fp={fps}"
        )
        if self.history is not None:
            fwd = self.history.lookup(sig + "|l2r")
            rev = self.history.lookup(sig + "|r2l")
            if fwd is not None and rev is not None:
                return fwd, rev
        meta = self._metadata_fanout(e)
        if meta is not None:
            # NOT recorded into history: footer-derived numbers are free to
            # recompute and must not outlive the files they describe (ADVICE
            # r03 — a stale or unsound metadata fanout persisted here would
            # silently steer join order across queries).
            return meta
        if mod > 1 and max(
            self._estimate_rows(self.tables[e.left]),
            self._estimate_rows(self.tables[e.right]),
        ) <= 10_000:
            # Small relations (memoized estimate, often footer-free sources
            # like CSV/JSON connectors): the hash sample would very likely
            # miss a low-cardinality key domain and trigger the exhaustive
            # mod=1 re-probe anyway — go exhaustive directly and save the
            # wasted sampling job (mod=1 is exact, cost ~ #rows ≤ 10k).
            return self._edge_fanout(e, mod=1)

        def keyed(name: str, key: str) -> DataFrame:
            return (
                self.tables[name]
                .filtered()
                .select(F.col(key).alias("__k"))
                .filter(F.pmod(F.xxhash64("__k"), F.lit(mod)) == 0)
                .groupBy("__k")
                .agg(F.count(F.lit(1)).alias("__c"))
            )

        stats = (
            keyed(e.left, e.left_key)
            .withColumnRenamed("__c", "__cl")
            .join(
                keyed(e.right, e.right_key).withColumnRenamed("__c", "__cr"),
                "__k",
                "full_outer",  # unmatched keys count toward the denominators
            )
            .agg(
                F.sum(
                    F.coalesce(F.col("__cl"), F.lit(0))
                    * F.coalesce(F.col("__cr"), F.lit(0))
                ).alias("pairs"),
                F.sum(F.coalesce(F.col("__cl"), F.lit(0))).alias("lrows"),
                F.sum(F.coalesce(F.col("__cr"), F.lit(0))).alias("rrows"),
            )
            .collect()[0]
        )
        if not stats.lrows or not stats.rrows:
            # A low-cardinality key domain (e.g. 25 nation keys) can dodge
            # the hash sample entirely — a silent neutral (1.0) here once
            # made a 60,000x-fanout nationkey edge look free and planned a
            # billion-row intermediate. Re-probe exhaustively over the key
            # domain (mod=1 groups by key: cost ~ #distinct keys, cheap
            # precisely when the sample came back empty).
            if mod > 1:
                return self._edge_fanout(e, mod=1)
            if stats.lrows or stats.rrows:
                return 0.0, 0.0  # provably disjoint key domains
            return 1.0, 1.0  # both sides empty under no sampling: no data
        if not stats.pairs:
            return 0.0, 0.0  # sampled keys exist on both sides, none match
        l2r = float(stats.pairs) / float(stats.lrows)
        r2l = float(stats.pairs) / float(stats.rrows)
        if self.history is not None:
            self.history.record_estimate(sig + "|l2r", l2r)
            self.history.record_estimate(sig + "|r2l", r2l)
        return l2r, r2l

    def _metadata_fanout(self, e: JoinEdge) -> tuple[float, float] | None:
        """Zero-job fanout from metadata: when one side's key column is
        UNIQUE — a declared unique-key constraint (catalog.
        DECLARED_UNIQUE_COLUMNS / TableRef.unique_keys, the connector-
        metadata contract) or an exact footer distinct_count == num_values —
        every probe from the other side matches ≤ 1 row, and the unique
        side's fanout is rows_other/rows_unique scaled by the key-range
        overlap and the key density (num_values / range span; 1.0 for the
        dense surrogate-key layout). Footer min/max/count alone can NEVER
        prove uniqueness ([1,2,2,4] passes every range test), so they are
        used only to FALSIFY a declared constraint: nulls present, or
        pigeonhole (more values than range slots) → fall back to sampling.
        This replaces a sampling job per PK edge with a footer read — at
        planning time over 100 TB the difference between touching data and
        touching metadata. Filters are handled by the uniformity
        assumption: a PROBE-side filter leaves matches-per-probe-row
        unchanged; a PK-side filter scales matches-per-probe-row by the
        PK's (memoized) filter selectivity, with per-key counts still ≤ 1
        since uniqueness holds on the unfiltered layout. Falls back to
        sampling (None) whenever the proof doesn't hold."""
        from verax_spark.catalog import DECLARED_UNIQUE_COLUMNS
        from verax_spark.sources.stats import table_stats

        def unique_range(name: str, key: str):
            ref = self.tables[name]
            stats = table_stats(ref.df)
            if stats is None:
                return None
            cs = stats.columns.get(key)
            if cs is None or cs.null_count or not isinstance(cs.min, int):
                return None
            if cs.num_values != stats.num_rows:
                return None
            span = cs.max - cs.min + 1
            if span < cs.num_values:
                return None  # pigeonhole: provably non-unique
            proven = (
                (cs.distinct_count is not None and cs.distinct_count == cs.num_values)
                or key in ref.unique_keys
                or key in DECLARED_UNIQUE_COLUMNS
            )
            if not proven:
                return None
            base = float(stats.num_rows)
            sel = 1.0
            if ref.predicate is not None:
                sel = self._estimate_rows(ref) / base if base else 1.0
            density = cs.num_values / span if span else 1.0
            return (cs.min, cs.max, base, sel, density)

        def side_rows_range(name: str, key: str):
            ref = self.tables[name]
            stats = table_stats(ref.df)
            if stats is None:
                return None
            cs = stats.columns.get(key)
            if cs is None or not isinstance(cs.min, int):
                return None
            # filtered probe: footer key range (filters rarely move it) with
            # the filtered row estimate — stats/sample-derived, memoized
            rows = (
                float(stats.num_rows)
                if ref.predicate is None
                else self._estimate_rows(ref)
            )
            return (cs.min, cs.max, rows)

        for unique_side in ("left", "right"):
            uname = getattr(e, unique_side)
            ukey = e.left_key if unique_side == "left" else e.right_key
            oname = e.right if unique_side == "left" else e.left
            okey = e.right_key if unique_side == "left" else e.left_key
            u = unique_range(uname, ukey)
            if u is None:
                continue
            o = side_rows_range(oname, okey)
            if o is None:
                continue
            lo, hi = max(u[0], o[0]), min(u[1], o[1])
            if hi < lo:
                return 0.0, 0.0
            # fraction of the other side's key range covered by the PK
            # domain (uniformity assumption — same model as selectivity())
            cover = (hi - lo + 1) / (o[1] - o[0] + 1) if o[1] > o[0] else 1.0
            sel = u[3]  # PK-side filter selectivity (1.0 when unfiltered)
            # ≤1 match per probe row into the unique side; sparse unique
            # keys (density < 1) thin the matches under uniformity
            per_probe = cover * u[4] * sel
            per_unique = o[2] * cover / u[2]  # avg probe rows per PK row
            if unique_side == "right":
                return per_probe, per_unique
            return per_unique, per_probe
        return None

    def _signature(self, ref: TableRef) -> str:
        pred = "" if ref.predicate is None else str(ref.predicate)
        sig = f"scan:{ref.name}|{pred}|fp={self._fingerprint(ref)}"
        # A non-bare-scan relation (view with limits/projections/joins)
        # shares its ALIAS and FILE fingerprint with the bare scan it reads
        # — without a plan digest, a `LIMIT 5` view over orders would reuse
        # history recorded for a full orders scan under the same alias
        # (observed: est 1500 instead of 5, flipping a lookup-join choice).
        # Bare scans keep the stable signature (ANALYZE feedback relies on
        # it); everything else folds its analyzed plan in.
        try:
            plan = ref.df._jdf.queryExecution().analyzed().toString()
        except Exception:
            return sig
        if any(op in plan for op in _NON_SCAN_OPS):
            import hashlib

            sig += f"|plan={hashlib.md5(plan.encode()).hexdigest()[:10]}"
        return sig

    def _fingerprint(self, ref: TableRef) -> str:
        """Cheap identity of the underlying files (paths + sizes + mtimes)
        folded into every history signature, so entries die with the data
        they describe — the shared history is process-wide and testdata is
        regenerated between rounds (ADVICE r03). Driver-side metadata only;
        memoized per planning pass."""
        if not hasattr(self, "_fp_memo"):
            self._fp_memo: dict[str, str] = {}
        if ref.name in self._fp_memo:
            return self._fp_memo[ref.name]
        out = "mem"
        try:
            files = ref.df.inputFiles()
        except Exception:
            files = []
        if files:
            import hashlib
            import os as _os

            h = hashlib.md5()
            for f in sorted(files):
                p = f.removeprefix("file://").removeprefix("file:")
                try:
                    st = _os.stat(p)
                    h.update(f"{p}|{st.st_size}|{int(st.st_mtime)};".encode())
                except OSError:
                    h.update(f"{p};".encode())
            out = h.hexdigest()[:12]
        self._fp_memo[ref.name] = out
        return out

    # -- ordering (makeJoins analog) -----------------------------------------
    def plan(self, algorithm: str = "auto") -> DataFrame:
        """Join ordering:

        - ``dp`` (default for ≤10 tables): memoized enumeration over ALL
          left-deep AND bushy orders with the C_out cost (sum of intermediate
          cardinalities from footer row counts × sampled edge fanouts) — the
          reference's memoized branch-and-bound (Optimization.cpp:1555
          makeJoins, MemoKey Plan.h:134-151) collapsed to exact subset DP,
          affordable at this arity in Python;
        - ``greedy``: smallest-projected-result frontier expansion, for
          graphs too wide to enumerate.

        Both broadcast sides under the row threshold and record estimates
        into history.
        """
        if not self.tables:
            raise ValueError("empty query graph")
        self.add_implied_edges()
        if algorithm == "auto":
            algorithm = "dp" if len(self.tables) <= self.dp_max_tables else "greedy"
        if algorithm == "dp":
            return self._plan_dp()
        return self._plan_greedy()

    def _plan_greedy(self) -> DataFrame:
        est = {name: self._estimate_rows(ref) for name, ref in self.tables.items()}
        if self.history is not None:
            for name, ref in self.tables.items():
                self.history.record_estimate(self._signature(ref), est[name])

        fanouts: dict[int, tuple[float, float]] = {}

        def edge_fanout(e: JoinEdge) -> tuple[float, float]:
            key = id(e)
            if key not in fanouts:
                fanouts[key] = self._edge_fanout(e)
            return fanouts[key]

        start = min(est, key=lambda n: est[n])
        joined = {start}
        current = self.tables[start].filtered()
        current_est = est[start]
        self.last_order = [start]

        def frontier() -> list[tuple[str, JoinEdge]]:
            out = []
            for e in self.edges:
                if e.left in joined and e.right not in joined:
                    out.append((e.right, e))
                elif e.right in joined and e.left not in joined:
                    out.append((e.left, e))
            return out

        def growth(cand: tuple[str, JoinEdge]) -> float:
            nxt, e = cand
            l2r, r2l = edge_fanout(e)
            return l2r if e.left in joined else r2l

        while len(joined) < len(self.tables):
            candidates = frontier()
            if not candidates:
                # disconnected graph → cross join smallest remaining
                rest = [n for n in self.tables if n not in joined]
                nxt = min(rest, key=lambda n: est[n])
                current = current.crossJoin(self._side(nxt, est))
                current_est *= max(est[nxt], 1.0)
                joined.add(nxt)
                self.last_order.append(nxt)
                continue
            nxt, e = min(
                candidates, key=lambda c: (current_est * growth(c), est[c[0]])
            )
            left_in = e.left in joined
            my_key = e.left_key if left_in else e.right_key
            other_key = e.right_key if left_in else e.left_key
            partner = e.left if left_in else e.right
            side = self._maybe_reduce(
                nxt, self._side(nxt, est), partner, my_key, other_key, est
            )
            current = current.join(side, F.col(my_key) == F.col(other_key))
            current_est *= growth((nxt, e))
            joined.add(nxt)
            self.last_order.append(nxt)
        return current

    def broadcastable(self, rows: float, width: float) -> bool:
        """Byte-aware broadcast gate (see DEFAULT_BROADCAST_BYTES)."""
        if rows <= self.broadcast_rows:
            return True
        return rows <= BROADCAST_ROW_CAP and rows * width <= self.broadcast_bytes

    def _side(self, name: str, est: dict[str, float]) -> DataFrame:
        ref = self.tables[name]
        df = ref.filtered()
        if self.broadcastable(est[name], _row_width(ref.df.schema)):
            df = F.broadcast(df)
        return df

    # -- build-side reduction ("existences" analog) --------------------------
    def _maybe_reduce(
        self,
        leaf: str,
        df: DataFrame,
        partner: str,
        partner_key: str,
        leaf_key: str,
        est: dict[str, float],
    ) -> DataFrame:
        """Semi-join a big shuffle side down to the keys that survive a
        filtered partner BEFORE the main join (JoinCandidate::existences,
        ref optimizer/Plan.h:134-151; DerivedTable::import
        DerivedTable.cpp:293). The broadcast LeftSemi costs one extra
        broadcast but removes every non-matching row from the big side's
        shuffle — the dominant cost at scale. Exact for any join type the
        planner emits (inner equi-joins). Fires only when the partner is
        actually restricted (a filter exists) and the size ratio clears
        ``semijoin_factor``; a tiny-but-unfiltered dimension would broadcast
        its whole key domain and reduce nothing."""
        if not self.semijoin_reduction:
            return df
        if self.tables[partner].predicate is None:
            return df
        if est[partner] > self.broadcast_rows:
            return df
        if est[leaf] <= self.semijoin_factor * max(est[partner], 1.0):
            return df
        keys = (
            self.tables[partner]
            .filtered()
            .select(F.col(partner_key).alias(leaf_key))
            .distinct()
        )
        self.reductions.append((leaf, partner))
        return df.join(F.broadcast(keys), leaf_key, "left_semi")

    # -- exact enumeration (memoized makeJoins analog) -----------------------
    def choose_tree(self) -> tuple[tuple | None, dict[str, float]]:
        """Run the subset-DP decision only: returns (tree, est) without
        building any DataFrame. ``tree`` is None when the graph has no
        connected cover (caller falls back to greedy/textual order). Used by
        the SQL front door to re-render a FROM clause in the chosen order.
        """
        if not self.tables:
            raise ValueError("empty query graph")
        self.add_implied_edges()
        return self._choose_tree_dp()

    def _plan_dp(self) -> DataFrame:
        tree, est = self._choose_tree_dp()
        if tree is None:
            # fully disconnected pieces: fall back to greedy cross-joining
            return self._plan_greedy()
        self.last_tree = tree  # inspectable chosen shape (left-deep vs bushy)
        self.last_order = []
        return self._build_tree(tree, est)

    def _choose_tree_dp(self) -> tuple[tuple | None, dict[str, float]]:
        """Branch-and-bound subset DP over left-deep + bushy join trees.

        best[S] holds (cost, rows, tree) for every connected subset S; trees
        combine either leaf-extension (left-deep step) or two memoized
        subtrees (bushy join). Growth across a join picks the MIN fanout
        among all crossing edges (the remaining crossing edges are applied
        as additional filters, which only shrink the result).

        The objective is byte-denominated (ref Cost{unitCost, fanout,
        totalBytes, transferBytes} RelationOp.h:39-74, constants
        Cost.h:95-123): each join adds (a) output materialization
        rows × subtree row width, and (b) the cheaper of shuffling both
        sides vs broadcasting the smaller eligible side × replication —
        so when two orders tie on C_out, the one moving fewer (or
        broadcastable) bytes wins.

        Branch-and-bound (ref Plan.h:273-276 — partial plans are pruned
        against the best complete plan): a greedy complete plan seeds the
        upper bound, and any partial subset whose cost already meets it is
        dropped — admissible because every cost term is nonnegative, so a
        subset's cost lower-bounds every completion through it. This keeps
        exact enumeration affordable to ``dp_max_tables`` (14) relations on
        the sparse FK graphs real queries have; ``dp_budget`` caps
        combination evaluations on dense cliques, falling back to the
        greedy plan (the reference's enumeration degrades the same way,
        Optimization.h:322 memo + heuristic cutoffs)."""
        est = {name: self._estimate_rows(ref) for name, ref in self.tables.items()}
        if self.history is not None:
            for name, ref in self.tables.items():
                self.history.record_estimate(self._signature(ref), est[name])
        fanout = {id(e): self._edge_fanout(e) for e in self.edges}
        leaf_width = {
            name: _row_width(ref.df.schema) for name, ref in self.tables.items()
        }

        names = list(self.tables)
        full = frozenset(names)

        def width(s: frozenset) -> float:
            return sum(leaf_width[n] for n in s)

        def co_partitioned(s1: frozenset, s2: frozenset, edges) -> bool:
            """Both sides are single tables bucketed identically on the
            join keys (isSamePartition analog) — the join runs bucket-local
            with zero exchange."""
            if len(s1) != 1 or len(s2) != 1 or not edges:
                return False
            b1 = self.tables[next(iter(s1))].bucketed_by
            b2 = self.tables[next(iter(s2))].bucketed_by
            if b1 is None or b2 is None or b1[1] != b2[1]:
                return False
            keys1, keys2 = set(), set()
            for e, _ in edges:
                if e.left in s1:
                    keys1.add(e.left_key)
                    keys2.add(e.right_key)
                else:
                    keys1.add(e.right_key)
                    keys2.add(e.left_key)
            return set(b1[0]) == keys1 and set(b2[0]) == keys2

        def transfer(r1: float, w1: float, r2: float, w2: float) -> float:
            shuffle = (r1 * w1 + r2 * w2) * SHUFFLE_COST_PER_BYTE
            bcast = float("inf")
            if self.broadcastable(r1, w1):
                bcast = r1 * w1 * BROADCAST_REPLICATION
            if self.broadcastable(r2, w2):
                bcast = min(bcast, r2 * w2 * BROADCAST_REPLICATION)
            return min(shuffle, bcast)

        def crossing(s1: frozenset, s2: frozenset) -> list[tuple[JoinEdge, float]]:
            out = []
            for e in self.edges:
                l2r, r2l = fanout[id(e)]
                if e.left in s1 and e.right in s2:
                    out.append((e, l2r))
                elif e.right in s1 and e.left in s2:
                    out.append((e, r2l))
            return out

        def lookup_entry(probe_s, build_s, probe_e, build_e, edges, rows):
            """(cost, tree) of an INDEX-LOOKUP join — the reference's
            joinByIndex candidate (Optimization.cpp:817: single base table,
            costed per probe with ColumnGroup::lookupCost, Schema.cpp:450).
            Applicable when the build side is one base table whose bucketed
            +sorted layout covers exactly the join key of ONE crossing
            edge. Cost: ship the probe's keys (broadcast-style), one
            log2-compare per probe row into the sorted layout, and a scan
            PRUNED to the matching rows — replacing the build leaf's
            full-scan cost. Wins precisely when the probe is small relative
            to the build; a large probe loses on the compare+key-ship terms
            and the ordinary join stands. None when not applicable."""
            import math

            if len(build_s) != 1 or len(edges) != 1:
                return None
            bname = next(iter(build_s))
            ref = self.tables[bname]
            if ref.bucketed_by is None or build_e[2][0] != "leaf":
                return None
            e = edges[0][0]
            build_key = e.right_key if e.left in probe_s else e.left_key
            if set(ref.bucketed_by[0]) != {build_key}:
                return None
            cp, rp, tp = probe_e
            rb = est[bname]
            wb = leaf_width[bname]
            pruned_scan = min(rb, rows) * wb * SCAN_COST_PER_BYTE
            cost = (
                # the probe pipeline executes TWICE: once to materialize
                # its key domain (lookup_join's bounded collect) and once
                # in the final plan — charge both (r10; the uncharged
                # second execution made lookup beat a co-partitioned
                # join it measurably loses to)
                2.0 * cp
                + pruned_scan
                + rows * width(probe_s | build_s)
                + rp * 8.0 * BROADCAST_REPLICATION  # ship probe keys
                + rp * LOOKUP_COMPARE_BYTES * math.log2(rb + 2.0)
            )
            return cost, ("lookup", tp, ("leaf", bname), [e])

        def join_step(s1, s2, entry1, entry2):
            """(cost, rows, tree, has_edges) of joining two planned
            disjoint subsets — the single shared costing step."""
            edges = crossing(s1, s2)
            c1, r1, t1 = entry1
            c2, r2, t2 = entry2
            if edges:
                growth = min(g for _, g in edges)
                rows = r1 * growth
                tree = ("join", t1, t2, [e for e, _ in edges])
            else:
                rows = r1 * max(r2, 1.0)
                tree = ("cross", t1, t2)
            move = (
                0.0
                if co_partitioned(s1, s2, edges)
                else transfer(r1, width(s1), r2, width(s2))
            )
            cost = c1 + c2 + rows * width(s1 | s2) + move
            if edges:
                # index-lookup alternative in BOTH directions (the
                # reference tries joinByIndex for every candidate pair)
                for probe_s, build_s, pe, be in (
                    (s1, s2, entry1, entry2),
                    (s2, s1, entry2, entry1),
                ):
                    alt = lookup_entry(probe_s, build_s, pe, be, edges, rows)
                    if alt is not None and alt[0] < cost:
                        cost, tree = alt
            return cost, rows, tree, bool(edges)

        def leaf_entry(n: str) -> tuple[float, float, tuple]:
            # leaf cost = its scan (constant across orders — see
            # SCAN_COST_PER_BYTE — but the term an index lookup prunes)
            return (
                est[n] * leaf_width[n] * SCAN_COST_PER_BYTE,
                est[n],
                ("leaf", n),
            )

        def greedy_entry() -> tuple[float, float, tuple] | None:
            """Complete plan from smallest-cost-step frontier expansion —
            the branch-and-bound upper bound AND the fallback plan."""
            if not names:
                return None
            start = min(names, key=lambda n: est[n])
            cur_set = frozenset([start])
            cur = leaf_entry(start)
            while len(cur_set) < len(names):
                rest = [n for n in names if n not in cur_set]
                cands = [n for n in rest if crossing(cur_set, frozenset([n]))]
                if not cands:
                    cands = rest  # disconnected: forced cross join
                step_best = None
                pick = None
                for n in cands:
                    step = join_step(
                        cur_set,
                        frozenset([n]),
                        cur,
                        leaf_entry(n),
                    )
                    if step_best is None or step[0] < step_best[0]:
                        step_best, pick = step, n
                cur_set |= {pick}
                cur = step_best[:3]
            return cur

        ub_entry = greedy_entry()
        ub = ub_entry[0] if ub_entry is not None else float("inf")

        # best[S] = (cost, rows, tree); tree = ("leaf", name) |
        # ("join", treeL, treeR, [edges]) | ("cross", treeL, treeR)
        best: dict[frozenset, tuple[float, float, tuple]] = {
            frozenset([n]): leaf_entry(n) for n in names
        }
        subsets_by_size: dict[int, list[frozenset]] = {1: list(best)}
        evals = 0
        for size in range(2, len(names) + 1):
            level: list[frozenset] = []
            seen: set[frozenset] = set()
            for lsize in range(1, size // 2 + 1):
                for s1 in subsets_by_size.get(size - lsize, []):
                    for s2 in subsets_by_size.get(lsize, []):
                        if s1 & s2:
                            continue
                        evals += 1
                        if evals > self.dp_budget:
                            # dense graph blew the budget: greedy stands
                            return (
                                (ub_entry[2], est)
                                if ub_entry is not None
                                else (None, est)
                            )
                        cost, rows, tree, has_edges = join_step(
                            s1, s2, best[s1], best[s2]
                        )
                        if not has_edges and size < len(names):
                            continue  # defer cross joins until forced
                        if cost >= ub and size < len(names):
                            continue  # B&B prune: no completion can win
                        s = s1 | s2
                        cur = best.get(s)
                        if cur is None or cost < cur[0]:
                            best[s] = (cost, rows, tree)
                            if s == full:
                                ub = min(ub, cost)  # tighten the bound
                            elif s not in seen:
                                seen.add(s)
                                level.append(s)
            subsets_by_size[size] = level
        if full in best and (ub_entry is None or best[full][0] <= ub_entry[0]):
            return best[full][2], est
        if ub_entry is not None:
            return ub_entry[2], est
        return None, est

    def _build_tree(self, tree: tuple, est: dict[str, float]) -> DataFrame:
        kind = tree[0]
        if kind == "leaf":
            self.last_order.append(tree[1])
            return self._side(tree[1], est)
        if kind == "lookup":
            # planner-chosen index-lookup join (joinByIndex analog): stream
            # the small probe against the build table's bucketed layout,
            # pushing the probe key domain into the build scan
            probe = self._build_tree(tree[1], est)
            bname = tree[2][1]
            self.last_order.append(bname)
            ref = self.tables[bname]
            e = tree[3][0]
            in_probe = e.left != bname
            probe_key = e.left_key if in_probe else e.right_key
            build_key = e.right_key if in_probe else e.left_key
            from verax_spark.sources.layout import lookup_join

            return lookup_join(
                probe,
                ref.filtered(),
                probe_key,
                build_key,
                build_table=ref.catalog_name,
            )
        left = self._build_tree(tree[1], est)
        right = self._build_tree(tree[2], est)
        if kind == "cross":
            return left.crossJoin(right)
        # existences: when a subtree is a single big leaf, semi-reduce it by
        # the filtered partner on the other side of its first join edge
        for side_ix, other_ix in ((2, 1), (1, 2)):
            sub = tree[side_ix]
            if sub[0] != "leaf":
                continue
            leaf = sub[1]
            for e in tree[3]:
                if e.left == leaf:
                    partner, pkey, lkey = e.right, e.right_key, e.left_key
                elif e.right == leaf:
                    partner, pkey, lkey = e.left, e.left_key, e.right_key
                else:
                    continue
                reduced = self._maybe_reduce(
                    leaf,
                    right if side_ix == 2 else left,
                    partner,
                    pkey,
                    lkey,
                    est,
                )
                if side_ix == 2:
                    right = reduced
                else:
                    left = reduced
                break
        cond = None
        for e in tree[3]:
            c = F.col(e.left_key) == F.col(e.right_key)
            cond = c if cond is None else (cond & c)
        return left.join(right, cond)
