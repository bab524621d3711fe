"""Presto-dialect SQL front door: parse → AST → Spark SQL → Catalyst.

The reference parses Presto SQL with a generated ANTLR parser into a typed
AST, then binds it against connector schemas (axiom/sql/presto/, ~31k
generated lines; driver axiom/optimizer/tests/PrestoParser.cpp:1159),
supporting SELECT and EXPLAIN statements only
(axiom/optimizer/tests/SqlStatement.h:23-79).

This front door is the same pipeline, Spark-first:

1. **Parse** — hand-written recursive-descent parser
   (verax_spark/sql/parser.py) over the reference grammar subset → typed
   AST (verax_spark/sql/ast.py, node inventory mirrors AstExpressions.h /
   AstRelations.h: quantified comparisons, UNNEST with ordinality, lateral
   subqueries, sampled relations, typed literals, lambdas, window frames).
2. **Lower** — each AST node renders itself to Spark SQL, where the dialect
   differences are fixed structurally (1-based subscripts → element_at,
   ARRAY[..] → array(..), ROW → struct, MAP(ARRAY,ARRAY) → map_from_arrays,
   typed literals → casts, quantified comparisons → IN / min-max scalar
   subqueries, UNNEST in any join spelling → LATERAL VIEW explode/inline,
   TABLESAMPLE BERNOULLI(p) → TABLESAMPLE (p PERCENT)). Unsupported
   constructs raise NotImplementedError naming the PlanBuilder alternative —
   never a silent pass-through.
3. **Analyze/execute** — ``spark.sql``: Catalyst does name resolution, type
   inference and coercions exactly where the reference's ExprResolver does
   (axiom/logical_plan/PlanBuilder.h:32-98).

Function names: 1:1 renames happen at render time
(functions.presto.PRESTO_TO_SPARK); arity/semantics-divergent names
(truncate, sha256, json_parse, infinity, ...) stay spelled as-is and resolve
against Catalyst-inlined SQL UDFs (functions.presto.register_sql_compat).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from verax_spark.sources import versions
from verax_spark.sql import ast
from verax_spark.sql.parser import parse


def transpile(sql: str) -> str:
    """Presto SQL text → Spark SQL text (parse + render; raises ParseError /
    NotImplementedError on invalid or unsupported input)."""
    stmt = parse(sql)
    if isinstance(stmt, ast.ExplainStmt):
        stmt = stmt.query
    return stmt.sql()


_SPARK_TO_PRESTO_TYPE = {
    "string": "varchar",
    "int": "integer",
    "float": "real",
    "binary": "varbinary",
}


def _presto_type(spark_type: str) -> str:
    """Spark DDL type name → Presto spelling (word-level; nested types keep
    their structure with element words mapped)."""
    import re as _re

    return _re.sub(
        r"\b(string|int|float|binary)\b",
        lambda m: _SPARK_TO_PRESTO_TYPE[m.group(1)],
        spark_type,
    )


# appId → sf_dir whose views are currently registered in that session
_REGISTERED: dict[str, str] = {}


def _proc_flush_metadata_cache(session: "PrestoSession") -> str:
    """CALL system.flush_metadata_cache(): drop the session's cached scan
    DataFrames + footer stats and Spark's file-listing caches, so the next
    plan re-reads footers (Presto's hive.system.flush_metadata_cache
    procedure shape; our caches are catalog._cache/_stats + _SCAN_CACHE)."""
    from verax_spark import catalog as cat_mod

    n = len(session.catalog._cache) + len(cat_mod._SCAN_CACHE)
    session.catalog._cache.clear()
    session.catalog._stats.clear()
    cat_mod._SCAN_CACHE.clear()
    # footer-stat caches too (ADVICE r09): the catalog-level cache pins
    # DataFrames by id, the sources-level one is file-fingerprint keyed —
    # both must drop so a vacuum/table-rewrite re-reads footers
    cat_mod._STATS_CACHE.clear()
    from verax_spark.sources import stats as stats_mod

    stats_mod._STATS_CACHE.clear()
    session._pinned.clear()  # pinned DML-table schemas re-infer too
    session.spark.catalog.clearCache()
    return f"flushed {n} cached scans"


def _proc_vacuum(session: "PrestoSession", table: str, keep: int = 1) -> str:
    """CALL system.vacuum(table, keep): drop all but the newest ``keep``
    time-travel snapshots of a writable table and delete retired files no
    surviving snapshot references (the lakehouse VACUUM shape; bounds the
    storage the FOR VERSION AS OF history holds)."""
    path = session._writable_path(table)
    n = versions.vacuum(path, keep=int(keep))
    return f"vacuumed {n} files, kept {keep} versions"


def _sql_literal(v) -> str:
    """Render a Python value as a SQL constant (parameter binding)."""
    import datetime

    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        return f"timestamp '{v}'"
    if isinstance(v, datetime.date):
        return f"date '{v}'"
    raise TypeError(f"cannot bind parameter of type {type(v).__name__}")


def _const_scalar(e) -> float:
    """Python value of a constant numeric AST expression (version bounds)."""
    if isinstance(e, ast.Raw):
        try:
            return int(e.text)
        except ValueError:
            return float(e.text)
    if isinstance(e, ast.UnOp) and e.op == "-":
        return -_const_scalar(e.operand)
    raise ValueError(f"constant version bound required, got {e.sql()}")


def _const_epoch(e) -> float:
    """Epoch seconds of a constant timestamp bound: TIMESTAMP '...' / a
    bare ISO string / a numeric epoch. Naive literals are interpreted in
    the session's local timezone (datetime.fromisoformat semantics)."""
    from datetime import datetime

    if isinstance(e, ast.TypedLit) and e.type_.lower() == "timestamp":
        return datetime.fromisoformat(e.value.strip("'")).timestamp()
    if isinstance(e, ast.Raw):
        t = e.text
        if t.startswith("'") and t.endswith("'"):
            return datetime.fromisoformat(t[1:-1]).timestamp()
        return float(t)
    raise ValueError(f"constant timestamp bound required, got {e.sql()}")


def _walk_expr(node):
    """Pre-order walk over an AST dataclass tree (fields that are nodes or
    lists/tuples of nodes)."""
    import dataclasses

    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        if dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if dataclasses.is_dataclass(v):
                    stack.append(v)
                elif isinstance(v, (list, tuple)):
                    stack.extend(x for x in v if dataclasses.is_dataclass(x))


try:  # pyspark 4: the pyspark.sql.DataFrame facade's __new__ pins the
    # concrete class, so subclass the classic implementation directly
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame
except ImportError:  # pragma: no cover - older pyspark
    _ClassicDataFrame = DataFrame


class _ObservedFrame(_ClassicDataFrame):
    """DataFrame whose full actions flush execution feedback: after
    collect()/toPandas(), the executed plan's per-scan actual row counts are
    recorded into the shared ExecutionHistory under the planner's own
    signatures (VeloxHistory::recordVeloxExecution analog,
    axiom/optimizer/VeloxHistory.h:44-50) — so the NEXT planning of the same
    scans uses actuals instead of sampling. Zero extra jobs: Spark's SQL
    metrics are populated by the action itself. Partial actions (show's
    limit, count's derived plan) don't flush — their metrics would
    under-report."""

    def __new__(cls, df: DataFrame, session: "PrestoSession", info):
        # bypass the facade's argument-pinned __new__ (classic inherits it)
        return object.__new__(cls)

    def __init__(self, df: DataFrame, session: "PrestoSession", info):
        super().__init__(df._jdf, df.sparkSession)
        self._verax_session = session
        self._verax_info = info  # ReorderInfo captured at planning time
        self._verax_flushed = False

    def _verax_flush(self) -> None:
        if self._verax_flushed:
            return
        self._verax_flushed = True
        try:
            self._verax_session._record_feedback(self, self._verax_info)
        except Exception:
            pass  # feedback must never break the user's action

    def collect(self):
        out = super().collect()
        self._verax_flush()
        return out

    def toPandas(self):
        out = super().toPandas()
        self._verax_flush()
        return out


class PrestoSession:
    """SELECT/EXPLAIN entry point over the driver catalog, Presto dialect.

    Every eligible SELECT passes through the cost-based join reorderer
    (sql/reorder.py) before Catalyst — the reference's lifecycle, where
    ``Optimization::toVeloxPlan`` sits between parser and execution for
    every query (axiom/optimizer/Optimization.h:44-48). ``reorder=False``
    renders joins as written. Executions feed actual cardinalities back
    into the planner's history (_ObservedFrame)."""

    def __init__(
        self, spark: SparkSession, sf_dir: str | None = None, *, reorder: bool = True
    ):
        from verax_spark.catalog import DEFAULT_SF_DIR, Catalog
        from verax_spark.functions.presto import register_sql_compat

        self.spark = spark
        self.reorder = reorder
        self.last_reorder = None  # ReorderInfo of the last sql() call
        self.catalog = Catalog(spark, sf_dir or DEFAULT_SF_DIR)
        # writable parquet tables (DML targets) — name → directory path.
        # The driver catalog is read-only; INSERT/DELETE/UPDATE require an
        # explicitly registered writable table (connector WriteKind surface,
        # ref ConnectorMetadata.h:457-627).
        self.writable: dict[str, str] = {}
        # pinned schema per writable-table path: DML never changes a
        # table's schema (INSERT coerces to it, DELETE/UPDATE preserve it,
        # there is no ALTER TABLE surface), so after one inference every
        # re-read — refresh, CoW prune/rewrite, time-travel snapshot —
        # passes the schema explicitly and skips the footer-inference job.
        # Cleared by CALL system.flush_metadata_cache.
        self._pinned: dict[str, "StructType"] = {}
        # active transaction (sources/txn.py undo log) + tables it touched
        self._txn = None
        self._txn_tables: set[str] = set()
        # CREATE SCHEMA namespaces in the writable scratch (ref
        # AstStatements.h:237) and materialized views: name → (defining
        # query AST, materialization path) (ref AstStatements.h:191)
        self.schemas: set[str] = set()
        self.mviews: dict[str, tuple] = {}
        # attached connectors (ConnectorMetadata registry analog): catalog
        # name → Connector; SQL text reaches their tables as <catalog>.<table>
        self.connectors: dict[str, "Connector"] = {}
        # CREATE TYPE aliases: name → Spark DDL type text, resolved in
        # every later type spelling (ref AstStatements.h:348 CreateType)
        self.types: dict[str, str] = {}
        # CREATE ROLE registry: name → admin grantor (parse+registry only,
        # like the reference — no distributed ACL enforcement;
        # AstStatements.h:323, SqlStatement.h:23-79)
        self.roles: dict[str, str | None] = {}
        # CALL procedures: qualified name → callable(session, *args).
        # The reference registers none (Call is parse-only there); the one
        # built-in here maps to real session state worth flushing.
        self.procedures: dict[str, object] = {
            "system.flush_metadata_cache": _proc_flush_metadata_cache,
            "system.vacuum": _proc_vacuum,
        }
        # view + compat-UDF registration is idempotent; skip the ~12 DDL
        # round-trips when this session already has THIS sf_dir's views
        # (re-register whenever the sf_dir changes — views are global names)
        app = spark.sparkContext.applicationId
        if _REGISTERED.get(app) != self.catalog.sf_dir:
            self.catalog.register_views()
            register_sql_compat(spark)
            _REGISTERED[app] = self.catalog.sf_dir

    def attach(self, connector) -> None:
        """Expose a connector's tables to SQL text under
        ``<connector.name>.<table>`` (the reference's catalog-qualified
        names; ConnectorMetadata registry analog)."""
        self.connectors[connector.name] = connector

    def _resolve_connector_tables(self, stmt) -> None:
        """Rewrite ``catalog.table`` references for attached connectors to
        session temp views (registered lazily from the connector's
        DataFrame). The original table name becomes the alias, so qualified
        column references keep resolving."""
        if not self.connectors and not self.schemas:
            return
        for node in _walk_expr(stmt):
            if isinstance(node, ast.Table) and len(node.name) == 2:
                cat, tbl = node.name[0].lower(), node.name[1]
                if cat in self.connectors:
                    view = f"{cat}__{tbl}"
                    handle = self.connectors[cat].table(tbl)
                    handle.df.createOrReplaceTempView(view)
                    node.alias = node.alias or tbl
                    node.name = [view]
                elif cat in self.schemas:
                    # schema-qualified writable/materialized table: the
                    # backing temp view is the dot-free spelling
                    node.alias = node.alias or tbl
                    node.name = [f"{cat}__{tbl}"]

    def _bind_parameters(self, stmt, params) -> None:
        """Bind ``?`` placeholders (ref Parameter, AstExpressions.h:133) to
        constants, by parse order — the EXECUTE ... USING shape folded into
        one call. Unbound or surplus parameters error loudly."""
        found = sorted(
            (n for n in _walk_expr(stmt) if isinstance(n, ast.Parameter)),
            key=lambda n: n.index,
        )
        if not found and not params:
            return
        if len(found) != len(params or ()):
            raise ValueError(
                f"statement has {len(found)} parameter(s) but "
                f"{len(params or ())} value(s) were bound"
            )
        for node, value in zip(found, params):
            node.bound = _sql_literal(value)

    def _resolve_table_versions(self, stmt) -> None:
        """Resolve ``FOR (TIMESTAMP|VERSION) (AS OF|BEFORE)`` table specs
        (ref TableVersionExpression, AstFunctions.h:535) against the
        writable tables' version logs: the snapshot's file list becomes a
        temp view (a plain multi-file parquet scan — pushdown and pruning
        intact) and the reference is rewritten to it, original name kept
        as the alias. Bounds are constants, evaluated in Python — no Spark
        job at plan time."""
        import hashlib

        for node in _walk_expr(stmt):
            if not (isinstance(node, ast.Table) and node.version_kind):
                continue
            name = ".".join(node.name)
            path = self.writable.get(name)
            if path is None:
                raise ValueError(
                    f"FOR {node.version_kind.upper()} requires a writable "
                    f"table with a version log; {name!r} is not registered "
                    "via register_table/CREATE TABLE"
                )
            if node.version_kind == "version":
                v = int(_const_scalar(node.version_expr))
                files = versions.files_at(
                    path, version=v, before=node.version_before
                )
                tag = f"v{v}{'b' if node.version_before else ''}"
            else:
                ts = _const_epoch(node.version_expr)
                files = versions.files_at(
                    path, timestamp=ts, before=node.version_before
                )
                tag = "t" + hashlib.md5(
                    f"{ts}{node.version_before}".encode()
                ).hexdigest()[:10]
            view = f"{self._view_name(name)}__asof_{tag}"
            # snapshots share the live table's schema (DML preserves it),
            # so the pinned schema skips footer inference per snapshot read
            schema = self._pinned.get(path)
            reader = (
                self.spark.read.schema(schema)
                if schema is not None
                else self.spark.read
            )
            reader.parquet(*files).createOrReplaceTempView(view)
            node.alias = node.alias or node.name[-1]
            node.name = [view]
            node.version_kind, node.version_expr = None, None

    def _resolve_type_aliases(self, stmt) -> None:
        """Substitute CREATE TYPE aliases wherever a type is spelled —
        CAST targets, CREATE TABLE column definitions, CREATE FUNCTION
        signatures (ref AstStatements.h:348: a created type participates
        in the session type system)."""

        def res(t: str) -> str:
            base = t.lower().split("(")[0].strip()
            return self.types.get(base, t)

        for node in _walk_expr(stmt):
            if isinstance(node, ast.Cast):
                node.type_ = res(node.type_)
            elif isinstance(node, ast.CreateTableStmt):
                node.columns = [(n, res(t)) for n, t in node.columns]
            elif isinstance(node, ast.CreateFunctionStmt):
                node.parameters = [(n, res(t)) for n, t in node.parameters]
                node.return_type = res(node.return_type)

    def _scan_footprint(self, df: DataFrame) -> dict[str, list[str]]:
        """(table -> read columns) from the formatted physical plan — the
        EXPLAIN (TYPE IO) payload. Parses the per-scan Location/ReadSchema
        lines, so it reports the POST-pruning column footprint the engine
        will actually read (ref ExplainOption TYPE IO,
        AstStatements.h:597-635)."""
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # resolved path -> base table, covering the flat source, the
        # split-cache copy, and every registered bucketed layout — IO
        # must report LOGICAL tables, not physical copy paths
        from verax_spark.optimizer.layouts import _norm_path, table_path_map
        from verax_spark.sources.layout import (
            _registry_entries,
            source_fingerprint,
        )

        path_map = dict(table_path_map(self.catalog))
        for name in self.catalog.all_tables:
            src = os.path.join(self.catalog.sf_dir, f"{name}.parquet")
            if not os.path.exists(src):
                continue
            try:
                for e in _registry_entries(source_fingerprint(src), name):
                    loc_e = e.get("location", "").removeprefix("file:")
                    if loc_e:
                        path_map[_norm_path(loc_e)] = name
            except Exception:  # noqa: BLE001 - registry is optional
                pass

        out: dict[str, set[str]] = {}
        loc: str | None = None
        for line in plan.splitlines():
            line = line.strip()
            if line.startswith("Location:"):
                m = re.search(r"\[([^\],]+)", line)
                loc = m.group(1) if m else None
            elif line.startswith("ReadSchema:") and loc:
                key = _norm_path(loc.removeprefix("file:"))
                base = os.path.basename(loc.rstrip("/"))
                table = path_map.get(key, base.removesuffix(".parquet"))
                m = re.search(r"struct<(.*)>\s*$", line)
                cols: list[str] = []
                if m:
                    depth = 0
                    name = ""
                    for ch in m.group(1) + ",":
                        if ch in "<([":
                            depth += 1
                        elif ch in ">)]":
                            depth -= 1
                        if ch == "," and depth == 0:
                            if ":" in name:
                                cols.append(name.split(":", 1)[0].strip())
                            name = ""
                        else:
                            name += ch
                out.setdefault(table, set()).update(cols)
                loc = None
        # report LOGICAL columns only: a physical layout copy may carry
        # derived (materialized-projection) columns the logical table
        # doesn't have — the IO footprint is a logical-schema surface
        for t in list(out):
            try:
                logical = {
                    f.name for f in self.catalog.table(t, layout_keys=()).schema
                }
            except Exception:  # noqa: BLE001 - non-catalog temp tables
                continue
            out[t] = {c for c in out[t] if c in logical}
        return {t: sorted(c) for t, c in out.items()}

    def explain(self, text: str) -> str:
        """EXPLAIN helper for callers that want the text directly."""
        rows = self.sql(f"explain {text}").collect()
        return rows[0][0]

    def sql(self, text: str, params: "list | tuple | None" = None) -> DataFrame:
        stmt = parse(text.strip())
        self._bind_parameters(stmt, params)
        self._resolve_connector_tables(stmt)
        self._resolve_table_versions(stmt)
        if self.types:
            self._resolve_type_aliases(stmt)
        if isinstance(stmt, ast.DescribeStmt):
            # Presto DESCRIBE shape: (column, type, extra, comment) rows,
            # produced as a local Values relation like the reference
            # (PrestoParserTest.cpp `describe` expects a Values node)
            from verax_spark.plans.builder import local_values

            schema = self.spark.table(self._view_name(stmt.table)).schema
            rows = [
                (f.name, _presto_type(f.dataType.simpleString()), "", "")
                for f in schema.fields
            ]
            return local_values(
                self.spark, rows, "column string, type string, extra string, comment string"
            )
        if isinstance(stmt, ast.ExplainStmt):
            from verax_spark.plans.builder import local_values

            if stmt.type_ == "validate":
                # TYPE VALIDATE: parse + resolve only, never execute —
                # Presto returns a single boolean column (ref
                # AstStatements.h:597-635 ExplainOption). Resolution =
                # Spark analysis of the optimized rendering.
                df = self.spark.sql(self._optimize(stmt.query).sql())
                df.schema  # forces analysis; raises on unresolved
                return local_values(self.spark, [(True,)], "valid boolean")
            df = self.spark.sql(self._optimize(stmt.query).sql())
            if stmt.type_ == "io":
                # TYPE IO: the scanned tables + pruned columns from the
                # optimized plan (Presto's IO plan reports catalog/table/
                # column footprint). Deterministic, so DuckDB-oracle-able.
                rows = sorted(
                    (t, ",".join(cols))
                    for t, cols in self._scan_footprint(df).items()
                )
                if stmt.format == "json":
                    import json as _json

                    payload = _json.dumps(
                        [
                            {"table": t, "columns": c.split(",") if c else []}
                            for t, c in rows
                        ]
                    )
                    return local_values(
                        self.spark, [(payload,)], "io_plan string"
                    )
                return local_values(
                    self.spark,
                    list(rows) or [("", "")],
                    "table string, columns string",
                )
            if stmt.format == "graphviz":
                # FORMAT GRAPHVIZ (ref ExplainFormat kGraphviz): DOT text
                # of the fragment tree, for any plan-rendering type
                from verax_spark.plans.fragments import graphviz_fragments

                return local_values(
                    self.spark, [(graphviz_fragments(df),)], "plan string"
                )
            if stmt.type_ == "logical":
                plan = df._jdf.queryExecution().optimizedPlan().toString()
                return local_values(self.spark, [(plan,)], "plan string")
            if stmt.type_ == "distributed":
                from verax_spark.plans.fragments import explain_fragments

                return local_values(
                    self.spark, [(explain_fragments(df),)], "plan string"
                )
            if stmt.analyze:
                # EXPLAIN ANALYZE: execute, then report the FINAL physical
                # plan (AQE-resolved: actual join strategies, coalesced
                # partitions) plus actual row count and wall time
                import time

                t0 = time.perf_counter()
                n = df.count()
                wall_ms = round((time.perf_counter() - t0) * 1000, 1)
                plan = df._jdf.queryExecution().executedPlan().toString()
                return local_values(
                    self.spark,
                    [(plan, n, wall_ms)],
                    "plan string, rows bigint, wall_ms double",
                )
            # VERBOSE widens to Spark's extended mode (all plan phases:
            # parsed/analyzed/optimized/physical), matching Presto's
            # more-detailed-rendering intent for EXPLAIN VERBOSE
            plan = df._jdf.queryExecution().explainString(
                self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "extended" if stmt.verbose else "formatted"
                )
            )
            return local_values(self.spark, [(plan,)], "plan string")
        if isinstance(stmt, ast.AnalyzeStmt):
            return self._execute_analyze(stmt)
        if isinstance(
            stmt, (ast.StartTransactionStmt, ast.CommitStmt, ast.RollbackStmt)
        ):
            return self._execute_txn(stmt)
        if isinstance(stmt, (ast.InsertStmt, ast.DeleteStmt, ast.UpdateStmt)):
            return self._execute_dml(stmt)
        if isinstance(
            stmt,
            (
                ast.CreateTableStmt,
                ast.CreateTableAsStmt,
                ast.DropTableStmt,
                ast.CreateViewStmt,
                ast.DropViewStmt,
                ast.ShowTablesStmt,
                ast.CreateSchemaStmt,
                ast.DropSchemaStmt,
                ast.ShowSchemasStmt,
                ast.CreateMViewStmt,
                ast.RefreshMViewStmt,
                ast.DropMViewStmt,
                ast.CreateFunctionStmt,
                ast.DropFunctionStmt,
                ast.CreateTypeStmt,
                ast.CreateRoleStmt,
                ast.DropRoleStmt,
                ast.ShowRolesStmt,
            ),
        ):
            return self._execute_ddl(stmt)
        if isinstance(stmt, ast.CallStmt):
            return self._execute_call(stmt)
        if isinstance(stmt, ast.Query):
            stmt = self._optimize(stmt)
        df = self.spark.sql(stmt.sql())
        if self.last_reorder is not None and self.last_reorder.signatures:
            return _ObservedFrame(df, self, self.last_reorder)
        return df

    def _record_feedback(self, df: DataFrame, info) -> None:
        """Flush per-scan actuals from df's executed plan into the shared
        planning history (called by _ObservedFrame after a full action)."""
        from verax_spark.optimizer.feedback import record_actuals
        from verax_spark.sql.reorder import _history

        record_actuals(df, _history(), info.signatures)

    # -- DML (WriteKind kInsert/kDelete/kUpdate, ConnectorMetadata.h:457) ----
    def register_table(self, name: str, path: str) -> None:
        """Register a writable parquet directory as table ``name`` — the
        target surface for SQL DML (and readable like any view)."""
        from verax_spark.sources.txn import recover_orphans

        # Roll back any orphaned transaction a crashed process left behind
        # (its undo dirs would otherwise hide superseded files forever,
        # silently committing the aborted DML).
        recover_orphans(
            path, active_id=self._txn.id if self._txn is not None else None
        )
        # start the version log (v0 = as registered): every committed DML
        # on a writable table becomes a time-travel snapshot
        # (FOR VERSION/TIMESTAMP AS OF, sources/versions.py)
        versions.ensure_initial(path)
        self.writable[name] = path
        self._refresh(name)

    def _view_name(self, name: str) -> str:
        """Spark temp-view spelling of a possibly schema-qualified table
        name (temp views cannot contain dots; queries referencing ``s.t``
        are rewritten to the same spelling in _resolve_connector_tables)."""
        return name.replace(".", "__")

    @staticmethod
    def _nullable(schema: "StructType") -> "StructType":
        """Nullable-normalized copy of a writer schema (ADVICE r10): a
        CTAS/CREATE writer DataFrame can carry nullable=false fields
        (aggregates, literals), but a later INSERT may write NULLs into
        such a column — reading parquet under a user-supplied
        non-nullable schema can silently return wrong results. Parquet
        file-source reads are always-nullable; pin the same."""
        from pyspark.sql.types import StructField, StructType

        return StructType(
            [StructField(f.name, f.dataType, True, f.metadata) for f in schema]
        )

    def _read_writable(self, path: str) -> DataFrame:
        """Read a writable table with its pinned schema (one inference per
        session per table; every later read is footer-free)."""
        schema = self._pinned.get(path)
        if schema is None:
            df = self.spark.read.parquet(path)
            self._pinned[path] = df.schema
            return df
        return self.spark.read.schema(schema).parquet(path)

    def _refresh(self, name: str) -> None:
        self._read_writable(self.writable[name]).createOrReplaceTempView(
            self._view_name(name)
        )

    def _writable_path(self, table: str) -> str:
        path = self.writable.get(table)
        if path is None:
            raise ValueError(
                f"{table!r} is not a registered writable table; DML targets "
                "must be registered via PrestoSession.register_table(name, "
                "path) — the driver catalog is read-only"
            )
        return path

    @staticmethod
    def _dml_predicate(where) -> "Column":
        """WHERE tree → Spark Column via the rendered SQL (compat functions
        are session-registered). Subquery predicates need a relational
        rewrite that F.expr cannot hold — directed to the API instead."""
        import pyspark.sql.functions as F

        if where is None:
            return F.lit(True)
        for node in _walk_expr(where):
            if isinstance(
                node, (ast.InSubquery, ast.Exists, ast.ScalarSubquery, ast.Quantified)
            ):
                raise NotImplementedError(
                    "subquery predicates in DELETE/UPDATE are not supported "
                    "in SQL text; use sources.cow with an anti/semi-join "
                    "predicate instead"
                )
        return F.expr(where.sql())

    def _execute_dml(self, stmt) -> DataFrame:
        import pyspark.sql.functions as F
        from pyspark.sql.observation import Observation

        from verax_spark.plans.builder import local_values
        from verax_spark.sources.cow import delete_rows, update_rows

        path = self._writable_path(stmt.table)
        target = self._read_writable(path)
        if isinstance(stmt, ast.InsertStmt):
            src = self.spark.sql(self._optimize(stmt.query).sql())
            names = stmt.columns or [f.name for f in target.schema.fields]
            if len(src.columns) != len(names):
                raise ValueError(
                    f"INSERT column count mismatch: {len(names)} target vs "
                    f"{len(src.columns)} query columns"
                )
            lower = {n.lower() for n in names}
            unknown = lower - {f.name.lower() for f in target.schema.fields}
            if unknown:
                raise ValueError(f"INSERT into unknown columns: {sorted(unknown)}")
            # positional rename via toDF — immune to auto-generated source
            # names containing dots (e.g. a bare literal column `99.0`)
            aligned = src.toDF(*names)
            # table column order; unmentioned columns NULL; types coerced
            full = aligned.select(
                *[
                    (
                        F.col(f.name) if f.name.lower() in lower else F.lit(None)
                    ).cast(f.dataType).alias(f.name)
                    for f in target.schema.fields
                ]
            )
            obs = Observation()
            if self._txn is not None:
                from verax_spark.sources.txn import _local, snapshot_names

                before = snapshot_names(path)
            full.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "append"
            ).parquet(path)
            if self._txn is not None:
                import os as _os

                for name in snapshot_names(path) - before:
                    self._txn.record_added(_os.path.join(_local(path), name))
                self._txn_tables.add(stmt.table)
            elif versions.enabled(path):
                versions.record(path)
            self._refresh(stmt.table)
            return local_values(
                self.spark, [(int(obs.get["rows"]),)], "rows_inserted bigint"
            )
        pred = self._dml_predicate(stmt.where)
        # matching-row count first (file-pruned scan), then the rewrite
        n = target.filter(pred).count()
        if self._txn is not None:
            self._txn_tables.add(stmt.table)
        if isinstance(stmt, ast.DeleteStmt):
            delete_rows(self.spark, path, pred, self._txn, target.schema)
            self._refresh(stmt.table)
            return local_values(self.spark, [(n,)], "rows_deleted bigint")
        assignments = {c: F.expr(e.sql()) for c, e in stmt.assignments}
        update_rows(self.spark, path, assignments, pred, self._txn, target.schema)
        self._refresh(stmt.table)
        return local_values(self.spark, [(n,)], "rows_updated bigint")

    def _execute_analyze(self, stmt) -> DataFrame:
        """ANALYZE t (reference AstStatements.h:636): ONE aggregation pass
        over the table computing row count + per-column approx NDV and null
        counts, returned Presto-style as stats rows. The exact row count is
        recorded into the shared planner history under the identical scan
        signature the join reorderer consults (QueryGraph._signature incl.
        data fingerprint), so the next planning of any query over this
        table uses the ANALYZE actuals instead of sampling."""
        import pyspark.sql.functions as F

        from verax_spark.optimizer.query_graph import QueryGraph
        from verax_spark.plans.builder import local_values
        from verax_spark.sql.reorder import _history

        df = self.spark.table(stmt.table)
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for f in df.schema.fields:
            aggs.append(F.approx_count_distinct(f.name).alias(f"__ndv_{f.name}"))
            aggs.append(
                F.sum(F.col(f.name).isNull().cast("long")).alias(
                    f"__nulls_{f.name}"
                )
            )
        row = df.agg(*aggs).collect()[0]
        g = QueryGraph(history=_history())
        g.table(stmt.table, df, None)
        hist = _history()
        hist.record(g._signature(g.tables[stmt.table]), float(row["__rows"]))
        hist.save()
        out = [
            (f.name, int(row[f"__ndv_{f.name}"]), int(row[f"__nulls_{f.name}"]))
            for f in df.schema.fields
        ] + [("__table__", int(row["__rows"]), 0)]
        return local_values(
            self.spark, out, "column string, ndv bigint, nulls bigint"
        )

    def _execute_txn(self, stmt) -> DataFrame:
        """START TRANSACTION / COMMIT / ROLLBACK (reference
        AstStatements.h:687-713) over the writable tables, backed by the
        file-metadata undo log in sources/txn.py: BEGIN costs nothing,
        ROLLBACK restores every touched table's exact pre-transaction file
        set, COMMIT drops the undo state. DDL auto-commits (documented —
        the scratch tables themselves are session-scoped)."""
        from verax_spark.plans.builder import local_values
        from verax_spark.sources.txn import Transaction

        if isinstance(stmt, ast.StartTransactionStmt):
            if self._txn is not None:
                raise ValueError("a transaction is already in progress")
            self._txn = Transaction()
            self._txn_tables = set()
            return local_values(self.spark, [(True,)], "started boolean")
        if self._txn is None:
            kind = "COMMIT" if isinstance(stmt, ast.CommitStmt) else "ROLLBACK"
            raise ValueError(f"{kind} outside a transaction")
        if isinstance(stmt, ast.CommitStmt):
            self._txn.commit()
            out = "committed boolean"
        else:
            self._txn.rollback()
            out = "rolled_back boolean"
        touched, self._txn = self._txn_tables, None
        self._txn_tables = set()
        for name in touched:
            # A table dropped mid-transaction (DDL auto-commits) is gone
            # from self.writable; skip its refresh instead of KeyError-ing
            # after the undo log has already been applied (ADVICE r04).
            path = self.writable.get(name)
            if path is None:
                continue
            self.spark.catalog.refreshByPath(path)
            self._refresh(name)
        return local_values(self.spark, [(True,)], out)

    # Presto type name → Spark DDL type (CREATE TABLE column definitions)
    _TYPE_MAP = {
        "varchar": "string",
        "varbinary": "binary",
        "real": "float",
        "integer": "int",
    }

    def _ddl_path(self, name: str) -> str:
        import os
        import tempfile

        if not hasattr(self, "_ddl_dir"):
            self._ddl_dir = tempfile.mkdtemp(prefix="verax_ddl_")
        return os.path.join(self._ddl_dir, name)

    def _execute_call(self, stmt) -> DataFrame:
        """CALL procedure(...) — reference AstStatements.h:661. Arguments
        must be constant expressions (CallArgument holds literals in every
        reference usage); named arguments are passed as keywords."""
        from verax_spark.plans.builder import local_values

        proc = self.procedures.get(stmt.name.lower())
        if proc is None:
            known = ", ".join(sorted(self.procedures)) or "<none>"
            raise ValueError(
                f"procedure {stmt.name!r} is not registered "
                f"(registered: {known})"
            )

        def const(e) -> object:
            if isinstance(e, ast.Raw):
                t = e.text
                if t.startswith("'") and t.endswith("'"):
                    return t[1:-1].replace("''", "'")
                low = t.lower()
                if low in ("true", "false"):
                    return low == "true"
                if low == "null":
                    return None
                try:
                    return int(t)
                except ValueError:
                    return float(t)
            if isinstance(e, ast.UnOp) and e.op == "-" and isinstance(
                e.operand, ast.Raw
            ):
                return -const(e.operand)
            raise ValueError(f"CALL argument must be a constant, got {e.sql()}")

        pos = [const(e) for n, e in stmt.args if n is None]
        kw = {n: const(e) for n, e in stmt.args if n is not None}
        result = proc(self, *pos, **kw)
        return local_values(self.spark, [(str(result),)], "result string")

    def _execute_ddl(self, stmt) -> DataFrame:
        """DDL statement surface (reference AstStatements.h:44-460:
        CreateTable / CreateTableAsSelect / DropTable / CreateView /
        DropView / ShowColumns-family). Created tables are parquet
        directories in a session scratch dir, registered writable — the
        WriteKind kCreate path — so they accept the full DML surface."""
        import shutil

        import pyspark.sql.functions as F

        from pyspark.sql.observation import Observation

        from verax_spark.plans.builder import local_values

        if not hasattr(self, "views"):
            self.views: set[str] = set()
        if isinstance(stmt, ast.ShowTablesStmt):
            from verax_spark.catalog import ALL_TABLES

            names = sorted(
                set(ALL_TABLES)
                | set(self.writable)
                | self.views
                | set(self.mviews)
            )
            return local_values(self.spark, [(n,) for n in names], "table string")
        if isinstance(stmt, ast.ShowSchemasStmt):
            return local_values(
                self.spark,
                [(n,) for n in sorted(self.schemas)],
                "schema string",
            )
        if isinstance(stmt, ast.CreateTypeStmt):
            from .parser import Parser

            if stmt.fields is not None:
                inner = ", ".join(
                    f"{n}: {Parser(t)._type_name()}" for n, t in stmt.fields
                )
                resolved = f"struct<{inner}>"
            else:
                # run the definition through the parser's type lowering
                # (presto -> spark spelling), then through the alias map
                # so aliases compose
                base = Parser(stmt.definition)._type_name()
                resolved = self.types.get(base.lower().split("(")[0], base)
            key = stmt.name.lower()
            if key in self.types:
                raise ValueError(f"type {stmt.name!r} already exists")
            self.types[key] = resolved
            return local_values(self.spark, [(True,)], "created boolean")
        if isinstance(stmt, ast.CreateRoleStmt):
            if stmt.name in self.roles:
                raise ValueError(f"role {stmt.name!r} already exists")
            self.roles[stmt.name] = stmt.admin
            return local_values(self.spark, [(True,)], "created boolean")
        if isinstance(stmt, ast.DropRoleStmt):
            if stmt.name not in self.roles:
                raise ValueError(f"role {stmt.name!r} does not exist")
            del self.roles[stmt.name]
            return local_values(self.spark, [(True,)], "dropped boolean")
        if isinstance(stmt, ast.ShowRolesStmt):
            return local_values(
                self.spark,
                [(n, self.roles[n]) for n in sorted(self.roles)],
                "role string, admin string",
            )
        if isinstance(stmt, ast.CreateSchemaStmt):
            if stmt.name in self.schemas:
                if stmt.if_not_exists:
                    return local_values(self.spark, [(False,)], "created boolean")
                raise ValueError(f"schema {stmt.name!r} already exists")
            self.schemas.add(stmt.name)
            return local_values(self.spark, [(True,)], "created boolean")
        if isinstance(stmt, ast.DropSchemaStmt):
            if stmt.name not in self.schemas:
                if stmt.if_exists:
                    return local_values(self.spark, [(False,)], "dropped boolean")
                raise ValueError(f"schema {stmt.name!r} does not exist")
            members = [
                t for t in self.writable if t.startswith(stmt.name + ".")
            ]
            if members and not stmt.cascade:
                raise ValueError(
                    f"schema {stmt.name!r} is not empty ({len(members)} "
                    "tables); use DROP SCHEMA ... CASCADE"
                )
            for t in members:
                self._execute_ddl(ast.DropTableStmt(t))
            self.schemas.discard(stmt.name)
            return local_values(self.spark, [(True,)], "dropped boolean")
        if isinstance(stmt, ast.CreateMViewStmt):
            if stmt.name in self.mviews and not stmt.or_replace:
                raise ValueError(
                    f"materialized view {stmt.name!r} already exists"
                )
            query = self._optimize(stmt.query)
            path = self._ddl_path(f"mview_{self._view_name(stmt.name)}")
            materialized = self.spark.sql(query.sql())
            materialized.write.mode("overwrite").parquet(path)
            self.mviews[stmt.name] = (stmt.query, path)
            # the writer's schema IS the stored schema — skip re-inference
            # (nullable-normalized: parquet file-source read semantics)
            self.spark.read.schema(self._nullable(materialized.schema)).parquet(
                path
            ).createOrReplaceTempView(self._view_name(stmt.name))
            return local_values(self.spark, [(True,)], "created boolean")
        if isinstance(stmt, ast.RefreshMViewStmt):
            if stmt.name not in self.mviews:
                raise ValueError(
                    f"materialized view {stmt.name!r} does not exist"
                )
            query, path = self.mviews[stmt.name]
            # recompute into a staging dir, then swap — a failed refresh
            # leaves the previous materialization intact
            staging = path + ".staging"
            recomputed = self.spark.sql(self._optimize(query).sql())
            recomputed.write.mode("overwrite").parquet(staging)
            shutil.rmtree(path, ignore_errors=True)
            import os as _os

            _os.rename(staging, path)
            self.spark.catalog.refreshByPath(path)
            self.spark.read.schema(self._nullable(recomputed.schema)).parquet(
                path
            ).createOrReplaceTempView(self._view_name(stmt.name))
            return local_values(self.spark, [(True,)], "refreshed boolean")
        if isinstance(stmt, ast.DropMViewStmt):
            entry = self.mviews.pop(stmt.name, None)
            if entry is None:
                if stmt.if_exists:
                    return local_values(self.spark, [(False,)], "dropped boolean")
                raise ValueError(
                    f"materialized view {stmt.name!r} does not exist"
                )
            self.spark.catalog.dropTempView(self._view_name(stmt.name))
            shutil.rmtree(entry[1], ignore_errors=True)
            return local_values(self.spark, [(True,)], "dropped boolean")
        if isinstance(stmt, ast.CreateFunctionStmt):
            # Catalyst-inlined SQL UDF (CREATE TEMPORARY FUNCTION ... RETURN)
            # — the body joins whole-stage codegen like the compat shims.
            # Presto type spellings map word-level (varchar→string etc.).
            if not hasattr(self, "functions"):
                self.functions: set[str] = set()
            fname = self._view_name(stmt.name)
            if fname in self.functions and not stmt.or_replace:
                raise ValueError(f"function {stmt.name!r} already exists")

            def _sp_type(t: str) -> str:
                base = t.lower().split("(")[0].strip()
                mapped = self._TYPE_MAP.get(base)
                return mapped if mapped and "(" not in t else t

            params = ", ".join(
                f"{n} {_sp_type(t)}" for n, t in stmt.parameters
            )
            self.spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}({params}) "
                f"RETURNS {_sp_type(stmt.return_type)} "
                f"RETURN {stmt.body.sql()}"
            )
            self.functions.add(fname)
            return local_values(self.spark, [(True,)], "created boolean")
        if isinstance(stmt, ast.DropFunctionStmt):
            if not hasattr(self, "functions"):
                self.functions: set[str] = set()
            fname = self._view_name(stmt.name)
            if fname not in self.functions:
                if stmt.if_exists:
                    return local_values(self.spark, [(False,)], "dropped boolean")
                raise ValueError(f"function {stmt.name!r} does not exist")
            self.spark.sql(f"DROP TEMPORARY FUNCTION {fname}")
            self.functions.discard(fname)
            return local_values(self.spark, [(True,)], "dropped boolean")
        if isinstance(stmt, (ast.CreateTableStmt, ast.CreateTableAsStmt)):
            if "." in stmt.table:
                schema_name = stmt.table.split(".", 1)[0]
                if schema_name not in self.schemas:
                    raise ValueError(
                        f"schema {schema_name!r} does not exist; CREATE "
                        "SCHEMA first (AstStatements.h:237)"
                    )
        if isinstance(stmt, ast.CreateTableStmt):
            if stmt.table in self.writable:
                if stmt.if_not_exists:
                    return local_values(self.spark, [(0,)], "rows bigint")
                raise ValueError(f"table {stmt.table!r} already exists")
            ddl = ", ".join(
                f"{n} {self._TYPE_MAP.get(t.lower().split('(')[0], None) or t}"
                for n, t in stmt.columns
            )
            empty = self.spark.createDataFrame([], ddl)
            path = self._ddl_path(stmt.table)
            empty.write.mode("overwrite").parquet(path)
            self._pinned[path] = self._nullable(empty.schema)
            self.register_table(stmt.table, path)
            return local_values(self.spark, [(0,)], "rows bigint")
        if isinstance(stmt, ast.CreateTableAsStmt):
            if stmt.table in self.writable:
                if stmt.if_not_exists:
                    return local_values(self.spark, [(0,)], "rows bigint")
                raise ValueError(f"table {stmt.table!r} already exists")
            df = self.spark.sql(self._optimize(stmt.query).sql())
            if not stmt.with_data:
                df = df.limit(0)
            obs = Observation()
            path = self._ddl_path(stmt.table)
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).parquet(path)
            self._pinned[path] = self._nullable(df.schema)
            self.register_table(stmt.table, path)
            return local_values(
                self.spark, [(int(obs.get["rows"]),)], "rows bigint"
            )
        if isinstance(stmt, ast.DropTableStmt):
            if self._txn is not None and stmt.table in self._txn_tables:
                # The open transaction holds undo files inside this table's
                # directory; dropping it would make a later ROLLBACK rename
                # into an rmtree'd dir (ADVICE r04). Presto likewise forbids
                # mixing DDL over transactional state.
                raise ValueError(
                    f"cannot DROP TABLE {stmt.table!r}: it was modified in "
                    "the open transaction (COMMIT or ROLLBACK first)"
                )
            path = self.writable.pop(stmt.table, None)
            if path is None:
                if stmt.if_exists:
                    return local_values(self.spark, [(False,)], "dropped boolean")
                raise ValueError(f"table {stmt.table!r} does not exist")
            self.spark.catalog.dropTempView(self._view_name(stmt.table))
            if path.startswith(getattr(self, "_ddl_dir", "\0")):
                shutil.rmtree(path, ignore_errors=True)
            return local_values(self.spark, [(True,)], "dropped boolean")
        if isinstance(stmt, ast.CreateViewStmt):
            if stmt.name in self.views and not stmt.or_replace:
                raise ValueError(f"view {stmt.name!r} already exists")
            df = self.spark.sql(self._optimize(stmt.query).sql())
            df.createOrReplaceTempView(stmt.name)
            self.views.add(stmt.name)
            return local_values(self.spark, [(True,)], "created boolean")
        # DropViewStmt
        if stmt.name not in self.views:
            if stmt.if_exists:
                return local_values(self.spark, [(False,)], "dropped boolean")
            raise ValueError(f"view {stmt.name!r} does not exist")
        self.views.discard(stmt.name)
        self.spark.catalog.dropTempView(stmt.name)
        return local_values(self.spark, [(True,)], "dropped boolean")

    def _optimize(self, query: ast.Query) -> ast.Query:
        self.last_reorder = None
        if not self.reorder:
            return query
        from verax_spark.sql.reorder import reorder_joins

        query, self.last_reorder = reorder_joins(query, self.spark)
        return query
