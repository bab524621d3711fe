"""Cost-based join reordering for the SQL front door.

In the reference, every query passes through the optimizer — there is no
"render the joins as written" path: ``Optimization::toVeloxPlan`` builds the
query graph and ``makeJoins`` picks the order and distribution for each
SELECT (axiom/optimizer/Optimization.h:44-48, README.md:64-72). This module
is that wiring for the Spark front door: an eligible FROM clause (a chain of
INNER / comma joins over base tables) is flattened into a
``optimizer.query_graph.QueryGraph``, the subset-DP enumeration picks the
join tree, and the AST's FROM is re-rendered in that order with BROADCAST
hints for the sides whose estimated cardinality clears the threshold — then
Catalyst lowers it as usual.

Safety model: reordering only changes the *order* of inner equi-joins and
moves ON-clause conjuncts into WHERE (equivalent under inner joins); every
original conjunct is preserved verbatim, so the rewrite cannot change
results — only plans. Anything the flattener does not fully understand
(FULL/RIGHT joins, USING, unresolvable column references) disqualifies the
query and the textual order stands.

Non-inner boundaries (``wrapInDt`` analog, ref
axiom/optimizer/ToGraph.cpp:1216 — the reference wraps non-reorderable
structures in derived tables and reorders the inner core around them):

- **LEFT JOIN attachments.** A LEFT JOIN whose right side is a single base
  table or derived table is *hoisted above* the reordered inner core. This
  is the classic l-asscom identity: inner joins and cross products commute
  with a left outer join whose ON predicate does not reference them —
  ``(X LEFT f ON p) ⋈ d ON q  ≡  σ_q((X ⋈ d) LEFT f ON p)`` because the
  f-extension of a row depends only on that row's columns, and SQL scoping
  guarantees ``p`` references only relations to f's left (which all remain
  below f after the hoist). Attachments re-attach in their original
  left-to-right order, preserving inter-attachment scope. Inner-join ON
  conjuncts that reference an attachment migrate to WHERE (filter placement
  above both joins is equivalent under inner semantics).
- **Derived-table leaves.** A non-lateral aliased subquery in FROM joins
  the core as an opaque leaf with estimated cardinality; its body is
  re-rendered verbatim. Estimation is bounded: the leaf is only eligible
  when its input files' footer row total is small enough that counting it
  is a planning-scale job (at 100 TB the query falls back to textual
  order rather than execute a subquery to plan one).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from verax_spark.sql import ast

# Probe-side key cap for inlining an index lookup's key domain into the
# rendered SQL (ref LookupKeys ConnectorMetadata.h:392-418 ships probe keys
# to storage at run time; plan-time literal inlining is the SQL-text analog
# and only pays when the domain is point-lookup sized).
_LOOKUP_INLINE_MAX_KEYS = 512

# Process-wide estimate cache: repeated queries over the same tables/edges
# skip the sampling jobs (VeloxHistory analog, optimizer/history.py).
_SHARED_HISTORY = None


def _history():
    global _SHARED_HISTORY
    if _SHARED_HISTORY is None:
        from verax_spark.optimizer.history import ExecutionHistory

        _SHARED_HISTORY = ExecutionHistory()
    return _SHARED_HISTORY


@dataclass
class _Leaf:
    alias: str  # unique name inside the query (alias or table name)
    table: ast.Relation  # original AST node (re-used when re-rendering)
    real_name: str  # catalog name for spark.table(); "" for derived leaves
    columns: set[str] = field(default_factory=set)

    @property
    def derived(self) -> bool:
        return not self.real_name


@dataclass
class _Attachment:
    """A hoisted LEFT JOIN: re-attached verbatim above the reordered core."""

    alias: str
    rel: ast.Relation  # right side (base table or derived table)
    on: ast.Expr | None
    real_name: str = ""  # catalog name when rel is a base table
    columns: set[str] = field(default_factory=set)


@dataclass
class ReorderInfo:
    """What the planner decided — inspectable by tests and EXPLAIN."""

    order: list[str]  # leaf aliases in join sequence (tree pre-order)
    broadcast: list[str]  # leaves hinted for broadcast
    tree: tuple  # ("leaf", a) | ("join"/"cross", t1, t2, ...)
    est: dict[str, float]  # estimated rows per leaf
    attachments: list[str] = field(default_factory=list)  # hoisted LEFT joins
    # alias → (history signature, input file paths) for the core leaves —
    # consumed by the execution-feedback recorder (PrestoSession)
    signatures: dict[str, tuple[str, tuple[str, ...]]] = field(default_factory=dict)
    # build-side aliases the planner chose an index lookup for AND whose
    # probe key domain was inlined into the scan (joinByIndex analog)
    lookups: list[str] = field(default_factory=list)


class _NotEligible(Exception):
    pass


# max total footer rows under a derived-table leaf for it to be eligible:
# estimating such a leaf may execute its subquery (a planning-time job), so
# it is only allowed when the inputs are provably small. Past the bound the
# query keeps its textual order — planning must never scan big data.
DERIVED_LEAF_ROW_BOUND = 20_000_000


def _bounded_inputs(df, bound: int = DERIVED_LEAF_ROW_BOUND) -> bool:
    """True when df's parquet input files total ≤ ``bound`` footer rows
    (driver-side metadata read, no Spark job). Non-parquet/empty inputs
    count as bounded (in-memory test relations)."""
    try:
        files = df.inputFiles()
    except Exception:
        return True
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        path = f.removeprefix("file://").removeprefix("file:")
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:
            continue
        if total > bound:
            return False
    return True


def _opaque_leaf(rel: ast.Relation) -> tuple[str, str]:
    """(alias, real_name) for a relation usable as an opaque unit — a base
    table or an aliased non-lateral derived table. Raises otherwise."""
    if isinstance(rel, ast.Table):
        if rel.col_aliases:
            raise _NotEligible("column aliases on base table")
        return rel.alias or rel.name[-1], ".".join(rel.name)
    if isinstance(rel, ast.SubqueryRel):
        if rel.lateral:
            raise _NotEligible("lateral subquery")
        if rel.col_aliases or not rel.alias:
            raise _NotEligible("derived table without a plain alias")
        return rel.alias, ""
    raise _NotEligible(type(rel).__name__)


def _flatten_from(
    rel: ast.Relation,
    leaves: list[_Leaf],
    conjuncts: list[ast.Expr],
    attachments: list[_Attachment],
) -> None:
    """Collect opaque leaves (base tables / derived tables) and ON conjuncts
    from a chain of inner/cross joins; LEFT joins over an opaque right side
    become hoisted attachments; raise _NotEligible on anything else."""
    if isinstance(rel, (ast.Table, ast.SubqueryRel)):
        alias, real = _opaque_leaf(rel)
        leaves.append(_Leaf(alias=alias, table=rel, real_name=real))
        return
    if isinstance(rel, ast.Join):
        if rel.using:
            raise _NotEligible("USING join")
        if rel.natural:
            # no explicit ON: flattening would mis-read it as a cross join
            raise _NotEligible("NATURAL join")
        if isinstance(rel.right, ast.Unnest) or isinstance(rel.left, ast.Unnest):
            raise _NotEligible("unnest relation")
        if rel.kind == "left":
            # hoistable boundary: recurse into the left subtree; the right
            # side re-attaches (with its ON verbatim) above the whole core
            _flatten_from(rel.left, leaves, conjuncts, attachments)
            alias, real = _opaque_leaf(rel.right)
            attachments.append(
                _Attachment(alias=alias, rel=rel.right, on=rel.on, real_name=real)
            )
            return
        if rel.kind == "right":
            # A RIGHT JOIN B ≡ B LEFT JOIN A (same rows; output column
            # order is fixed by the select list, and unqualified `*` is
            # declined upstream) — so the LEFT side is the opaque
            # null-supplied attachment and the RIGHT subtree is the core.
            # DFS appends A before any later attachment whose ON may
            # reference it, preserving scope order.
            alias, real = _opaque_leaf(rel.left)
            attachments.append(
                _Attachment(alias=alias, rel=rel.left, on=rel.on, real_name=real)
            )
            _flatten_from(rel.right, leaves, conjuncts, attachments)
            return
        if rel.kind not in ("inner", "cross"):
            raise _NotEligible(f"{rel.kind} join")
        _flatten_from(rel.left, leaves, conjuncts, attachments)
        _flatten_from(rel.right, leaves, conjuncts, attachments)
        if rel.on is not None:
            _split_and(rel.on, conjuncts)
        return
    raise _NotEligible(type(rel).__name__)


def _split_and(e: ast.Expr, out: list[ast.Expr]) -> None:
    if isinstance(e, ast.BinOp) and e.op.lower() == "and":
        _split_and(e.left, out)
        _split_and(e.right, out)
    else:
        out.append(e)


_SUBQUERY_NODES = (ast.InSubquery, ast.Exists, ast.ScalarSubquery, ast.Quantified)


def _walk_idents(node):
    """All ast.Ident nodes under ``node`` (dataclass tree walk)."""
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, ast.Ident):
            yield n
            continue
        if dataclasses.is_dataclass(n) and not isinstance(n, type):
            for f in dataclasses.fields(n):
                stack.append(getattr(n, f.name))
        elif isinstance(n, (list, tuple)):
            stack.extend(n)


def _refs(expr: ast.Expr, by_alias: dict[str, _Leaf], by_col: dict[str, str]):
    """Leaf aliases referenced by ``expr``; None = unresolvable (treat the
    conjunct as residual — stays in WHERE, never feeds estimation)."""
    found: set[str] = set()
    ok = True

    def walk(node) -> None:
        nonlocal ok
        if not ok:
            return
        if isinstance(node, _SUBQUERY_NODES) or isinstance(node, (ast.Query, ast.Select)):
            ok = False
            return
        if isinstance(node, ast.Star):
            ok = False
            return
        if isinstance(node, ast.Ident):
            parts = node.parts
            if len(parts) >= 2:
                q = parts[0].lower()
                if q in by_alias:
                    found.add(q)
                else:
                    ok = False  # unknown qualifier (struct deref, CTE, ...)
                return
            col = parts[0].lower()
            owner = by_col.get(col)
            if owner is None or owner == "?":
                ok = False  # unknown or ambiguous bare column
            else:
                found.add(owner)
            return
        if dataclasses.is_dataclass(node):
            for f in dataclasses.fields(node):
                walk(getattr(node, f.name))
            return
        if isinstance(node, (list, tuple)):
            for item in node:
                walk(item)

    walk(expr)
    return found if ok else None


def _dequalify(expr: ast.Expr, alias: str) -> ast.Expr:
    """Copy of ``expr`` with ``alias.col`` references collapsed to ``col`` —
    used ONLY to build the estimation predicate over the bare table scan;
    the rendered query keeps the original qualified text."""
    if isinstance(expr, ast.Ident):
        if len(expr.parts) >= 2 and expr.parts[0].lower() == alias:
            return ast.Ident(parts=expr.parts[1:])
        return expr
    if dataclasses.is_dataclass(expr) and not isinstance(expr, type):
        changes = {}
        for f in dataclasses.fields(expr):
            v = getattr(expr, f.name)
            if isinstance(v, ast.Expr):
                changes[f.name] = _dequalify(v, alias)
            elif isinstance(v, list):
                changes[f.name] = [
                    _dequalify(i, alias) if isinstance(i, ast.Expr) else i
                    for i in v
                ]
        return dataclasses.replace(expr, **changes)
    return expr


_DSL_CMP = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte", "=": "eq"}


def _to_dsl(expr: ast.Expr, alias: str):
    """AST conjunct → typed DSL Expr (plans/expr) for the leaf ``alias``,
    or None when the shape is outside what the DSL/selectivity model
    understands. A DSL predicate unlocks footer-stats selectivity
    (sources/stats.selectivity) — zero Spark jobs at planning time; the
    Column fallback estimates by sampling instead."""
    import datetime as _dt

    from verax_spark.plans import expr as dsl

    def conv(e):
        if isinstance(e, ast.Ident):
            parts = e.parts
            if len(parts) >= 2 and parts[0].lower() == alias:
                parts = parts[1:]
            if len(parts) != 1:
                return None
            return dsl.Col(parts[0])
        if isinstance(e, ast.Raw):
            txt = e.text
            if txt.startswith("'") and txt.endswith("'"):
                return dsl.Lit(txt[1:-1])
            try:
                return dsl.Lit(int(txt))
            except ValueError:
                try:
                    return dsl.Lit(float(txt))
                except ValueError:
                    return None
        if isinstance(e, ast.TypedLit) and e.type_.lower() in ("date", "timestamp"):
            body = e.value.strip("'")
            try:
                if e.type_.lower() == "date":
                    return dsl.Lit(_dt.date.fromisoformat(body))
                return dsl.Lit(_dt.datetime.fromisoformat(body))
            except ValueError:
                return None
        if isinstance(e, ast.BinOp):
            op = e.op.lower()
            if op in ("and", "or"):
                a, b = conv(e.left), conv(e.right)
                return None if a is None or b is None else dsl.Call(op, a, b)
            if e.op in _DSL_CMP:
                a, b = conv(e.left), conv(e.right)
                return (
                    None
                    if a is None or b is None
                    else dsl.Call(_DSL_CMP[e.op], a, b)
                )
            return None
        if isinstance(e, ast.Between) and not getattr(e, "negated", False):
            a = conv(e.operand) if hasattr(e, "operand") else None
            lo = conv(e.low) if hasattr(e, "low") else None
            hi = conv(e.high) if hasattr(e, "high") else None
            if a is None or lo is None or hi is None:
                return None
            return dsl.Call("between", a, lo, hi)
        return None

    return conv(expr)


def _bucket_spec(spark, table_name: str) -> tuple[tuple[str, ...], int] | None:
    """(bucket columns, bucket count) for a catalog table written with
    bucketBy (TableLayout bucketing) — feeds the cost model's
    co-partitioning credit. None for plain views/paths."""
    from verax_spark.sources.layout import bucket_layout_of

    return bucket_layout_of(spark, table_name)


def _bare_column(e: ast.Expr, by_alias, by_col) -> tuple[str, str] | None:
    """(leaf alias, column name) when ``e`` is a plain column reference."""
    if not isinstance(e, ast.Ident):
        return None
    if len(e.parts) == 2 and e.parts[0].lower() in by_alias:
        return e.parts[0].lower(), e.parts[1]
    if len(e.parts) == 1:
        owner = by_col.get(e.parts[0].lower())
        if owner and owner != "?":
            return owner, e.parts[0]
    return None


def reorder_joins(
    query: ast.Query,
    spark,
    *,
    min_tables: int = 3,
    broadcast_rows: int | None = None,
) -> tuple[ast.Query, ReorderInfo | None]:
    """Reorder the FROM clauses of ``query`` cost-based: the top-level
    Select and each CTE body (the optimizer plans every DerivedTable in the
    reference, DerivedTable.h:36-238).

    Returns (query, info); info is the top-level Select's decision, None
    when it was not eligible (CTE rewrites may still have fired). Eligible
    = a Select whose FROM is a chain of inner/comma joins over ≥
    ``min_tables`` base tables with resolvable column references.
    """
    if query.ctes:
        new_ctes = []
        for cte in query.ctes:
            body, _ = _reorder_select(
                cte.query, spark, min_tables=min_tables, broadcast_rows=broadcast_rows
            )
            new_ctes.append(dataclasses.replace(cte, query=body))
        query = dataclasses.replace(query, ctes=new_ctes)
    return _reorder_select(
        query, spark, min_tables=min_tables, broadcast_rows=broadcast_rows
    )


def _reorder_select(
    query: ast.Query,
    spark,
    *,
    min_tables: int,
    broadcast_rows: int | None,
) -> tuple[ast.Query, ReorderInfo | None]:
    sel = query.body
    if isinstance(sel, ast.SetOp):
        # plan each branch of a set operation independently (each is its
        # own DerivedTable in the reference's model)
        def branch(b):
            if isinstance(b, ast.Query):
                return _reorder_select(
                    b, spark, min_tables=min_tables, broadcast_rows=broadcast_rows
                )[0]
            if isinstance(b, ast.Select):
                wrapped, _ = _reorder_select(
                    ast.Query(body=b),
                    spark,
                    min_tables=min_tables,
                    broadcast_rows=broadcast_rows,
                )
                return wrapped.body
            if isinstance(b, ast.SetOp):
                return dataclasses.replace(
                    b, left=branch(b.left), right=branch(b.right)
                )
            return b

        new_body = dataclasses.replace(
            sel, left=branch(sel.left), right=branch(sel.right)
        )
        return dataclasses.replace(query, body=new_body), None
    if not isinstance(sel, ast.Select) or sel.from_ is None:
        return query, None
    # An unqualified `SELECT *` expands in FROM order, so reordering the
    # FROM clause would change the output column order — positional
    # semantics (UNION / INSERT by position) would silently break. A
    # qualified star (`a.*`) is pinned to its select-list position and
    # stays eligible.
    for item in sel.items:
        if isinstance(item.expr, ast.Star) and not item.expr.qualifier:
            return query, None
    leaves: list[_Leaf] = []
    conjuncts: list[ast.Expr] = []
    attachments: list[_Attachment] = []
    try:
        _flatten_from(sel.from_, leaves, conjuncts, attachments)
    except _NotEligible:
        return query, None
    if len(leaves) < min_tables:
        return query, None
    if len(leaves) > 14:
        # pruned subset-DP is exact to this arity — past it the textual
        # order stands (the reference's enumeration also degrades there)
        return query, None
    # reorder inside derived-table bodies first (every DerivedTable is
    # planned in the reference, DerivedTable.h:36-238), so the leaf df used
    # for estimation matches what is rendered
    for unit in [*leaves, *attachments]:
        node = unit.table if isinstance(unit, _Leaf) else unit.rel
        if isinstance(node, ast.SubqueryRel):
            body, _ = _reorder_select(
                node.query, spark, min_tables=min_tables, broadcast_rows=broadcast_rows
            )
            replaced = dataclasses.replace(node, query=body)
            if isinstance(unit, _Leaf):
                unit.table = replaced
            else:
                unit.rel = replaced
    by_alias = {l.alias.lower(): l for l in leaves}
    att_alias = {a.alias.lower(): a for a in attachments}
    if len(by_alias) != len(leaves) or len(att_alias) != len(attachments):
        return query, None  # duplicate alias (unaliased self-join)
    if set(by_alias) & set(att_alias):
        return query, None

    def unit_df(unit):
        if isinstance(unit, _Leaf) and not unit.derived:
            return spark.table(unit.real_name)
        if isinstance(unit, _Attachment) and unit.real_name:
            return spark.table(unit.real_name)
        node = unit.table if isinstance(unit, _Leaf) else unit.rel
        return spark.sql(node.query.sql())

    # bare-column → owning unit ("?" = ambiguous); attachments participate
    # so their columns classify conjuncts as residual, never as core edges
    by_col: dict[str, str] = {}
    dfs: dict[str, "DataFrame"] = {}
    try:
        for unit in [*leaves, *attachments]:
            df = dfs[unit.alias.lower()] = unit_df(unit)
            unit.columns = {c.lower() for c in df.columns}
    except Exception:
        return query, None
    for unit in [*leaves, *attachments]:
        for c in unit.columns:
            by_col[c] = "?" if c in by_col else unit.alias.lower()
    # derived core leaves: planning may need to count the subquery — only
    # eligible when its inputs are planning-scale (footer metadata bound);
    # an unbounded derived leaf forfeits reordering rather than running a
    # full subquery to plan one
    for l in leaves:
        if l.derived and not _bounded_inputs(dfs[l.alias.lower()]):
            return query, None
    by_alias_all = dict(by_alias)
    by_alias_all.update(att_alias)

    if sel.where is not None:
        _split_and(sel.where, conjuncts)

    # classify conjuncts: single-table predicates, equi-join edges, residual
    from verax_spark.optimizer.query_graph import JoinEdge, QueryGraph

    single: dict[str, list[ast.Expr]] = {}
    edges: list[JoinEdge] = []
    edge_expr: dict[int, ast.Expr] = {}
    residual: list[ast.Expr] = []
    for c in conjuncts:
        refs = _refs(c, by_alias_all, by_col)
        if refs is None or len(refs) == 0 or (refs & set(att_alias)):
            # conjuncts touching a hoisted attachment stay in WHERE
            # verbatim — filter placement above both joins is equivalent
            residual.append(c)
        elif len(refs) == 1:
            single.setdefault(next(iter(refs)), []).append(c)
        elif (
            len(refs) == 2
            and isinstance(c, ast.BinOp)
            and c.op == "="
            and (lhs := _bare_column(c.left, by_alias, by_col)) is not None
            and (rhs := _bare_column(c.right, by_alias, by_col)) is not None
            and lhs[0] != rhs[0]
        ):
            e = JoinEdge(lhs[0], rhs[0], lhs[1], rhs[1])
            edges.append(e)
            edge_expr[id(e)] = c
        else:
            residual.append(c)
    if not edges:
        return query, None

    # build the graph: estimation predicates are de-qualified copies over
    # the bare scans; the rendered query keeps the original conjuncts
    import pyspark.sql.functions as F

    g = QueryGraph(history=_history())
    if broadcast_rows is not None:
        g.broadcast_rows = broadcast_rows
    for l in leaves:
        a = l.alias.lower()
        preds = single.get(a, ())
        pred = None
        dsl_terms = [_to_dsl(c, a) for c in preds]
        if preds and all(d is not None for d in dsl_terms):
            # typed DSL predicate: footer-stats selectivity, zero jobs
            from verax_spark.plans.expr import Call as _Call

            pred = dsl_terms[0]
            for d in dsl_terms[1:]:
                pred = _Call("and", pred, d)
        else:
            for c in preds:
                term = F.expr(_dequalify(c, a).sql())
                pred = term if pred is None else (pred & term)
        g.table(
            a,
            dfs[a],
            pred,
            bucketed_by=(
                None if l.derived else _bucket_spec(spark, l.real_name)
            ),
        )
    for e in edges:
        g.edges.append(e)
    n_explicit = len(g.edges)
    try:
        tree, est = g.choose_tree()
    except Exception:
        return query, None
    if tree is None:
        return query, None

    def _has_cross(t: tuple) -> bool:
        return t[0] == "cross" or (
            t[0] != "leaf" and (_has_cross(t[1]) or _has_cross(t[2]))
        )

    # a core that only connects through a hoisted attachment would plan a
    # cross join the textual order avoids — keep the textual order there
    if attachments and _has_cross(tree):
        return query, None
    implied = {id(e) for e in g.edges[n_explicit:]}
    # core-leaf history signatures + input dirs: the execution-feedback
    # recorder matches executed-plan scan nodes back to these
    signatures: dict[str, tuple[str, tuple[str, ...]]] = {}
    for a, ref in g.tables.items():
        try:
            files = ref.df.inputFiles()
        except Exception:
            files = []
        paths = tuple(
            sorted(
                f.removeprefix("file://").removeprefix("file:") for f in files
            )
        )
        signatures[a] = (g._signature(ref), paths)

    def render(t: tuple) -> ast.Relation:
        if t[0] == "leaf":
            order.append(t[1])
            return by_alias[t[1]].table
        if t[0] == "lookup":
            # planner-chosen index lookup (joinByIndex analog): rendered as
            # the same inner join; the scan-pruning half is applied after
            # rendering as an IN conjunct over the probe's key domain
            lookups.append(t)
        left = render(t[1])
        right = render(t[2])
        if t[0] == "cross":
            return ast.Join("cross", left, right)
        on: ast.Expr | None = None
        for e in t[3]:
            c = edge_expr.get(id(e))
            if c is None:  # implied edge: synthesize alias.k1 = alias.k2
                c = ast.BinOp(
                    "=",
                    ast.Ident([e.left, e.left_key]),
                    ast.Ident([e.right, e.right_key]),
                )
            on = c if on is None else ast.BinOp("and", on, c)
        return ast.Join("inner", left, right, on=on)

    order: list[str] = []
    lookups: list[tuple] = []
    lookup_applied: list[str] = []
    new_from = render(tree)

    # Index-lookup scan pruning (ref LookupKeys ConnectorMetadata.h:392-418:
    # the probe key domain ships to the storage layer). SQL-renderable form:
    # when the probe side is a single SMALL leaf, materialize its filtered
    # key domain NOW (a planning-scale job, same budget class as the
    # derived-leaf counts above) and add `build.key IN (literals)` — parquet
    # row-group pruning over the build's bucketed+sorted layout then skips
    # everything but the matching point ranges. Skipped (join stands,
    # bucket-local) when the probe is too big or keys aren't literal-safe.
    lookup_conjuncts: list[ast.Expr] = []
    for t in lookups:
        probe_t, build_t, e = t[1], t[2], t[3][0]
        if probe_t[0] != "leaf":
            continue
        palias, balias = probe_t[1], build_t[1]
        pkey = e.left_key if e.left == palias else e.right_key
        bkey = e.right_key if e.left == palias else e.left_key
        if est.get(palias, float("inf")) > _LOOKUP_INLINE_MAX_KEYS:
            continue
        try:
            rows = (
                g.tables[palias]
                .filtered()
                .select(pkey)
                .distinct()
                .limit(_LOOKUP_INLINE_MAX_KEYS + 1)
                .collect()
            )
        except Exception:
            continue
        if len(rows) > _LOOKUP_INLINE_MAX_KEYS:
            continue
        lits: list[ast.Expr] = []
        for r in rows:
            v = r[0]
            if v is None:
                continue  # NULL keys never equi-match; safe to drop
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                lits = []
                break
            if isinstance(v, str):
                lits.append(ast.Raw("'" + v.replace("'", "''") + "'"))
            else:
                lits.append(ast.Raw(str(v)))
        if not lits:
            continue
        lookup_conjuncts.append(
            ast.InList(ast.Ident([balias, bkey]), lits)
        )
        lookup_applied.append(balias)

    # re-attach hoisted LEFT joins above the reordered core, in their
    # original left-to-right order (preserves inter-attachment scope)
    from verax_spark.optimizer.query_graph import _parquet_row_count

    for att in attachments:
        new_from = ast.Join("left", new_from, att.rel, on=att.on)
        rows = _parquet_row_count(dfs[att.alias.lower()])
        if rows is not None:
            est[att.alias.lower()] = float(rows)

    # WHERE = single-table predicates + residual (original spellings)
    # + index-lookup IN conjuncts (pure restrictions of the join keys to the
    # probe's actual domain — never change results, only prune the scan)
    new_where: ast.Expr | None = None
    for c in (
        [c for preds in single.values() for c in preds]
        + residual
        + lookup_conjuncts
    ):
        new_where = c if new_where is None else ast.BinOp("and", new_where, c)

    from verax_spark.optimizer.query_graph import _row_width

    # columns each leaf actually contributes (Catalyst prunes the rest), so
    # the broadcast byte estimate reflects the projected row, not the table
    used_cols: dict[str, set[str]] = {a: set() for a in by_alias}
    for node in _walk_idents(sel):
        parts = node.parts
        if len(parts) >= 2 and parts[0].lower() in used_cols:
            used_cols[parts[0].lower()].add(parts[-1].lower())
        elif len(parts) == 1:
            owner = by_col.get(parts[0].lower())
            if owner in used_cols:
                used_cols[owner].add(parts[0].lower())

    def can_bcast(alias: str) -> bool:
        rows = est.get(alias, float("inf"))
        try:
            schema = dfs[alias].schema
            cols = used_cols.get(alias)
            if cols:
                from pyspark.sql.types import StructType

                schema = StructType(
                    [f for f in schema.fields if f.name.lower() in cols]
                )
            width = _row_width(schema)
        except Exception:
            width = 24.0
        return g.broadcastable(rows, width)

    core_bcast = [a for a in order if can_bcast(a)]
    if len(core_bcast) == len(leaves):
        # broadcasting every core side is meaningless; keep the smallest
        core_bcast = sorted(core_bcast, key=lambda a: est[a])[:-1]
    # a small attachment is a broadcastable build side of its left join
    att_bcast = [a.alias.lower() for a in attachments if can_bcast(a.alias.lower())]
    broadcast = sorted(core_bcast + att_bcast)
    new_sel = dataclasses.replace(sel, from_=new_from, where=new_where)
    if broadcast:
        new_sel.hint = f"broadcast({', '.join(broadcast)})"
    new_query = dataclasses.replace(query, body=new_sel)
    return new_query, ReorderInfo(
        order=order,
        broadcast=broadcast,
        tree=tree,
        est=est,
        attachments=[a.alias.lower() for a in attachments],
        signatures=signatures,
        lookups=lookup_applied,
    )
