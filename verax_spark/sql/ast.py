"""Presto SQL AST + Spark-SQL rendering.

Node inventory mirrors the reference's typed AST (ref
axiom/sql/presto/ast/AstExpressions.h — literals, call, cast, case, lambda,
quantified comparison, exists/subquery, between/in/like, subscript,
dereference; ref axiom/sql/presto/ast/AstRelations.h — aliased relation,
sampled relation, joins, unnest with ordinality, lateral, values; ref
axiom/sql/presto/ast/AstStatements.h — query, with, query specification,
set operations, sort item, select items).

Each node renders itself to *Spark* SQL (`sql()`), which is where dialect
lowering happens structurally — by construction it cannot corrupt string
literals or mis-nest (the regex shim's failure modes):

- Presto 1-based subscripts → ``element_at`` (arrays AND maps; Spark ``[]``
  is 0-based for arrays — a semantic fix a lexical rewriter can't make
  safely);
- ``ARRAY[...]`` → ``array(...)``; ``ROW(...)`` → ``struct(...)``;
  ``MAP(ARRAY[...], ARRAY[...])`` → ``map_from_arrays``;
- typed literals ``double '1.5'`` → ``cast('1.5' as double)`` (date/
  timestamp/interval share syntax with Spark and pass through);
- function renames via functions.presto.PRESTO_TO_SPARK; non-1:1 names
  (truncate/sha256/json_parse/...) are left untouched — PrestoSession
  registers them as Catalyst SQL UDFs (register_sql_compat);
- quantified comparisons: ``= ANY`` → ``IN``, ``<> ALL`` → ``NOT IN``,
  ordered quantifiers → min/max scalar subquery;
- UNNEST relations (any join spelling, incl. implicit comma = lateral) →
  ``LATERAL VIEW explode/inline``; WITH ORDINALITY → zipped 1-based index;
- ``TABLESAMPLE BERNOULLI(p)`` → ``TABLESAMPLE (p PERCENT)``;
- ``FETCH FIRST n ROWS ONLY`` → ``LIMIT n``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ParseError(ValueError):
    pass


def _renamed(name: str) -> str:
    from verax_spark.functions.presto import PRESTO_TO_SPARK

    return PRESTO_TO_SPARK.get(name.lower(), name)


def _literal_text(e) -> str | None:
    """Inner text of a string-literal arg ('' unescaped), else None."""
    if isinstance(e, Raw):
        t = e.text
        if len(t) >= 2 and t[0] == "'" and t[-1] == "'":
            return t[1:-1].replace("''", "'")
    return None


def _quote_str(s: str) -> str:
    """Render a python string as a Spark SQL string literal (backslash
    escapes are active in Spark's default parser)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


# ---------------------------------------------------------------------------
# Expressions
class Expr:
    def sql(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class Raw(Expr):
    """Verbatim token run: numbers, strings (quotes included), NULL, TRUE."""

    text: str

    def sql(self) -> str:
        return self.text


@dataclass
class Parameter(Expr):
    """Positional prepared-statement parameter ``?`` (ref Parameter,
    axiom/sql/presto/ast/AstExpressions.h:133). ``index`` is 0-based parse
    order; PrestoSession.sql(text, params=[...]) binds each to a rendered
    constant before the statement reaches Spark."""

    index: int
    bound: str | None = None

    def sql(self) -> str:
        if self.bound is None:
            raise ValueError(
                f"unbound parameter ?{self.index + 1}: pass "
                "params=[...] to PrestoSession.sql"
            )
        return self.bound


@dataclass
class TypedLit(Expr):
    """``double '1.5'`` — Presto typed literal (AstExpressions.h GenericLiteral)."""

    type_: str
    value: str  # raw quoted string, escapes preserved

    _PASSTHROUGH = {"date", "timestamp", "time"}

    def sql(self) -> str:
        t = self.type_.lower()
        if t in self._PASSTHROUGH:
            return f"{t} {self.value}"
        if t == "decimal" and "(" not in self.type_:
            body = self.value.strip("'")
            digits = body.replace("-", "").replace("+", "")
            scale = len(digits.split(".")[1]) if "." in digits else 0
            prec = max(len(digits.replace(".", "")), 1)
            return f"cast({self.value} as decimal({prec},{scale}))"
        return f"cast({self.value} as {self.type_})"


@dataclass
class Interval(Expr):
    """``interval '3' day [to hour]``."""

    value: str
    unit: str
    to_unit: str | None = None

    def sql(self) -> str:
        to = f" to {self.to_unit}" if self.to_unit else ""
        return f"interval {self.value} {self.unit}{to}"


@dataclass
class Ident(Expr):
    """Possibly-qualified name; parts keep their original spelling."""

    parts: list[str]

    def sql(self) -> str:
        return ".".join(self.parts)


@dataclass
class Star(Expr):
    qualifier: list[str] = field(default_factory=list)

    def sql(self) -> str:
        return ".".join(self.qualifier + ["*"])


@dataclass
class BinOp(Expr):
    op: str
    left: Expr
    right: Expr

    def sql(self) -> str:
        return f"({self.left.sql()} {self.op} {self.right.sql()})"


@dataclass
class UnOp(Expr):
    op: str  # 'not', '-', '+'
    operand: Expr

    def sql(self) -> str:
        sep = " " if self.op.isalpha() else ""
        return f"({self.op}{sep}{self.operand.sql()})"


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False

    def sql(self) -> str:
        return f"({self.operand.sql()} is {'not ' if self.negated else ''}null)"


@dataclass
class IsDistinctFrom(Expr):
    left: Expr
    right: Expr
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        return f"({self.left.sql()} is {neg}distinct from {self.right.sql()})"


@dataclass
class AtTimeZone(Expr):
    """Presto ``ts AT TIME ZONE tz``: the same instant re-displayed in tz.

    Spark timestamps are zoneless instants rendered in the session zone, so
    the instant-preserving analog is from_utc_timestamp — exact when the
    stored values are UTC instants (this engine's convention; the session
    zone is pinned to UTC in session.py)."""

    operand: Expr
    tz: Expr

    def sql(self) -> str:
        return f"from_utc_timestamp({self.operand.sql()}, {self.tz.sql()})"


@dataclass
class TrimForm(Expr):
    """ANSI ``trim([BOTH|LEADING|TRAILING] [chars] FROM src)`` — Spark
    supports the identical syntax with identical semantics; re-rendered
    verbatim."""

    spec: str  # both | leading | trailing
    chars: Expr | None
    src: Expr

    def sql(self) -> str:
        c = f" {self.chars.sql()}" if self.chars is not None else ""
        return f"trim({self.spec}{c} from {self.src.sql()})"


@dataclass
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        return (
            f"({self.operand.sql()} {neg}between {self.low.sql()}"
            f" and {self.high.sql()})"
        )


@dataclass
class Like(Expr):
    operand: Expr
    pattern: Expr
    escape: Expr | None = None
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        esc = f" escape {self.escape.sql()}" if self.escape else ""
        return f"({self.operand.sql()} {neg}like {self.pattern.sql()}{esc})"


@dataclass
class InList(Expr):
    operand: Expr
    items: list[Expr]
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        return (
            f"({self.operand.sql()} {neg}in "
            f"({', '.join(e.sql() for e in self.items)}))"
        )


@dataclass
class InSubquery(Expr):
    operand: Expr
    query: "Query"
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        return f"({self.operand.sql()} {neg}in ({self.query.sql()}))"


@dataclass
class Quantified(Expr):
    """Quantified comparison (AstExpressions.h QuantifiedComparison).

    Lowering: ``= ANY`` ⇔ IN; ``<> ALL`` ⇔ NOT IN (both natively carry the
    standard empty-set/NULL semantics). Ordered quantifiers reduce to
    min/max scalar subqueries wrapped in the full three-valued truth
    table — the bare min/max comparison alone is WRONG at the edges
    (``x > ALL(∅)`` is TRUE, not NULL; a NULL element must force UNKNOWN
    unless some comparison is already FALSE). Spec per SQL standard
    8.9 <quantified comparison predicate>; verified row-for-row against
    DuckDB in the replay corpus.
    """

    op: str
    quantifier: str  # 'any' | 'all'  ('some' normalized to 'any')
    operand: Expr
    query: "Query"

    _AGG = {
        (">", "any"): "min", (">=", "any"): "min",
        ("<", "any"): "max", ("<=", "any"): "max",
        (">", "all"): "max", (">=", "all"): "max",
        ("<", "all"): "min", ("<=", "all"): "min",
    }

    def sql(self) -> str:
        sub = self.query.sql()
        if (self.op, self.quantifier) == ("=", "any"):
            return f"({self.operand.sql()} in ({sub}))"
        if (self.op, self.quantifier) == ("<>", "all"):
            return f"({self.operand.sql()} not in ({sub}))"
        agg = self._AGG.get((self.op, self.quantifier))
        if agg is None:
            raise NotImplementedError(
                f"quantified comparison {self.op} {self.quantifier.upper()}(...)"
                " has no clean Spark lowering; rewrite as EXISTS"
            )
        s = self.operand.sql()
        n_all = f"(select count(*) from ({sub}) as __q(__v))"
        n_nn = f"(select count(__q.__v) from ({sub}) as __q(__v))"
        cmp_ = f"({s} {self.op} (select {agg}(__q.__v) from ({sub}) as __q(__v)))"
        if self.quantifier == "all":
            # empty→TRUE; definite counterexample→FALSE; NULL element→NULL;
            # else the extremum comparison (TRUE, or NULL when s is NULL)
            return (
                f"(case when {n_all} = 0 then true "
                f"when not {cmp_} then false "
                f"when {n_all} <> {n_nn} then cast(null as boolean) "
                f"else {cmp_} end)"
            )
        # ANY: empty→FALSE; definite witness→TRUE; NULL element→NULL;
        # else the extremum comparison (FALSE, or NULL when s is NULL)
        return (
            f"(case when {n_all} = 0 then false "
            f"when {cmp_} then true "
            f"when {n_all} <> {n_nn} then cast(null as boolean) "
            f"else {cmp_} end)"
        )


@dataclass
class Cast(Expr):
    operand: Expr
    type_: str
    try_: bool = False

    def sql(self) -> str:
        fn = "try_cast" if self.try_ else "cast"
        return f"{fn}({self.operand.sql()} as {self.type_})"


@dataclass
class Case(Expr):
    operand: Expr | None
    whens: list[tuple[Expr, Expr]]
    else_: Expr | None

    def sql(self) -> str:
        parts = ["case"]
        if self.operand is not None:
            parts.append(self.operand.sql())
        for cond, val in self.whens:
            parts.append(f"when {cond.sql()} then {val.sql()}")
        if self.else_ is not None:
            parts.append(f"else {self.else_.sql()}")
        parts.append("end")
        return " ".join(parts)


@dataclass
class ArrayCtor(Expr):
    items: list[Expr]

    def sql(self) -> str:
        return f"array({', '.join(e.sql() for e in self.items)})"


@dataclass
class RowCtor(Expr):
    items: list[Expr]

    def sql(self) -> str:
        return f"struct({', '.join(e.sql() for e in self.items)})"


@dataclass
class Subscript(Expr):
    """Presto ``a[i]``: 1-based for arrays, key-lookup for maps — both are
    exactly Spark's ``element_at`` (Spark's ``[]`` is 0-based for arrays,
    so a verbatim pass-through would be off by one)."""

    operand: Expr
    index: Expr

    def sql(self) -> str:
        return f"element_at({self.operand.sql()}, {self.index.sql()})"


@dataclass
class Deref(Expr):
    """Row-field dereference ``expr.field`` on a non-name base."""

    operand: Expr
    fld: str

    def sql(self) -> str:
        return f"({self.operand.sql()}).{self.fld}"


@dataclass
class Lambda(Expr):
    params: list[str]
    body: Expr

    def sql(self) -> str:
        head = self.params[0] if len(self.params) == 1 else f"({', '.join(self.params)})"
        return f"{head} -> {self.body.sql()}"


@dataclass
class WindowFrame:
    kind: str  # 'rows' | 'range' | 'groups'
    start: str
    end: str | None

    def sql(self) -> str:
        if self.kind == "groups":
            raise NotImplementedError(
                "GROUPS window frames: use operators.windows.with_groups_frame"
                " (exact range-over-dense_rank emulation); SQL text lowering"
                " would need query restructuring"
            )
        if self.end is None:
            return f"{self.kind} {self.start}"
        return f"{self.kind} between {self.start} and {self.end}"


@dataclass
class WindowSpec:
    partition_by: list[Expr] = field(default_factory=list)
    order_by: list["SortItem"] = field(default_factory=list)
    frame: WindowFrame | None = None

    def sql(self) -> str:
        parts = []
        if self.partition_by:
            parts.append(
                "partition by " + ", ".join(e.sql() for e in self.partition_by)
            )
        if self.order_by:
            parts.append("order by " + ", ".join(s.sql() for s in self.order_by))
        if self.frame is not None:
            parts.append(self.frame.sql())
        return f"({' '.join(parts)})"


# rank-family window functions: defined by row position / whole partition,
# so an explicit frame is a Presto-legal no-op that Spark rejects
_FRAMELESS_WINDOW_FNS = frozenset({
    "rank", "dense_rank", "percent_rank", "cume_dist", "ntile",
    "row_number", "lag", "lead",
})


@dataclass
class Call(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)
    distinct: bool = False
    filter_: Expr | None = None
    ignore_nulls: bool = False
    window: WindowSpec | None = None
    window_name: str | None = None  # OVER w — named WINDOW-clause reference
    agg_order: list["SortItem"] = field(default_factory=list)

    # aggregates whose result is independent of input order: ORDER BY inside
    # the call is a no-op and is dropped (ref QueryGraph.h:829-877 carries the
    # ordering only for order-sensitive aggregates)
    _ORDER_INSENSITIVE = {
        "sum", "count", "avg", "min", "max", "approx_distinct", "arbitrary",
        "any_value", "bool_and", "bool_or", "every", "any", "count_if",
        "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
        "var_samp", "set_agg", "collect_set", "min_by", "max_by",
    }

    def _ordered_agg_sql(self) -> str:
        """Presto ``array_agg(v ORDER BY k1 [desc], ...)`` → Spark
        ``transform(array_sort(collect_list(struct(v, k...)), cmp), s -> v)``
        — a comparator-sorted collect, deterministic under any partitioning.
        """
        name = self.name.lower()
        if name not in ("array_agg", "collect_list"):
            raise NotImplementedError(
                f"ORDER BY inside {name}() is not supported (only array_agg;"
                " order-insensitive aggregates drop it)"
            )
        if len(self.args) != 1:
            raise NotImplementedError("array_agg(...ORDER BY...) takes one arg")
        v = self.args[0].sql()
        if self.distinct:
            # only the natural ordering of the value itself is expressible
            keys = self.agg_order
            if len(keys) == 1 and keys[0].expr.sql() == v:
                fn = "asc" if keys[0].ascending else "desc"
                flag = "true" if keys[0].ascending else "false"
                return f"sort_array(collect_set({v}), {flag})"
            raise NotImplementedError(
                "array_agg(DISTINCT v ORDER BY k): k must be v itself"
            )
        fields = [f"{v} as __v"] + [
            f"{s.expr.sql()} as __k{i}" for i, s in enumerate(self.agg_order)
        ]
        agg = f"collect_list(struct({', '.join(fields)}))"
        if self.filter_ is not None:
            agg += f" filter (where {self.filter_.sql()})"
        whens = []
        for i, s in enumerate(self.agg_order):
            lt, gt = ("-1", "1") if s.ascending else ("1", "-1")
            whens.append(f"when a.__k{i} < b.__k{i} then {lt} "
                         f"when a.__k{i} > b.__k{i} then {gt}")
        cmp_ = f"(a, b) -> case {' '.join(whens)} else 0 end"
        return f"transform(array_sort({agg}, {cmp_}), s -> s.__v)"

    _TRY_OPS = {"+": "try_add", "-": "try_subtract", "*": "try_multiply",
                "/": "try_divide"}

    def _try_sql(self) -> str:
        """Presto TRY(expr) → NULL on evaluation error. Spark has no generic
        TRY, but its try_* family covers the error-throwing forms; TRY over
        a non-throwing expression is the identity."""
        inner = self.args[0]
        if isinstance(inner, BinOp) and inner.op in self._TRY_OPS:
            return (
                f"{self._TRY_OPS[inner.op]}({inner.left.sql()}, "
                f"{inner.right.sql()})"
            )
        if isinstance(inner, Cast):
            return Cast(inner.operand, inner.type_, try_=True).sql()
        if isinstance(inner, Subscript):
            return (
                f"try_element_at({inner.operand.sql()}, {inner.index.sql()})"
            )
        raise NotImplementedError(
            "TRY(...) lowers only over arithmetic, CAST, and subscripts "
            "(Spark try_add/try_cast/try_element_at family); other "
            "expressions cannot throw in Spark's non-ANSI evaluation"
        )

    def _entry_agg_sql(self) -> str:
        """Presto map/set aggregates with no Spark builtin — lowered onto a
        collect_list fold (ref function surface
        axiom/optimizer/FunctionRegistry.h:111-295). Catalyst deduplicates
        the repeated identical collect_list aggregate expressions."""
        if self.window is not None or self.window_name is not None:
            raise NotImplementedError(f"windowed {self.name}")
        kind = self.name.lower()
        filt = (
            f" filter (where {self.filter_.sql()})" if self.filter_ is not None else ""
        )
        a0 = self.args[0].sql()
        if kind == "checksum":
            # order-insensitive aggregate checksum (engine-local constant;
            # equal multisets ⇒ equal checksum)
            return f"sum(xxhash64({a0})){filt}"
        if kind == "set_union":
            return f"array_distinct(flatten(collect_list({a0}){filt}))"
        if kind == "map_union_sum":
            # union of the group's maps, summing values per key; the
            # per-key fold seeds with the first value so the element
            # type (int/double/decimal) is preserved
            ents = f"flatten(collect_list(map_entries({a0})){filt})"
            keys = f"array_distinct(transform({ents}, __e -> __e.key))"
            vals = f"transform(filter({ents}, __e -> __e.key = __k), __e -> __e.value)"
            return (
                f"map_from_arrays({keys}, transform({keys}, __k -> "
                f"aggregate(slice({vals}, 2, greatest(size({vals}) - 1, 0)), "
                f"({vals})[0], (__a, __x) -> __a + __x)))"
            )
        if kind == "map_union":
            ents = f"flatten(collect_list(map_entries({a0})){filt})"
            keys = f"array_distinct(transform({ents}, __e -> __e.key))"
            return (
                f"map_from_arrays({keys}, transform({keys}, "
                f"__k -> filter({ents}, __e -> __e.key = __k)[0].value))"
            )
        if kind == "multimap_agg":
            a1 = self.args[1].sql()
            ents = (
                f"collect_list(struct({a0} as key, {a1} as value)){filt}"
            )
            keys = f"array_distinct(transform({ents}, __e -> __e.key))"
            return (
                f"map_from_arrays({keys}, transform({keys}, "
                f"__k -> transform(filter({ents}, __e -> __e.key = __k), "
                f"__e -> __e.value)))"
            )
        # histogram
        vals = f"collect_list({a0}){filt}"
        keys = f"array_distinct({vals})"
        return (
            f"map_from_arrays({keys}, transform({keys}, "
            f"__k -> cast(size(filter({vals}, __e -> __e = __k)) as bigint)))"
        )

    def sql(self) -> str:
        if self.name.lower() == "try" and len(self.args) == 1:
            return self._try_sql()
        if self.agg_order and self.name.lower() not in self._ORDER_INSENSITIVE:
            if self.window is not None:
                raise NotImplementedError(
                    "ORDER BY inside a windowed aggregate call"
                )
            if self.name.lower() == "listagg":
                # Spark 4 implements the SQL-standard ordered-set aggregate
                # natively (incl. DISTINCT) — reconstruct the WITHIN GROUP
                # clause the parser folded into agg_order
                items = ", ".join(s.sql() for s in self.agg_order)
                inner = ", ".join(e.sql() for e in self.args)
                head = (
                    f"listagg({'distinct ' if self.distinct else ''}{inner})"
                    f" within group (order by {items})"
                )
                if self.filter_ is not None:
                    head += f" filter (where {self.filter_.sql()})"
                return head
            return self._ordered_agg_sql()
        name = _renamed(self.name)
        args = ", ".join(e.sql() for e in self.args)
        if (
            self.name.lower() == "cardinality"
            and len(self.args) == 1
            and isinstance(self.args[0], Call)
            and self.args[0].name.lower() in ("approx_set", "merge")
        ):
            # Presto HLL pipeline: cardinality(approx_set(x)) /
            # cardinality(merge(hll)) → DataSketches estimate over the
            # sketch aggregate (approx_set → hll_sketch_agg, merge →
            # hll_union_agg). `cardinality` alone stays `size` (arrays).
            name, args = "hll_sketch_estimate", args
        elif (
            self.name.lower() in ("value_at_quantile", "values_at_quantiles")
            and len(self.args) == 2
            and isinstance(self.args[0], Call)
            and self.args[0].name.lower() in ("qdigest_agg", "tdigest_agg")
        ):
            # Presto quantile-sketch pipeline: value_at_quantile(
            # qdigest_agg(x), q) → percentile_approx(x, q) (Spark folds
            # sketch build + query into one aggregate)
            inner = self.args[0]
            name = "percentile_approx"
            args = ", ".join(
                [inner.args[0].sql(), self.args[1].sql(), "10000"]
            )
            if inner.filter_ is not None:
                head = f"{name}({args}) filter (where {inner.filter_.sql()})"
                return head
        elif self.name.lower() == "map" and len(self.args) == 2:
            name, args = "map_from_arrays", args
        elif self.name.lower() == "map" and not self.args:
            name, args = "map", ""
        elif self.name.lower() == "repeat" and len(self.args) == 2:
            # Presto repeat(element, count) returns ARRAY; Spark repeat is
            # string repetition
            name = "array_repeat"
        elif self.name.lower() == "split" and len(self.args) in (2, 3):
            # Presto split's delimiter is a literal, Spark's is a regex
            inner = _literal_text(self.args[1])
            if inner is None:
                raise NotImplementedError(
                    "Presto split(x, delim) requires a literal delimiter "
                    "(Spark split is regex-based)"
                )
            from verax_spark.functions.presto import regex_quote

            rest = [e.sql() for e in self.args[2:]]
            args = ", ".join(
                [self.args[0].sql(), _quote_str(regex_quote(inner)), *rest]
            )
        elif self.name.lower() == "date_format" and len(self.args) == 2:
            # Presto date_format is MySQL-%-style; Spark's is Java-style
            inner = _literal_text(self.args[1])
            if inner is None:
                raise NotImplementedError(
                    "Presto date_format requires a literal format string"
                )
            from verax_spark.functions.presto import mysql_datetime_pattern

            args = ", ".join(
                [self.args[0].sql(), _quote_str(mysql_datetime_pattern(inner))]
            )
        elif self.name.lower() == "regexp_extract" and len(self.args) == 2:
            # Presto defaults to group 0 (whole match); Spark SQL to group 1
            args += ", 0"
        elif self.name.lower() == "normalize" and len(self.args) == 1:
            # registered UDF is the 2-arg form; Presto's default form is NFC
            args += ", 'NFC'"
        elif self.name.lower() == "word_stem" and len(self.args) == 2:
            lang = _literal_text(self.args[1])
            if lang not in ("en", "english"):
                raise NotImplementedError(
                    "word_stem: only the English Porter stemmer is implemented"
                )
            args = self.args[0].sql()
        elif self.name.lower() == "parse_datetime" and len(self.args) == 2:
            inner = _literal_text(self.args[1])
            if inner is None:
                raise NotImplementedError(
                    "parse_datetime requires a literal Joda pattern"
                )
            from verax_spark.functions.presto import _joda_pattern

            name = "to_timestamp"
            args = ", ".join([self.args[0].sql(), _quote_str(_joda_pattern(inner))])
        elif self.name.lower() == "json_array_contains" and len(self.args) == 2:
            x, v = self.args[0].sql(), self.args[1].sql()
            arr = f"try_cast(try_parse_json({x}) as array<variant>)"
            probe = f"substring(to_json(array({v})), 2, length(to_json(array({v}))) - 2)"
            return (
                f"(case when {arr} is null then cast(null as boolean) "
                f"else exists({arr}, __e -> to_json(__e) = {probe}) end)"
            )
        elif self.name.lower() == "regexp_replace" and len(self.args) == 2:
            # Presto 2-arg form removes matches; Spark requires 3 args
            args += ", ''"
        elif self.name.lower() in ("least", "greatest") and len(self.args) >= 2:
            # Presto least/greatest are NULL if ANY arg is NULL; Spark skips
            # NULLs
            arg_sql = [e.sql() for e in self.args]
            null_test = " or ".join(f"{a} is null" for a in arg_sql)
            return (
                f"(case when {null_test} then null "
                f"else {name}({', '.join(arg_sql)}) end)"
            )
        elif self.name.lower() in ("array_min", "array_max") and len(self.args) == 1:
            # Presto array_min/max are NULL if the array contains NULL
            a = self.args[0].sql()
            return (
                f"(case when exists({a}, _e -> _e is null) then null "
                f"else {name}({a}) end)"
            )
        elif self.name.lower() == "ngrams" and len(self.args) == 2:
            # Presto ngrams(arr, n) → windowed subarrays; shorter-than-n
            # arrays yield one ngram of the whole array
            a, n = self.args[0].sql(), self.args[1].sql()
            return (
                f"transform(sequence(1, greatest(size({a}) - {n} + 1, 1)), "
                f"__i -> slice({a}, __i, {n}))"
            )
        elif self.name.lower() in ("array_sum", "array_average") and len(self.args) == 1:
            a = self.args[0].sql()
            nn = f"filter({a}, __e -> __e is not null)"
            total = (
                f"aggregate({nn}, cast(0.0 as double), "
                f"(__acc, __x) -> __acc + cast(__x as double))"
            )
            if self.name.lower() == "array_sum":
                return total
            return f"({total} / nullif(size({nn}), 0))"
        elif self.name.lower() == "json_array_get" and len(self.args) == 2:
            return (
                f"to_json(variant_get(parse_json({self.args[0].sql()}), "
                f"'$[' || cast({self.args[1].sql()} as string) || ']', 'variant'))"
            )
        elif self.name.lower() == "json_extract" and len(self.args) == 2:
            # Presto json_extract returns JSON text (strings stay quoted);
            # get_json_object unquotes scalars — route through VARIANT
            return (
                f"to_json(variant_get(parse_json({self.args[0].sql()}), "
                f"{self.args[1].sql()}, 'variant'))"
            )
        elif self.name.lower() == "map_agg" and len(self.args) == 2:
            # Presto map_agg(k, v) → map_from_entries(collect_list(struct(..)))
            if self.window is not None or self.window_name is not None:
                raise NotImplementedError("windowed map_agg")
            inner = f"collect_list(struct({args}))"
            if self.filter_ is not None:
                inner += f" filter (where {self.filter_.sql()})"
            return f"map_from_entries({inner})"
        elif (
            self.name.lower()
            in ("map_union", "map_union_sum", "multimap_agg", "set_union",
                "histogram", "checksum")
            and self.args
        ):
            return self._entry_agg_sql()
        elif self.name.lower() == "kurtosis" and len(self.args) == 1:
            # Presto kurtosis = UNBIASED excess estimator; Spark's builtin
            # is the population excess (functions/presto.py _presto_kurtosis
            # is the DSL twin). FILTER folds into the argument (count() over
            # the CASE skips the filtered-out rows' NULLs = FILTER exactly).
            if self.window is not None or self.window_name is not None:
                raise NotImplementedError("windowed kurtosis")
            x = f"cast({self.args[0].sql()} as double)"
            if self.filter_ is not None:
                x = f"(case when {self.filter_.sql()} then {x} end)"
            n = f"cast(count({x}) as double)"
            m = f"avg({x})"
            s2, s3, s4 = (f"sum(power({x}, {k}))" for k in (2, 3, 4))
            m2 = f"({s2} - {n} * {m} * {m})"
            m4 = (
                f"({s4} - 4.0 * {m} * {s3} + 6.0 * {m} * {m} * {s2}"
                f" - 3.0 * {n} * power({m}, 4))"
            )
            return (
                f"(case when {n} > 3.0 and {m2} > 0.0 then "
                f"{n} * ({n} + 1) * ({n} - 1) / (({n} - 2) * ({n} - 3))"
                f" * {m4} / ({m2} * {m2})"
                f" - 3.0 * ({n} - 1) * ({n} - 1) / (({n} - 2) * ({n} - 3))"
                f" end)"
            )
        head = f"{name}({'distinct ' if self.distinct else ''}{args})"
        if self.filter_ is not None:
            head += f" filter (where {self.filter_.sql()})"
        if self.ignore_nulls:
            head += " ignore nulls"
        if self.window is not None:
            spec = self.window
            if spec.frame is not None and self.name.lower() in _FRAMELESS_WINDOW_FNS:
                # Presto accepts (and ignores) an explicit frame on the
                # rank family — these functions are defined over the whole
                # partition / by position, never the frame. Spark REJECTS
                # the spelling, so the shim drops the no-op frame (found
                # by the r06 window fuzzer: ntile/cume_dist + ROWS frame).
                import dataclasses as _dc

                spec = _dc.replace(spec, frame=None)
            head += f" over {spec.sql()}"
        elif self.window_name is not None:
            head += f" over {self.window_name}"
        return head


@dataclass
class Extract(Expr):
    unit: str
    operand: Expr

    def sql(self) -> str:
        u = self.unit.lower()
        x = self.operand.sql()
        if u in ("dow", "day_of_week"):
            # Presto: ISO day of week, Monday = 1 .. Sunday = 7; Spark's
            # extract/dayofweek is Sunday-based
            return f"((dayofweek({x}) + 5) % 7 + 1)"
        if u in ("doy", "day_of_year"):
            return f"dayofyear({x})"
        if u in ("week", "week_of_year"):
            return f"weekofyear({x})"
        if u in ("yow", "year_of_week"):
            # ISO week-numbering year = calendar year of the week's Thursday
            return (
                f"year(date_add({x}, "
                f"cast(4 - ((dayofweek({x}) + 5) % 7 + 1) as int)))"
            )
        if u in ("timezone_hour", "timezone_minute"):
            # session-zone offset components (registered compat functions)
            return f"{u}({x})"
        return f"extract({self.unit} from {x})"


@dataclass
class Exists(Expr):
    query: "Query"
    negated: bool = False

    def sql(self) -> str:
        neg = "not " if self.negated else ""
        return f"({neg}exists ({self.query.sql()}))"


@dataclass
class ScalarSubquery(Expr):
    query: "Query"

    def sql(self) -> str:
        return f"({self.query.sql()})"


# ---------------------------------------------------------------------------
# Relations
class Relation:
    def sql(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass
class Table(Relation):
    name: list[str]
    alias: str | None = None
    col_aliases: list[str] = field(default_factory=list)
    # time travel: FOR (TIMESTAMP|VERSION) (AS OF|BEFORE) expr — ref
    # TableVersionExpression (axiom/sql/presto/ast/AstFunctions.h:535,
    # grammar PrestoSql.g4:561-567). Resolved by PrestoSession against the
    # table's version log (sources/versions.py) BEFORE rendering; a spec
    # surviving to sql() means no session resolved it.
    version_kind: str | None = None  # "timestamp" | "version"
    version_before: bool = False  # BEFORE instead of AS OF
    version_expr: "Expr | None" = None

    def sql(self) -> str:
        if self.version_kind is not None:
            raise NotImplementedError(
                f"FOR {self.version_kind.upper()} "
                f"{'BEFORE' if self.version_before else 'AS OF'} requires a "
                "PrestoSession with a version log (register_table); plain "
                "transpile cannot resolve table history"
            )
        s = ".".join(self.name)
        if self.alias:
            s += f" as {self.alias}"
            if self.col_aliases:
                s += f"({', '.join(self.col_aliases)})"
        return s


@dataclass
class SubqueryRel(Relation):
    query: "Query"
    alias: str | None = None
    col_aliases: list[str] = field(default_factory=list)
    lateral: bool = False

    def sql(self) -> str:
        s = f"({self.query.sql()})"
        if self.lateral:
            s = f"lateral {s}"
        if self.alias:
            s += f" as {self.alias}"
            if self.col_aliases:
                s += f"({', '.join(self.col_aliases)})"
        return s


@dataclass
class ValuesRel(Relation):
    rows: list[list[Expr]]
    alias: str | None = None
    col_aliases: list[str] = field(default_factory=list)

    def sql(self) -> str:
        rows = ", ".join(
            f"({', '.join(e.sql() for e in row)})" for row in self.rows
        )
        s = f"(values {rows})"
        if self.alias:
            s += f" as {self.alias}"
            if self.col_aliases:
                s += f"({', '.join(self.col_aliases)})"
        return s


@dataclass
class Unnest(Relation):
    """UNNEST relation (AstRelations.h Unnest, withOrdinality).

    Rendered by the owning join/from-clause as a Spark LATERAL VIEW (see
    _render_from): Presto UNNEST is implicitly correlated with the relations
    to its left, which is exactly LATERAL VIEW's scoping.
    """

    exprs: list[Expr]
    ordinality: bool = False
    alias: str | None = None
    col_aliases: list[str] = field(default_factory=list)

    def lateral_view(self) -> str:
        alias = self.alias or "__u"
        cols = self.col_aliases
        if not cols:
            # Unaliased UNNEST (Presto allows it; default column names).
            # Single expression: omit AS — Spark's analyzer assigns the
            # type-aware defaults (col for arrays, key/value for maps),
            # matching Presto's anonymous-column behavior for SELECT *.
            # Multi-array / ordinality forms need concrete names for the
            # synthesized arrays_zip struct: col1..colN (+ ordinality).
            if len(self.exprs) == 1 and not self.ordinality:
                return f"lateral view explode({self.exprs[0].sql()}) {alias}"
            cols = [f"col{i + 1}" for i in range(len(self.exprs))]
            if self.ordinality:
                cols.append("ordinality")
        exprs = [e.sql() for e in self.exprs]
        if self.ordinality:
            # ordinality column is last; arrays_zip pads to the longest
            # array, and the 1-based index array has exactly that length
            if len(exprs) == 1:
                size = f"size({exprs[0]})"
            else:
                size = f"greatest({', '.join(f'size({e})' for e in exprs)})"
            zipped = ", ".join(exprs + [f"sequence(1, {size})"])
            if len(cols) != len(exprs) + 1:
                raise NotImplementedError(
                    f"UNNEST({len(exprs)} arrays) WITH ORDINALITY must name "
                    f"{len(exprs) + 1} output columns; got {len(cols)}"
                )
            return (
                f"lateral view inline(arrays_zip({zipped})) {alias} "
                f"as {', '.join(cols)}"
            )
        if len(exprs) > 1:
            if len(cols) != len(exprs):
                raise NotImplementedError(
                    f"UNNEST({len(exprs)} arrays) must name exactly "
                    f"{len(exprs)} output columns; got {len(cols)}"
                )
            return (
                f"lateral view inline(arrays_zip({', '.join(exprs)})) {alias} "
                f"as {', '.join(cols)}"
            )
        if len(cols) == 1:
            return f"lateral view explode({exprs[0]}) {alias} as {cols[0]}"
        if len(cols) == 2:
            # ambiguous at parse time: 2 output columns means a map →
            # explode(k, v). Arrays of 2-field rows (flattenArrayOfRows)
            # go through PlanBuilder.unnest, documented.
            return f"lateral view explode({exprs[0]}) {alias} as {cols[0]}, {cols[1]}"
        # 3+ columns: array-of-rows flattening
        return f"lateral view inline({exprs[0]}) {alias} as {', '.join(cols)}"

    def sql(self) -> str:
        """UNNEST as the sole FROM relation (Presto allows ``FROM
        UNNEST(...)`` with no left side): a derived table over a one-row
        dummy, projecting only the unnest output columns (star-safe).
        Unaliased forms project ``{alias}.*`` — only the LATERAL VIEW's
        generated columns, never the dummy."""
        alias = self.alias or "__u"
        proj = ", ".join(self.col_aliases) if self.col_aliases else f"{alias}.*"
        inner = f"select {proj} from (select 1) {self.lateral_view()}"
        return f"({inner}) {alias}"


@dataclass
class TableSample(Relation):
    relation: Relation
    method: str  # bernoulli | system
    percentage: Expr

    def sql(self) -> str:
        # Spark: TABLESAMPLE (p PERCENT) — BERNOULLI row-sampling semantics.
        return f"{self.relation.sql()} tablesample ({self.percentage.sql()} percent)"


@dataclass
class Join(Relation):
    kind: str  # inner|left|right|full|cross
    left: Relation
    right: Relation
    on: Expr | None = None
    using: list[str] = field(default_factory=list)
    # implicit equi-join on all same-named columns (ref NaturalJoin,
    # axiom/sql/presto/ast/AstRelations.h:477); Spark SQL supports the
    # form natively, so rendering keeps it declarative
    natural: bool = False

    def sql(self) -> str:
        if isinstance(self.right, Unnest):
            if self.kind not in ("cross", "inner", "left"):
                raise NotImplementedError(
                    f"{self.kind.upper()} JOIN UNNEST is not supported"
                )
            if self.kind == "left":
                raise NotImplementedError(
                    "LEFT JOIN UNNEST ... ON TRUE: use PlanBuilder.unnest"
                    "(empty behavior) — LATERAL VIEW OUTER differs on nulls"
                )
            return f"{self.left.sql()} {self.right.lateral_view()}"
        # SQL joins parse left-associatively: a nested join on the RIGHT
        # (bushy trees from the cost-based reorderer) must be parenthesized
        # or `a join b join c on e1 on e2` mis-parses
        left_sql = self.left.sql()
        if " lateral view " in left_sql and not left_sql.startswith("("):
            # Spark's grammar puts lateral views AFTER the join list: once
            # an UNNEST lowered to LATERAL VIEW, a following JOIN is a
            # parse error — wrap the unnest side in a derived table
            # (r08, found by the replay corpus's unnest_join_agg entry)
            left_sql = f"(select * from {left_sql}) __lvw"
        right = self.right.sql()
        if isinstance(self.right, Join):
            right = f"({right})"
        if self.kind == "cross":
            return f"{left_sql} cross join {right}"
        if self.natural:
            return f"{left_sql} natural {self.kind} join {right}"
        if self.using:
            return (
                f"{left_sql} {self.kind} join {right} "
                f"using ({', '.join(self.using)})"
            )
        on = f" on {self.on.sql()}" if self.on is not None else ""
        return f"{left_sql} {self.kind} join {right}{on}"


# ---------------------------------------------------------------------------
# Query structure
@dataclass
class SortItem:
    expr: Expr
    ascending: bool = True
    nulls: str | None = None  # 'first' | 'last'

    def sql(self) -> str:
        s = self.expr.sql()
        if not self.ascending:
            s += " desc"
        if self.nulls:
            s += f" nulls {self.nulls}"
        return s


@dataclass
class SelectItem:
    expr: Expr
    alias: str | None = None

    def sql(self) -> str:
        s = self.expr.sql()
        if self.alias:
            s += f" as {self.alias}"
        return s


@dataclass
class GroupBy:
    kind: str  # 'plain' | 'rollup' | 'cube' | 'sets'
    items: list[Expr] = field(default_factory=list)
    sets: list[list[Expr]] = field(default_factory=list)

    def sql(self) -> str:
        if self.kind == "plain":
            return ", ".join(e.sql() for e in self.items)
        if self.kind in ("rollup", "cube"):
            return f"{self.kind} ({', '.join(e.sql() for e in self.items)})"
        sets = ", ".join(
            f"({', '.join(e.sql() for e in s)})" for s in self.sets
        )
        return f"grouping sets ({sets})"


@dataclass
class Select:
    items: list[SelectItem]
    from_: Relation | None = None
    where: Expr | None = None
    group_by: GroupBy | None = None
    having: Expr | None = None
    distinct: bool = False
    windows: list[tuple[str, WindowSpec]] = field(default_factory=list)
    # optimizer-injected Spark hint (e.g. "broadcast(n, r)") — set by the
    # cost-based join reorderer (sql/reorder.py), never by the parser
    hint: str | None = None

    def sql(self) -> str:
        parts = ["select"]
        if self.hint:
            parts.append(f"/*+ {self.hint} */")
        if self.distinct:
            parts.append("distinct")
        parts.append(", ".join(i.sql() for i in self.items))
        if self.from_ is not None:
            parts.append(f"from {self.from_.sql()}")
        if self.where is not None:
            parts.append(f"where {self.where.sql()}")
        if self.group_by is not None:
            parts.append(f"group by {self.group_by.sql()}")
        if self.having is not None:
            parts.append(f"having {self.having.sql()}")
        if self.windows:
            # Presto WINDOW clause — Spark supports the same clause natively
            parts.append(
                "window "
                + ", ".join(f"{n} as {w.sql()}" for n, w in self.windows)
            )
        return " ".join(parts)


@dataclass
class SetOp:
    kind: str  # union|intersect|except
    all: bool
    left: "Select | SetOp | Query"
    right: "Select | SetOp | Query"

    def sql(self) -> str:
        q = "all" if self.all else "distinct"
        return f"{self.left.sql()} {self.kind} {q} {self.right.sql()}"


@dataclass
class CTE:
    name: str
    query: "Query"
    col_aliases: list[str] = field(default_factory=list)

    def sql(self) -> str:
        cols = f"({', '.join(self.col_aliases)})" if self.col_aliases else ""
        return f"{self.name}{cols} as ({self.query.sql()})"


@dataclass
class Query:
    body: Select | SetOp | "Query"
    ctes: list[CTE] = field(default_factory=list)
    order_by: list[SortItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None

    def sql(self) -> str:
        parts = []
        if self.ctes:
            parts.append("with " + ", ".join(c.sql() for c in self.ctes))
        body = self.body.sql()
        if isinstance(self.body, Query):  # parenthesized query term
            body = f"({body})"
        parts.append(body)
        if self.order_by:
            parts.append("order by " + ", ".join(s.sql() for s in self.order_by))
        if self.limit is not None:
            parts.append(f"limit {self.limit}")
        if self.offset is not None:
            # Spark accepts LIMIT ... OFFSET ... ordering
            parts.append(f"offset {self.offset}")
        return " ".join(parts)


@dataclass
class ExplainStmt:
    """EXPLAIN [ANALYZE] [VERBOSE] [(TYPE .., FORMAT ..)] query — reference
    AstStatements.h:597-635 (ExplainOption: TYPE LOGICAL/DISTRIBUTED/
    VALIDATE/IO, FORMAT TEXT/JSON/GRAPHVIZ); ANALYZE executes the query and
    reports the final (AQE-resolved) physical plan; VERBOSE widens the
    default rendering to Spark's extended explain (all plan phases)."""

    query: Query
    analyze: bool = False
    type_: str | None = None  # logical | distributed | validate | io
    format: str | None = None  # text | json | graphviz
    verbose: bool = False

    def sql(self) -> str:
        return self.query.sql()


@dataclass
class InsertStmt:
    """INSERT INTO t [(cols)] <query|VALUES ...> — reference WriteKind
    kInsert (axiom/connectors/ConnectorMetadata.h:457-627); AST surface
    axiom/sql/presto/ast/AstStatements.h."""

    table: str
    query: Query
    columns: list[str] = field(default_factory=list)

    def sql(self) -> str:
        cols = f" ({', '.join(self.columns)})" if self.columns else ""
        return f"insert into {self.table}{cols} {self.query.sql()}"


@dataclass
class DeleteStmt:
    """DELETE FROM t [WHERE p] — reference WriteKind kDelete."""

    table: str
    where: Expr | None = None

    def sql(self) -> str:
        w = f" where {self.where.sql()}" if self.where is not None else ""
        return f"delete from {self.table}{w}"


@dataclass
class UpdateStmt:
    """UPDATE t SET c = e, ... [WHERE p] — reference WriteKind kUpdate."""

    table: str
    assignments: list[tuple[str, Expr]] = field(default_factory=list)
    where: Expr | None = None

    def sql(self) -> str:
        sets = ", ".join(f"{c} = {e.sql()}" for c, e in self.assignments)
        w = f" where {self.where.sql()}" if self.where is not None else ""
        return f"update {self.table} set {sets}{w}"


@dataclass
class DescribeStmt:
    """DESCRIBE t / DESC t / SHOW COLUMNS FROM t — the reference lowers
    these to a Values relation of column metadata (PrestoParserTest.cpp
    `describe`); PrestoSession produces the Presto-shaped output."""

    table: str

    def sql(self) -> str:
        return f"describe {self.table}"


@dataclass
class CreateTableStmt:
    """CREATE TABLE [IF NOT EXISTS] t (col type, ...) — reference
    AstStatements.h:44 CreateTable; executed as an empty parquet directory
    registered as a writable table (WriteKind kCreate)."""

    table: str
    columns: list[tuple[str, str]] = field(default_factory=list)
    if_not_exists: bool = False

    def sql(self) -> str:
        ine = "if not exists " if self.if_not_exists else ""
        cols = ", ".join(f"{n} {t}" for n, t in self.columns)
        return f"create table {ine}{self.table} ({cols})"


@dataclass
class CreateTableAsStmt:
    """CREATE TABLE [IF NOT EXISTS] t AS query [WITH [NO] DATA] —
    reference AstStatements.h:90 CreateTableAsSelect."""

    table: str
    query: Query
    if_not_exists: bool = False
    with_data: bool = True

    def sql(self) -> str:
        ine = "if not exists " if self.if_not_exists else ""
        tail = "" if self.with_data else " with no data"
        return f"create table {ine}{self.table} as {self.query.sql()}{tail}"


@dataclass
class DropTableStmt:
    """DROP TABLE [IF EXISTS] t — reference AstStatements.h:374."""

    table: str
    if_exists: bool = False

    def sql(self) -> str:
        ie = "if exists " if self.if_exists else ""
        return f"drop table {ie}{self.table}"


@dataclass
class CreateViewStmt:
    """CREATE [OR REPLACE] VIEW v AS query — reference
    AstStatements.h:143 CreateView; executed as a Spark temp view over the
    optimized query."""

    name: str
    query: Query
    or_replace: bool = False

    def sql(self) -> str:
        orr = "or replace " if self.or_replace else ""
        return f"create {orr}view {self.name} as {self.query.sql()}"


@dataclass
class DropViewStmt:
    """DROP VIEW [IF EXISTS] v — reference AstStatements.h:399."""

    name: str
    if_exists: bool = False

    def sql(self) -> str:
        ie = "if exists " if self.if_exists else ""
        return f"drop view {ie}{self.name}"


@dataclass
class ShowTablesStmt:
    """SHOW TABLES — catalog + writable + view names as a Values relation
    (same lowering as DESCRIBE)."""

    def sql(self) -> str:
        return "show tables"


@dataclass
class StartTransactionStmt:
    """START TRANSACTION / BEGIN — reference AstStatements.h:687."""

    def sql(self) -> str:
        return "start transaction"


@dataclass
class CommitStmt:
    """COMMIT [WORK] — reference AstStatements.h:706."""

    def sql(self) -> str:
        return "commit"


@dataclass
class RollbackStmt:
    """ROLLBACK [WORK] — reference AstStatements.h:713."""

    def sql(self) -> str:
        return "rollback"


@dataclass
class AnalyzeStmt:
    """ANALYZE t — reference AstStatements.h:636: one aggregation pass
    computing table row count + per-column NDV/null stats, recorded into
    the planner's execution history (VeloxHistory analog) under the same
    scan signature the join reorderer consults."""

    table: str

    def sql(self) -> str:
        return f"analyze {self.table}"


@dataclass
class CreateSchemaStmt:
    """CREATE SCHEMA [IF NOT EXISTS] s — reference AstStatements.h:237
    CreateSchema; executed as a namespace in the writable scratch: tables
    created as ``s.t`` resolve schema-qualified in later statements."""

    name: str
    if_not_exists: bool = False

    def sql(self) -> str:
        ine = "if not exists " if self.if_not_exists else ""
        return f"create schema {ine}{self.name}"


@dataclass
class DropSchemaStmt:
    """DROP SCHEMA [IF EXISTS] s [CASCADE|RESTRICT] — reference
    AstStatements.h:449 DropSchema. RESTRICT (the default) refuses when
    the schema still holds tables; CASCADE drops them."""

    name: str
    if_exists: bool = False
    cascade: bool = False

    def sql(self) -> str:
        ie = "if exists " if self.if_exists else ""
        tail = " cascade" if self.cascade else ""
        return f"drop schema {ie}{self.name}{tail}"


@dataclass
class ShowSchemasStmt:
    """SHOW SCHEMAS — schema names as a Values relation."""

    def sql(self) -> str:
        return "show schemas"


@dataclass
class CreateMViewStmt:
    """CREATE [OR REPLACE] MATERIALIZED VIEW m AS query — reference
    AstStatements.h:191 CreateMaterializedView; executed as CTAS into the
    scratch dir with the defining query retained for REFRESH."""

    name: str
    query: Query
    or_replace: bool = False

    def sql(self) -> str:
        orr = "or replace " if self.or_replace else ""
        return f"create {orr}materialized view {self.name} as {self.query.sql()}"


@dataclass
class RefreshMViewStmt:
    """REFRESH MATERIALIZED VIEW m — Presto statement surface companion to
    CreateMaterializedView (AstStatements.h:191; the reference AST stops at
    creation/drop — refresh re-runs the stored defining query and swaps
    the materialization)."""

    name: str

    def sql(self) -> str:
        return f"refresh materialized view {self.name}"


@dataclass
class DropMViewStmt:
    """DROP MATERIALIZED VIEW [IF EXISTS] m — reference
    AstStatements.h:424."""

    name: str
    if_exists: bool = False

    def sql(self) -> str:
        ie = "if exists " if self.if_exists else ""
        return f"drop materialized view {ie}{self.name}"


@dataclass
class CreateFunctionStmt:
    """CREATE [OR REPLACE] FUNCTION f(p type, ...) RETURNS type RETURN expr
    — reference AstStatements.h:269 CreateFunction (SqlParameterDeclaration
    + RoutineBody). Executed as a Catalyst-inlined SQL UDF (Spark CREATE
    TEMPORARY FUNCTION ... RETURN), so the body participates in codegen —
    the same inlining treatment as the compat shims. Characteristics
    (LANGUAGE SQL, [NOT] DETERMINISTIC, null-call behavior) are parsed;
    only SQL-language deterministic bodies are executable."""

    name: str
    parameters: list[tuple[str, str]]  # (name, presto type)
    return_type: str
    body: Expr
    or_replace: bool = False
    deterministic: bool = True

    def sql(self) -> str:
        orr = "or replace " if self.or_replace else ""
        ps = ", ".join(f"{n} {t}" for n, t in self.parameters)
        return (
            f"create {orr}function {self.name}({ps}) "
            f"returns {self.return_type} return {self.body.sql()}"
        )


@dataclass
class DropFunctionStmt:
    """DROP FUNCTION [IF EXISTS] f — statement-surface companion to
    CreateFunction (AstStatements.h:269)."""

    name: str
    if_exists: bool = False

    def sql(self) -> str:
        ie = "if exists " if self.if_exists else ""
        return f"drop function {ie}{self.name}"


@dataclass
class CreateTypeStmt:
    """CREATE TYPE name AS type | AS (field type, ...) — reference
    AstStatements.h:348 CreateType / PrestoSql.g4:80. The alias form
    registers a session type alias resolvable anywhere a type is spelled
    (CAST, column definitions); the struct form registers a ROW type the
    same way."""

    name: str
    definition: str | None = None  # alias form: underlying presto type text
    fields: list[tuple[str, str]] | None = None  # struct form

    def sql(self) -> str:
        if self.fields is not None:
            fs = ", ".join(f"{n} {t}" for n, t in self.fields)
            return f"create type {self.name} as ({fs})"
        return f"create type {self.name} as {self.definition}"


@dataclass
class CreateRoleStmt:
    """CREATE ROLE name [WITH ADMIN grantor] — reference
    AstStatements.h:323 CreateRole / PrestoSql.g4:102. Session-scoped
    registry (no distributed ACL enforcement — Spark has no row-level
    principal model; the reference likewise only parses these,
    optimizer/tests/SqlStatement.h:23-79)."""

    name: str
    admin: str | None = None

    def sql(self) -> str:
        wa = f" with admin {self.admin}" if self.admin else ""
        return f"create role {self.name}{wa}"


@dataclass
class DropRoleStmt:
    """DROP ROLE name — PrestoSql.g4:104 dropRole."""

    name: str

    def sql(self) -> str:
        return f"drop role {self.name}"


@dataclass
class ShowRolesStmt:
    """SHOW [CURRENT] ROLES — PrestoSql.g4:141 showRoles."""

    current: bool = False

    def sql(self) -> str:
        return "show current roles" if self.current else "show roles"


@dataclass
class CallStmt:
    """CALL procedure(arg, ..., name => arg) — reference
    AstStatements.h:661 Call + CallArgument (positional | named,
    PrestoSql.g4:548). Dispatched against the session's procedure
    registry; arguments are constant-folded expressions."""

    name: str
    args: list[tuple[str | None, Expr]] = field(default_factory=list)

    def sql(self) -> str:
        rendered = ", ".join(
            (f"{n} => {e.sql()}" if n else e.sql()) for n, e in self.args
        )
        return f"call {self.name}({rendered})"
