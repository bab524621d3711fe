"""Typed expression DSL mirroring the reference's ExprApi.

Reference: axiom/logical_plan/ExprApi.h:101-346 — combinators Col / Lit /
Call / Cast / Lambda / Subquery / Exists / Sql with overloaded operators,
compiled by the plan builder into its expression IR. Here each Expr compiles
to a PySpark Column (`to_spark()`); Presto-dialect function names resolve
through verax_spark.functions.presto.

Expression kinds covered (axiom/logical_plan/Expr.h):
InputReferenceExpr → Col, ConstantExpr → Lit, CallExpr → Call,
SpecialFormExpr → operators / Cast / TryCast / coalesce / if_ / switch,
LambdaExpr → Lambda, SubqueryExpr → Subquery, AggregateExpr → Agg.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column

from verax_spark.functions.presto import presto_call


def _wrap(v: Any) -> "Expr":
    if isinstance(v, Expr):
        return v
    return Lit(v)


class Expr:
    """Base expression; operator overloads mirror ExprApi.h:262-346."""

    name: str | None = None

    def to_spark(self) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    # naming (ExprApi `as`)
    def alias(self, name: str) -> "Expr":
        return Alias(self, name)

    as_ = alias

    # arithmetic
    def __add__(self, o):
        return Call("plus", self, _wrap(o))

    def __radd__(self, o):
        return Call("plus", _wrap(o), self)

    def __sub__(self, o):
        return Call("minus", self, _wrap(o))

    def __rsub__(self, o):
        return Call("minus", _wrap(o), self)

    def __mul__(self, o):
        return Call("multiply", self, _wrap(o))

    def __rmul__(self, o):
        return Call("multiply", _wrap(o), self)

    def __truediv__(self, o):
        return Call("divide", self, _wrap(o))

    def __mod__(self, o):
        return Call("mod", self, _wrap(o))

    # comparisons
    def __eq__(self, o):  # type: ignore[override]
        return Call("eq", self, _wrap(o))

    def __ne__(self, o):  # type: ignore[override]
        return Call("neq", self, _wrap(o))

    def __lt__(self, o):
        return Call("lt", self, _wrap(o))

    def __le__(self, o):
        return Call("lte", self, _wrap(o))

    def __gt__(self, o):
        return Call("gt", self, _wrap(o))

    def __ge__(self, o):
        return Call("gte", self, _wrap(o))

    # boolean special forms (3-valued AND/OR, Expr.h:214-240)
    def __and__(self, o):
        return Call("and", self, _wrap(o))

    def __or__(self, o):
        return Call("or", self, _wrap(o))

    def __invert__(self):
        return Call("not", self)

    # misc special forms
    def is_null(self):
        return Call("is_null", self)

    def is_not_null(self):
        return Call("not", Call("is_null", self))

    def in_(self, *values):
        return InList(self, [_wrap(v) for v in values])

    def between(self, lo, hi):
        return Call("between", self, _wrap(lo), _wrap(hi))

    def like(self, pattern: str):
        return Call("like", self, Lit(pattern))

    def cast(self, t: str):
        return Cast(self, t)

    def try_cast(self, t: str):
        return TryCast(self, t)

    def __getitem__(self, item):
        """Subscript (array index / map key) — Presto element_at."""
        return Call("element_at", self, _wrap(item))

    def field(self, name: str):
        """DEREFERENCE special form (Expr.h:258-265)."""
        return Dereference(self, name)

    def __hash__(self):
        return id(self)


@dataclass(eq=False)
class Alias(Expr):
    child: Expr
    name_: str

    @property
    def name(self):  # type: ignore[override]
        return self.name_

    def to_spark(self) -> Column:
        return self.child.to_spark().alias(self.name_)


@dataclass(eq=False)
class Col(Expr):
    """InputReferenceExpr (Expr.h:127-150)."""

    name_: str

    @property
    def name(self):  # type: ignore[override]
        return self.name_

    def to_spark(self) -> Column:
        return F.col(self.name_)


@dataclass(eq=False)
class Lit(Expr):
    """ConstantExpr (Expr.h:152-181)."""

    value: Any
    type_: str | None = None

    def to_spark(self) -> Column:
        c = F.lit(self.value)
        return c.cast(self.type_) if self.type_ else c


# Special forms with native Spark counterparts (Expr.h:212-378)
_SPECIAL: dict[str, Callable[..., Column]] = {
    "plus": lambda a, b: a + b,
    "minus": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "negate": lambda a: -a,
    "eq": lambda a, b: a == b,
    "neq": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "not": lambda a: ~a,
    "is_null": lambda a: a.isNull(),
    "between": lambda a, lo, hi: a.between(lo, hi),
    "like": lambda a, p: a.like(p),
    "coalesce": F.coalesce,
    "if": lambda c, t, f=None: F.when(c, t).otherwise(f),
    "nullif": F.nullif,
    "try": lambda a: a,  # TRY over non-throwing exprs; throwing fns use try_ variants
}

# (fn → arg positions) whose adapter requires the raw literal value rather
# than a Column — the Column form loses the literal and the adapter would
# have to reject it.
_LITERAL_ARGS: dict[str, tuple[int, ...]] = {
    "split": (1,),
    "date_format": (1,),
    "date_parse": (1,),
    "to_base": (1,),
    "from_base": (1,),
    "ngrams": (1,),
    "json_array_get": (1,),
}


@dataclass(eq=False)
class Call(Expr):
    """CallExpr (Expr.h:183-210): function call by (Presto) name."""

    fn: str
    args: Sequence[Expr] = ()

    def __init__(self, fn: str, *args: Expr):
        self.fn = fn
        self.args = [_wrap(a) for a in args]

    def to_spark(self) -> Column:
        key = self.fn.lower()
        if any(isinstance(a, Lambda) for a in self.args):
            # higher-order functions take python-callable lambdas, not Columns
            hofs = {
                "transform": F.transform,
                "filter": F.filter,
                "reduce": F.aggregate,
                "aggregate": F.aggregate,
                "zip_with": F.zip_with,
                "transform_values": F.transform_values,
                "transform_keys": F.transform_keys,
                "map_filter": F.map_filter,
            }
            if key not in hofs:
                raise ValueError(f"{key!r} does not accept lambda arguments")
            return hofs[key](*[a.to_spark() for a in self.args])
        sargs = [a.to_spark() for a in self.args]
        if key in _SPECIAL:
            return _SPECIAL[key](*sargs)
        # adapters that need a *literal* python value (split's delimiter is a
        # literal-not-regex; date_format's pattern needs %-to-Java rewriting)
        for idx in _LITERAL_ARGS.get(key, ()):
            if idx < len(self.args) and isinstance(self.args[idx], Lit):
                sargs[idx] = self.args[idx].value
        return presto_call(key, *sargs)


@dataclass(eq=False)
class Cast(Expr):
    child: Expr
    type_: str

    def to_spark(self) -> Column:
        return self.child.to_spark().cast(self.type_)


@dataclass(eq=False)
class TryCast(Expr):
    """TRY_CAST → NULL on failure (Expr.h:241-249)."""

    child: Expr
    type_: str

    def to_spark(self) -> Column:
        return self.child.to_spark().try_cast(self.type_)


@dataclass(eq=False)
class Dereference(Expr):
    child: Expr
    field_: str

    def to_spark(self) -> Column:
        return self.child.to_spark().getField(self.field_)


@dataclass(eq=False)
class InList(Expr):
    """IN with a literal list (Expr.h:322-340). IN-subquery goes through
    PlanBuilder.filter_in (semi join), as in the reference optimizer."""

    needle: Expr
    values: Sequence[Expr]

    def to_spark(self) -> Column:
        return self.needle.to_spark().isin(
            *[v.value if isinstance(v, Lit) else v.to_spark() for v in self.values]
        )


@dataclass(eq=False)
class Lambda(Expr):
    """LambdaExpr (Expr.h:614-655) for higher-order functions. Body is a
    python callable over Expr args; arity fixed by `params`."""

    params: Sequence[str]
    body: Callable[..., Expr]

    def to_spark(self):
        n = len(self.params)
        if n == 1:
            return lambda x: _wrap(self.body(_SparkColExpr(x))).to_spark()
        if n == 2:
            return lambda x, y: _wrap(
                self.body(_SparkColExpr(x), _SparkColExpr(y))
            ).to_spark()
        raise ValueError("lambdas support 1-2 parameters")


@dataclass(eq=False)
class _SparkColExpr(Expr):
    """Adapter wrapping an already-built Spark Column as an Expr."""

    col: Column

    def to_spark(self) -> Column:
        return self.col


@dataclass(eq=False)
class Sql(Expr):
    """SQL-snippet expression (ExprApi.h Sql / PlanBuilder.h:426 — the
    reference parses snippets with Velox's expression parser; we hand them
    to Spark SQL's, which accepts the same ANSI core)."""

    text: str

    def to_spark(self) -> Column:
        return F.expr(self.text)


@dataclass(eq=False)
class Subquery(Expr):
    """Scalar subquery (Expr.h:657-677): 1 row × 1 col. Compiled by
    PlanBuilder into a broadcast single-row cross join — the same lowering
    the reference optimizer performs (Optimization.cpp:1280)."""

    builder: Any  # PlanBuilder

    def to_spark(self) -> Column:
        raise NotImplementedError(
            "scalar subqueries are lowered by PlanBuilder.with_scalar_subquery"
        )


@dataclass(eq=False)
class Exists(Expr):
    """EXISTS(subquery) — lowered to a semi/anti join by PlanBuilder
    (ToGraph.cpp:1478 translateSetJoin analog)."""

    builder: Any
    condition: Expr | None = None

    def to_spark(self) -> Column:
        raise NotImplementedError("EXISTS is lowered by PlanBuilder.filter_exists")


# Aggregate expression wrapper (AggregateExpr, Expr.h:453-524)
@dataclass(eq=False)
class Agg(Expr):
    fn: str
    args: Sequence[Expr] = field(default_factory=list)
    filter_: Expr | None = None
    distinct: bool = False
    order_by: Sequence[Expr] = field(default_factory=list)

    def __init__(self, fn, *args, filter=None, distinct=False, order_by=()):
        self.fn = fn
        self.args = [_wrap(a) for a in args]
        self.filter_ = filter
        self.distinct = distinct
        self.order_by = list(order_by)

    def to_spark(self) -> Column:
        from verax_spark.functions.presto import PRESTO_TO_SPARK

        args = [a.to_spark() for a in self.args]
        if self.filter_ is not None:
            # per-agg FILTER: agg(CASE WHEN p THEN x END)
            cond = self.filter_.to_spark()
            args = [F.when(cond, a) for a in args]
        fn = PRESTO_TO_SPARK.get(self.fn.lower(), self.fn.lower())
        if self.order_by and fn in ("collect_list", "collect_set"):
            # ordered array_agg → sort_array(collect_list(...)) (SURVEY §2.1)
            return F.sort_array(F.call_function(fn, *args))
        if self.distinct:
            if fn == "count":
                return F.countDistinct(*args)
            if fn == "sum":
                return F.sum_distinct(*args)
            if fn == "avg":
                return F.expr(f"avg(DISTINCT {args[0]._jc.toString()})")
        if fn == "count" and not args:
            if self.filter_ is not None:
                # count(*) FILTER (WHERE p) → count the rows where p holds
                return F.count(F.when(self.filter_.to_spark(), F.lit(1)))
            return F.count(F.lit(1))
        from verax_spark.functions.presto import _ADAPTERS

        if self.fn.lower() in _ADAPTERS and not self.distinct:
            # signature adapters (e.g. map_agg) — FILTER already applied above
            return _ADAPTERS[self.fn.lower()](*args)
        return F.call_function(fn, *args)
