"""Function metadata registry — determinism, cost, reversibility, subfield
behavior per function.

Reference: axiom/optimizer/FunctionRegistry.h:111-295 (FunctionMetadata with
per-row cost, lambda/subfield propagation info, reversible-function map;
registerPrestoFunctions seeds transform/transform_values/zip/row_constructor
metadata and the reversible comparisons eq/lt/gt/lte/gte/plus/multiply/
and/or).

Consumers in this repo:
- ``canonicalize`` rewrites literal-first comparisons through the reversible
  map (``5 > x`` → ``x < 5``) and orders commutative operands, so equivalent
  predicates produce the SAME Spark Column and therefore the same
  history/plan signature (optimizer/history.plan_signature cache hits);
- ``is_deterministic`` guards caching layers from remembering the output of
  nondeterministic expressions;
- ``expr_cost`` exposes the per-row cost model for expression ordering.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FunctionMetadata:
    """Per-function planning metadata (FunctionRegistry.h:111-178 analog)."""

    deterministic: bool = True
    cost: float = 1.0  # relative per-row cost units (Cost.h:95-123 family)
    commutative: bool = False  # f(x, y) == f(y, x)
    reverse: str | None = None  # r with f(x, y) == r(y, x)
    # result-subfield → argument-subfield propagation (subfieldArg analog)
    subfield_arg: int | None = None
    is_array_constructor: bool = False
    is_map_constructor: bool = False
    lambda_ordinals: tuple[int, ...] = ()


def _m(**kw) -> FunctionMetadata:
    return FunctionMetadata(**kw)


# registerPrestoFunctions analog: reversible comparisons + arithmetic,
# lambda/subfield metadata for the HOFs the optimizer reasons about, cost
# tiers for expensive scalar families.
_REGISTRY: dict[str, FunctionMetadata] = {
    # reversible pairs: name(x, y) == reverse(y, x)
    "eq": _m(commutative=True, reverse="eq"),
    "neq": _m(commutative=True, reverse="neq"),
    "lt": _m(reverse="gt"),
    "gt": _m(reverse="lt"),
    "lte": _m(reverse="gte"),
    "gte": _m(reverse="lte"),
    "plus": _m(commutative=True, reverse="plus"),
    "multiply": _m(commutative=True, reverse="multiply"),
    "and": _m(commutative=True, reverse="and"),
    "or": _m(commutative=True, reverse="or"),
    # HOF / constructor subfield behavior (FunctionRegistry.h:130-152)
    "transform": _m(subfield_arg=0, lambda_ordinals=(1,), cost=4),
    "transform_values": _m(subfield_arg=0, lambda_ordinals=(1,), cost=4),
    "filter": _m(subfield_arg=0, lambda_ordinals=(1,), cost=4),
    "zip_with": _m(lambda_ordinals=(2,), cost=4),
    "reduce": _m(lambda_ordinals=(2, 3), cost=4),
    "aggregate": _m(lambda_ordinals=(2, 3), cost=4),
    "array_constructor": _m(is_array_constructor=True),
    "map": _m(is_map_constructor=True),
    "row_constructor": _m(),
    # nondeterministic
    "rand": _m(deterministic=False),
    "random": _m(deterministic=False),
    "uuid": _m(deterministic=False),
    "shuffle": _m(deterministic=False),
    "now": _m(deterministic=False),
    "current_timestamp": _m(deterministic=False),
    "current_date": _m(deterministic=False),
    "monotonically_increasing_id": _m(deterministic=False),
    # cost tiers for expensive families (Cost.h constants family)
    "md5": _m(cost=8),
    "sha256": _m(cost=8),
    "xxhash64": _m(cost=4),
    "regexp_like": _m(cost=20),
    "regexp_extract": _m(cost=20),
    "regexp_replace": _m(cost=25),
    "like": _m(cost=6),
    "json_parse": _m(cost=12),
    "json_extract_scalar": _m(cost=12),
    "get_json_object": _m(cost=12),
    "split": _m(cost=6),
}


def function_metadata(name: str) -> FunctionMetadata | None:
    """Metadata for ``name`` or None if unregistered (nullptr analog)."""
    return _REGISTRY.get(name.lower())


def register_function(name: str, metadata: FunctionMetadata) -> bool:
    """Register if absent; returns False when already present (same contract
    as FunctionRegistry::registerFunction)."""
    key = name.lower()
    if key in _REGISTRY:
        return False
    _REGISTRY[key] = metadata
    return True


def reversible_functions() -> dict[str, str]:
    return {n: m.reverse for n, m in _REGISTRY.items() if m.reverse is not None}


# -- Expr-tree consumers ------------------------------------------------------

def _expr_children(expr):
    from verax_spark.plans.expr import Expr

    for v in vars(expr).values():
        if isinstance(v, Expr):
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                if isinstance(item, Expr):
                    yield item


def is_deterministic(expr) -> bool:
    """True unless any Call in the tree is registered nondeterministic."""
    from verax_spark.plans.expr import Call

    if isinstance(expr, Call):
        meta = function_metadata(expr.fn)
        if meta is not None and not meta.deterministic:
            return False
    return all(is_deterministic(c) for c in _expr_children(expr))


def expr_cost(expr) -> float:
    """Per-row cost of the tree (unknown functions cost 1)."""
    from verax_spark.plans.expr import Call

    own = 0.0
    if isinstance(expr, Call):
        meta = function_metadata(expr.fn)
        own = meta.cost if meta is not None else 1.0
    return own + sum(expr_cost(c) for c in _expr_children(expr))


def canonicalize(expr):
    """Normalize through the reversible map: binary calls with a literal
    left and non-literal right are flipped (``5 > x`` → ``x < 5``), so
    equivalent spellings build identical Spark Columns → identical plan
    signatures for the history cache."""
    from verax_spark.plans.expr import Call, Lit

    for child in _expr_children(expr):
        canonicalize(child)
    if isinstance(expr, Call) and len(expr.args) == 2:
        meta = function_metadata(expr.fn)
        if (
            meta is not None
            and meta.reverse is not None
            and isinstance(expr.args[0], Lit)
            and not isinstance(expr.args[1], Lit)
        ):
            expr.fn = meta.reverse
            expr.args = [expr.args[1], expr.args[0]]
    return expr
