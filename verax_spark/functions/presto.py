"""Presto-dialect scalar/aggregate function surface on Spark.

The reference registers the whole Velox/Presto function library by name
(axiom/optimizer/tests/AxiomSql.cpp:149 registerAllScalarFunctions;
metadata registry axiom/optimizer/FunctionRegistry.h:111-295). Spark's
built-in library covers the same ground under different names — this module
is the dialect shim: Presto name → Spark implementation.

Three tiers:
1. identical name → `F.call_function` passthrough (most functions);
2. renamed → PRESTO_TO_SPARK name map;
3. different signature/arg-order → explicit adapter in _ADAPTERS.

Everything stays a Column expression (JVM-side); unmapped names raise with
the candidate Spark name so gaps surface loudly in tests, not silently at
plan time.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tier 2: pure renames (Presto name → Spark function name).
PRESTO_TO_SPARK: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile": "percentile_approx",
    "arbitrary": "any_value",
    "array_agg": "collect_list",
    "set_agg": "collect_set",
    "cardinality": "size",
    "codepoint": "ascii",
    "strpos": "instr",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "regexp_like": "rlike",
    "json_extract_scalar": "get_json_object",
    "format_datetime": "date_format",
    "day_of_week": "dayofweek",
    "day_of_month": "dayofmonth",
    "day_of_year": "dayofyear",
    "week_of_year": "weekofyear",
    "to_unixtime": "unix_timestamp",
    "from_iso8601_timestamp": "to_timestamp",
    "from_iso8601_date": "to_date",
    "bool_and": "every",
    "bool_or": "any",
    "count_if": "count_if",
    # Presto GROUPING(a, b, ...) is the bitmask form = Spark grouping_id
    # (identical for the 1-arg case too)
    "grouping": "grouping_id",
    "is_nan": "isnan",
    "power": "pow",
    "ln": "log",
    "ceiling": "ceil",
    "truncate": "trunc",
    "bitwise_and": "bit_and",
    "bitwise_or": "bit_or",
    "bitwise_xor": "bit_xor",
    "reduce": "aggregate",
    "zip": "arrays_zip",
    "flatten": "flatten",
    "array_sort": "array_sort",
    "array_distinct": "array_distinct",
    "arrays_overlap": "arrays_overlap",
    "map_concat": "map_concat",
    "map_from_entries": "map_from_entries",
    "json_parse": "from_json",
    "md5": "md5",
    "sha256": "sha2",
    "infinity": "double",  # handled in adapter
    "rand": "rand",
    "array_to_string": "array_join",
}

# Tier 3: signature adapters (arg order / semantics differ).
_ADAPTERS: dict[str, Callable[..., Column]] = {
    # presto date_add(unit, n, ts) → spark timestampadd(unit, n, ts)
    "date_add": lambda unit, n, ts: F.expr(
        f"timestampadd({_unit(unit)}, {_sql(n)}, {_sql(ts)})"
    ),
    # presto date_diff(unit, ts1, ts2) → spark timestampdiff
    "date_diff": lambda unit, a, b: F.expr(
        f"timestampdiff({_unit(unit)}, {_sql(a)}, {_sql(b)})"
    ),
    "date_trunc": lambda unit, ts: F.date_trunc(_unit(unit), ts),
    # presto substr is 1-based like spark substring
    "substr": lambda s, pos, length=None: (
        F.substring(s, pos, length) if length is not None else F.expr(
            f"substring({_sql(s)}, {_sql(pos)})"
        )
    ),
    # presto element_at returns NULL out of range (spark throws under ANSI;
    # try_element_at matches presto)
    "element_at": lambda col, k: F.try_element_at(col, F.lit(k) if not isinstance(k, Column) else k),
    "concat_ws": F.concat_ws,
    "infinity": lambda: F.lit(float("inf")),
    "nan": lambda: F.lit(float("nan")),
    "from_unixtime": lambda c: F.timestamp_seconds(c),
    # presto slice(arr, start, length)
    "slice": lambda arr, start, length: F.slice(arr, start, length),
    # presto array_union dedups
    "array_union": lambda a, b: F.array_distinct(F.concat(a, b)),
    "contains": F.array_contains,
    "map": F.map_from_arrays,
    "split_part": F.split_part,
    "min_by": F.min_by,
    "max_by": F.max_by,
}


def _unit(u) -> str:
    if isinstance(u, Column):
        raise ValueError("date unit must be a literal string")
    return str(u).strip("'\"")


def _sql(x) -> str:
    """Render an argument into SQL text for expr-based adapters."""
    if isinstance(x, Column):
        # Column's underlying expression in SQL form
        return x._jc.toString() if hasattr(x, "_jc") else str(x)
    if isinstance(x, str):
        return x
    return repr(x)


def presto_call(name: str, *args) -> Column:
    """Call a Presto-dialect function on Spark columns."""
    key = name.lower()
    if key in _ADAPTERS:
        return _ADAPTERS[key](*args)
    target = PRESTO_TO_SPARK.get(key, key)
    cols = [a if isinstance(a, Column) else F.lit(a) for a in args]
    # call_function resolves lazily (analysis time); check the registry now
    # so a bad name fails at the call site with an actionable message
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is not None and not spark.catalog.functionExists(target):
        raise ValueError(
            f"Presto function {name!r} has no Spark mapping "
            f"(tried {target!r}); add it to verax_spark.functions.presto"
        )
    return F.call_function(target, *cols)
