"""Presto-dialect SQL front door.

The reference parses Presto SQL with a generated ANTLR parser into its
logical plan (axiom/sql/presto/, ~31k generated lines; driver
axiom/optimizer/tests/PrestoParser.cpp:1159), supporting SELECT and EXPLAIN
statements only (axiom/optimizer/tests/SqlStatement.h:23-79).

Spark's ANSI SQL parser already accepts the Presto SELECT core (joins, CTEs,
correlated/scalar/IN/EXISTS subqueries, grouping sets, window frames, FILTER
clauses, VALUES). What differs is lexical dialect: typed literals, function
names, UNNEST spelling. This module is that dialect layer — a token-aware
transpiler in front of spark.sql() — which is the Spark-idiomatic equivalent
of shipping a second parser: Catalyst's analyzer does name resolution, type
inference and coercions exactly where ExprResolver does in the reference
(axiom/logical_plan/PlanBuilder.h:32-98).

Supported rewrites:
- typed literals: ``double '1.5'`` → ``cast('1.5' as double)`` (ditto real/
  bigint/integer/smallint/tinyint/decimal/varchar); date/timestamp/interval
  literals pass through (Spark shares the syntax). Applied string-aware: a
  type keyword inside a string literal is never rewritten.
- Presto→Spark function renames (verax_spark.functions.presto map); functions
  whose lowering is not a 1:1 rename (truncate, sha256, json_parse,
  infinity, nan) are registered as Catalyst-inlined SQL UDFs instead
  (functions.presto.register_sql_compat), so their Presto spelling parses
  as-is.
- ``cross join unnest(expr) as t(x)`` → ``lateral view explode(expr) t as x``;
  ``unnest(m) as t(k, v)`` (map) → ``lateral view explode(m) t as k, v``;
  ``unnest(a, b) as t(x, y)`` (multi-array zip) →
  ``lateral view inline(arrays_zip(a, b)) t as x, y``;
  ``unnest(a) with ordinality as t(x, ord)`` →
  ``lateral view inline(arrays_zip(a, sequence(1, size(a)))) t as x, ord``
  (1-based ordinals, matching ref axiom/sql/presto/ast/AstRelations.h
  Unnest::withOrdinality). Unsupported forms raise NotImplementedError with
  the PlanBuilder alternative — never a silent pass-through to Spark's parser.
- ``select ... from t1, t2`` implicit cross joins pass through (supported).

Statements: SELECT and EXPLAIN — same surface as the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from verax_spark.functions.presto import PRESTO_TO_SPARK

# matches a non-string segment ENDING with a type keyword; the following
# string segment is the literal body (rewrites run after string-splitting)
_TYPED_LITERAL_TAIL = re.compile(
    r"\b(double|real|bigint|integer|smallint|tinyint|varchar|decimal(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)"
    r"\s*$",
    re.IGNORECASE,
)

_CJ_UNNEST = re.compile(r"cross\s+join\s+unnest\s*\(", re.IGNORECASE)
_UNNEST_TAIL = re.compile(
    r"\s*(with\s+ordinality\s+)?as\s+(\w+)\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)",
    re.IGNORECASE,
)

_UNNEST_ANY = re.compile(r"\bunnest\s*\(", re.IGNORECASE)

# function renames applied at name( call sites
_FN_PATTERNS = [
    (re.compile(rf"\b{re.escape(p)}\s*\(", re.IGNORECASE), f"{s}(")
    for p, s in PRESTO_TO_SPARK.items()
    if p != s
]


def _split_strings(sql: str) -> list[tuple[str, bool]]:
    """Split into (segment, is_string_literal) runs so rewrites never touch
    quoted text. Handles '' escapes."""
    out: list[tuple[str, bool]] = []
    i, n = 0, len(sql)
    buf = []
    while i < n:
        ch = sql[i]
        if ch == "'":
            out.append(("".join(buf), False))
            buf = []
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                    continue
                if sql[j] == "'":
                    break
                j += 1
            out.append((sql[i : j + 1], True))
            i = j + 1
        else:
            buf.append(ch)
            i += 1
    if buf:
        out.append(("".join(buf), False))
    return out


_MAP_FROM_ARRAYS = re.compile(r"\bmap\s*\(\s*array\s*\(", re.IGNORECASE)


def _rewrite_array_literals(segments: list[tuple[str, bool]]) -> list[tuple[str, bool]]:
    """Presto ``ARRAY[...]`` constructor → Spark ``array(...)``.

    Bracket-aware: subscripts (``a[1]``) and nested constructors keep their
    own pairing, so ``ARRAY[a[1], ARRAY[2]]`` → ``array(a[1], array(2))``.
    The bracket stack persists across string-literal segments so
    ``ARRAY['a', 'b']`` closes correctly.
    """
    stack: list[str] = []  # closer for each open bracket: ')' or ']'
    result: list[tuple[str, bool]] = []
    for seg, is_str in segments:
        if is_str:
            result.append((seg, True))
            continue
        out: list[str] = []
        for ch in seg:
            if ch == "[":
                j = len(out) - 1
                while j >= 0 and out[j].isspace():
                    j -= 1
                k = j
                while k >= 0 and (out[k].isalnum() or out[k] == "_"):
                    k -= 1
                if "".join(out[k + 1 : j + 1]).lower() == "array":
                    out.append("(")
                    stack.append(")")
                else:
                    out.append("[")
                    stack.append("]")
            elif ch == "]":
                out.append(stack.pop() if stack else "]")
            else:
                out.append(ch)
        result.append(("".join(out), False))
    return result


def _mask_strings(sql: str) -> str:
    """Same-length copy with string-literal contents blanked, so regex and
    paren scans never match inside quoted text (indices stay aligned)."""
    out = []
    for seg, is_str in _split_strings(sql):
        out.append(" " * len(seg) if is_str else seg)
    return "".join(out)


def _matching_paren(masked: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(masked)):
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _split_top_level(expr: str, masked: str | None = None) -> list[str]:
    """Split an expression list on top-level commas (paren- and string-aware
    when the masked twin is supplied)."""
    guide = masked if masked is not None else expr
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(guide):
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(expr[start:i].strip())
            start = i + 1
    parts.append(expr[start:].strip())
    return parts


def _lower_unnest(exprs: list[str], ordinality: bool, alias: str, cols: list[str]) -> str:
    """Lower a Presto UNNEST relation onto Spark LATERAL VIEW.

    Ref grammar: axiom/sql/presto/ast/AstRelations.h (Unnest with optional
    ordinality), parser driver axiom/optimizer/tests/PrestoParser.cpp:1159.
    """
    if ordinality:
        if len(exprs) != 1 or len(cols) != 2:
            raise NotImplementedError(
                "UNNEST WITH ORDINALITY is supported for a single array with "
                "two output columns; use PlanBuilder.unnest(ordinality=True) "
                "for other shapes"
            )
        e = exprs[0]
        # 1-based ordinals via a zipped index array; inline drops empty/null
        # arrays exactly like Presto's CROSS JOIN UNNEST
        return (
            f"lateral view inline(arrays_zip({e}, sequence(1, size({e})))) "
            f"{alias} as {cols[0]}, {cols[1]}"
        )
    if len(exprs) > 1:
        if len(cols) != len(exprs):
            raise NotImplementedError(
                f"UNNEST({len(exprs)} arrays) must name exactly "
                f"{len(exprs)} output columns; got {len(cols)}"
            )
        zipped = ", ".join(exprs)
        return f"lateral view inline(arrays_zip({zipped})) {alias} as {', '.join(cols)}"
    if len(cols) == 1:
        return f"lateral view explode({exprs[0]}) {alias} as {cols[0]}"
    if len(cols) == 2:
        # map unnest: explode(map) yields (key, value)
        return f"lateral view explode({exprs[0]}) {alias} as {cols[0]}, {cols[1]}"
    raise NotImplementedError(
        "UNNEST of an array-of-rows with 3+ output columns: use "
        "PlanBuilder.unnest (Spark spells it inline())"
    )


# quantified comparison: <op> ANY/ALL/SOME ( subquery )
_QUANTIFIED = re.compile(
    r"(=|<>|!=|>=|<=|>|<)\s*(any|all|some)\s*\(", re.IGNORECASE
)

# how each (op, quantifier) lowers: IN/NOT IN for equality, min/max scalar
# aggregate for orderings (x > ANY(S) ⇔ x > min(S), x > ALL(S) ⇔ x > max(S);
# empty/NULL sets degrade to NULL comparisons, which agree with Presto in
# WHERE context — both drop the row)
_QUANT_AGG = {
    (">", "any"): "min", (">=", "any"): "min",
    ("<", "any"): "max", ("<=", "any"): "max",
    (">", "all"): "max", (">=", "all"): "max",
    ("<", "all"): "min", ("<=", "all"): "min",
}


def _rewrite_quantified(sql: str) -> str:
    """Presto quantified comparisons (ref axiom/sql/presto/ast/
    AstExpressions.h QuantifiedComparison) → Spark-parsable forms."""
    while True:
        masked = _mask_strings(sql)
        m = _QUANTIFIED.search(masked)
        if m is None:
            return sql
        op = "<>" if m.group(1) == "!=" else m.group(1)
        quant = m.group(2).lower()
        if quant == "some":
            quant = "any"
        open_idx = m.end() - 1
        close_idx = _matching_paren(masked, open_idx)
        if close_idx < 0:
            raise NotImplementedError("unbalanced parentheses in quantified comparison")
        sub = sql[open_idx + 1 : close_idx]
        if (op, quant) == ("=", "any"):
            repl = f"in ({sub})"
        elif (op, quant) == ("<>", "all"):
            repl = f"not in ({sub})"
        elif (op, quant) in _QUANT_AGG:
            agg = _QUANT_AGG[(op, quant)]
            repl = f"{op} (select {agg}(__q.__v) from ({sub}) as __q(__v))"
        else:
            raise NotImplementedError(
                f"quantified comparison {op} {quant.upper()}(...) has no "
                "clean Spark lowering; rewrite as EXISTS"
            )
        sql = sql[: m.start()] + repl + sql[close_idx + 1 :]


def _rewrite_unnests(sql: str) -> str:
    """Scan-and-lower every ``CROSS JOIN UNNEST(...) [WITH ORDINALITY] AS
    t(cols...)`` relation (string-aware, arbitrary paren nesting in args)."""
    while True:
        masked = _mask_strings(sql)
        m = _CJ_UNNEST.search(masked)
        if m is None:
            break
        open_idx = m.end() - 1
        close_idx = _matching_paren(masked, open_idx)
        if close_idx < 0:
            raise NotImplementedError("unbalanced parentheses in UNNEST(...)")
        tail = _UNNEST_TAIL.match(masked, close_idx + 1)
        if tail is None:
            raise NotImplementedError(
                "CROSS JOIN UNNEST must be followed by AS alias(col, ...) "
                "[optionally WITH ORDINALITY before AS]"
            )
        exprs = _split_top_level(
            sql[open_idx + 1 : close_idx], masked[open_idx + 1 : close_idx]
        )
        lowered = _lower_unnest(
            exprs,
            tail.group(1) is not None,
            tail.group(2),
            [c.strip() for c in tail.group(3).split(",")],
        )
        sql = sql[: m.start()] + lowered + sql[tail.end() :]
    if _UNNEST_ANY.search(_mask_strings(sql)):
        raise NotImplementedError(
            "unsupported UNNEST form (only CROSS JOIN UNNEST(...) AS "
            "t(cols...) [WITH ORDINALITY] is transpiled); use "
            "PlanBuilder.unnest for lateral/other shapes"
        )
    return sql


def transpile(sql: str) -> str:
    """Presto SQL text → Spark SQL text."""
    segments = _split_strings(sql)
    # pass 1 (string-aware): typed literals + function renames
    mid: list[tuple[str, bool]] = []
    i = 0
    while i < len(segments):
        seg, is_str = segments[i]
        if is_str:
            mid.append((seg, True))
            i += 1
            continue
        # typed literal: this segment ends with a type keyword and the next
        # segment is the quoted literal (quote-escapes preserved verbatim)
        m = _TYPED_LITERAL_TAIL.search(seg)
        typed = bool(m and i + 1 < len(segments) and segments[i + 1][1])
        body = seg[: m.start()] if typed else seg
        for pat, repl in _FN_PATTERNS:
            body = pat.sub(repl, body)
        mid.append((body, False))
        if typed:
            mid.append(("cast(", False))
            mid.append((segments[i + 1][0], True))
            mid.append((f" as {m.group(1)})", False))
            i += 2
        else:
            i += 1
    # pass 2: ARRAY[...] brackets (stack persists across string segments)
    mid = _rewrite_array_literals(mid)
    # pass 3: MAP(ARRAY.., ARRAY..) → map_from_arrays (always contiguous
    # non-string text), then relation-level UNNEST lowering on the full text
    rebuilt = "".join(
        seg if is_str else _MAP_FROM_ARRAYS.sub("map_from_arrays(array(", seg)
        for seg, is_str in mid
    )
    return _rewrite_unnests(_rewrite_quantified(rebuilt))


class PrestoSession:
    """SELECT/EXPLAIN entry point over the driver catalog, Presto dialect."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        from verax_spark.catalog import DEFAULT_SF_DIR, Catalog
        from verax_spark.functions.presto import register_sql_compat

        self.spark = spark
        self.catalog = Catalog(spark, sf_dir or DEFAULT_SF_DIR)
        self.catalog.register_views()
        register_sql_compat(spark)

    def sql(self, text: str) -> DataFrame:
        stripped = text.strip()
        if re.match(r"explain\b", stripped, re.IGNORECASE):
            body = re.sub(r"^explain\s+", "", stripped, flags=re.IGNORECASE)
            df = self.spark.sql(transpile(body))
            plan = df._jdf.queryExecution().explainString(
                self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            return self.spark.createDataFrame([(plan,)], "plan string")
        return self.spark.sql(transpile(stripped))
