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
  literals pass through (Spark shares the syntax).
- Presto→Spark function renames (verax_spark.functions.presto map).
- ``cross join unnest(expr) as t(x)`` → ``lateral view explode(expr) t as x``
  (WITH ORDINALITY raises — use PlanBuilder.unnest(ordinality=True)).
- ``select ... from t1, t2`` implicit cross joins pass through (supported).

Statements: SELECT and EXPLAIN — same surface as the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from verax_spark.functions.presto import PRESTO_TO_SPARK

_TYPED_LITERAL = re.compile(
    r"\b(double|real|bigint|integer|smallint|tinyint|varchar|decimal(?:\s*\(\s*\d+\s*,\s*\d+\s*\))?)"
    r"\s+'([^']*)'",
    re.IGNORECASE,
)

_UNNEST = re.compile(
    r"cross\s+join\s+unnest\s*\(([^()]*(?:\([^()]*\))*[^()]*)\)\s+as\s+(\w+)\s*\(\s*(\w+)\s*\)",
    re.IGNORECASE,
)

_UNNEST_ORDINALITY = re.compile(r"with\s+ordinality", re.IGNORECASE)

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


def transpile(sql: str) -> str:
    """Presto SQL text → Spark SQL text."""
    if _UNNEST_ORDINALITY.search(sql):
        raise NotImplementedError(
            "UNNEST ... WITH ORDINALITY: use PlanBuilder.unnest(ordinality=True); "
            "Spark SQL spells it posexplode and reorders the columns"
        )
    # typed literals must see the quote, so run before string-splitting
    sql = _TYPED_LITERAL.sub(lambda m: f"cast('{m.group(2)}' as {m.group(1)})", sql)

    segments = _split_strings(sql)
    rebuilt = []
    for seg, is_str in segments:
        if is_str:
            rebuilt.append(seg)
            continue
        for pat, repl in _FN_PATTERNS:
            seg = pat.sub(repl, seg)
        seg = _UNNEST.sub(lambda m: f"lateral view explode({m.group(1)}) {m.group(2)} as {m.group(3)}", seg)
        rebuilt.append(seg)
    return "".join(rebuilt)


class PrestoSession:
    """SELECT/EXPLAIN entry point over the driver catalog, Presto dialect."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        from verax_spark.catalog import DEFAULT_SF_DIR, Catalog

        self.spark = spark
        self.catalog = Catalog(spark, sf_dir or DEFAULT_SF_DIR)
        self.catalog.register_views()

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
