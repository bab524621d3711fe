"""Presto DECIMAL(p, s) arithmetic semantics on Spark.

The reference's type system carries decimals first-class (DECIMAL literals:
axiom/sql/presto/ast/AstLiterals.h:125; the Velox layer implements Presto's
published result-type rules). Spark's decimal algebra differs in two of the
four operators, so a dialect shim is needed for bit-identical Presto
results:

  op   Presto result type                     Spark result type
  ---  -------------------------------------  ----------------------------
  +,-  p = max(p1-s1, p2-s2) + max(s1,s2)+1   (same)
       s = max(s1, s2)
  *    p = p1 + p2,  s = s1 + s2              p = p1 + p2 + 1  (one wider)
  /    p = p1 + s2 + max(0, s2 - s1)          p = p1 - s1 + s2
       s = max(s1, s2)                            + max(6, s1 + p2 + 1)
                                              s = max(6, s1 + p2 + 1)

(Presto semantics: division ROUNDS HALF-UP to the result scale; every
precision is capped at 38, and overflow past the cap is a runtime error,
not silent precision loss.)

The shim computes through Spark's wider native type, then casts to the
Presto type — Spark's decimal cast rounds HALF_UP, so the narrowing cast
implements Presto's rounding exactly. For division, Spark's native scale
(≥ 6 beyond the Presto scale here) makes double-rounding anomalies
impossible for the scales this shim accepts (a quotient would need to sit
within 10^-6 of a half-ulp AND round inward — casts only occur from ≥4
extra digits of true quotient).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column

MAX_PRECISION = 38


def _parse(t: str) -> tuple[int, int]:
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t.strip().lower())
    if not m:
        raise ValueError(f"not a decimal type: {t!r}")
    return int(m.group(1)), int(m.group(2))


def result_type(op: str, left: str, right: str) -> str:
    """Presto result type for ``left <op> right`` (op ∈ +,-,*,/).

    Raises on precision overflow past 38 — Presto fails rather than
    silently losing scale (unlike Spark's allowPrecisionLoss default).
    """
    p1, s1 = _parse(left)
    p2, s2 = _parse(right)
    if op in ("+", "-"):
        s = max(s1, s2)
        p = max(p1 - s1, p2 - s2) + s + 1
    elif op == "*":
        s = s1 + s2
        p = p1 + p2
    elif op == "/":
        s = max(s1, s2)
        p = p1 + s2 + max(0, s2 - s1)
    else:
        raise ValueError(f"unsupported decimal op: {op!r}")
    if p > MAX_PRECISION:
        raise ValueError(
            f"DECIMAL precision overflow: {left} {op} {right} -> "
            f"decimal({p},{s}) exceeds {MAX_PRECISION} (Presto raises here)"
        )
    return f"decimal({p},{s})"


def binary(op: str, a: Column, left: str, b: Column, right: str) -> Column:
    """``a <op> b`` with Presto's result type and rounding.

    ``left`` / ``right`` are the operand decimal type strings (the DSL is
    untyped on the Python side, so the operand types are declared at the
    call site — the reference resolves them from its typed Expr tree).
    """
    a = a.cast(left)
    b = b.cast(right)
    out = result_type(op, left, right)
    if op == "+":
        raw = a + b
    elif op == "-":
        raw = a - b
    elif op == "*":
        raw = a * b
    else:
        # Spark's native quotient scale is max(6, s1+p2+1). When the Presto
        # scale comes from a high-scale DIVISOR (s2 > s1+p2+1-4), that may
        # not leave guard digits — widen the numerator so the intermediate
        # scale exceeds the Presto scale by ≥4 before the rounding cast.
        p1, s1 = _parse(left)
        p2, _s2 = _parse(right)
        ps = _parse(out)[1]
        d = max(0, ps + 4 - max(6, s1 + p2 + 1))
        if d:
            if p1 + d > MAX_PRECISION:
                raise ValueError(
                    f"decimal division {left} / {right}: cannot widen "
                    f"numerator past precision {MAX_PRECISION}"
                )
            a = a.cast(f"decimal({p1 + d},{s1 + d})")
        raw = a / b
    return raw.cast(out)


def literal(text: str) -> Column:
    """DECIMAL 'x.yz' literal with Presto typing: precision = digit count,
    scale = digits right of the point (AstLiterals.h:125 keeps the exact
    text for this reason)."""
    t = text.strip()
    m = re.fullmatch(r"[+-]?(\d*)\.?(\d*)", t)
    if not m or not (m.group(1) or m.group(2)):
        raise ValueError(f"bad decimal literal: {text!r}")
    digits = len((m.group(1) or "").lstrip("0") or "0") + len(m.group(2) or "")
    scale = len(m.group(2) or "")
    return F.lit(t).cast(f"decimal({max(digits, 1)},{scale})")
