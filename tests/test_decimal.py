"""Presto decimal(p,s) arithmetic rules (functions/decimal.py)."""

from decimal import ROUND_HALF_UP, Decimal

import pytest

from verax_spark.functions import decimal as d


def test_result_types_follow_presto_rules():
    # addition/subtraction: p = max(p1-s1, p2-s2) + max(s1,s2) + 1
    assert d.result_type("+", "decimal(12,2)", "decimal(9,3)") == "decimal(14,3)"
    assert d.result_type("-", "decimal(5,0)", "decimal(5,0)") == "decimal(6,0)"
    # multiplication: p1+p2 (Spark would say p1+p2+1), s1+s2
    assert d.result_type("*", "decimal(12,2)", "decimal(9,3)") == "decimal(21,5)"
    # division: p = p1 + s2 + max(0, s2-s1), s = max(s1, s2)
    assert d.result_type("/", "decimal(12,2)", "decimal(9,3)") == "decimal(16,3)"
    assert d.result_type("/", "decimal(10,0)", "decimal(5,5)") == "decimal(20,5)"
    # 38 cap is an error, not silent loss
    with pytest.raises(ValueError, match="overflow"):
        d.result_type("*", "decimal(20,5)", "decimal(20,5)")


def test_literal_typing(spark):
    row = spark.range(1).select(
        d.literal("123.45").alias("a"), d.literal("0.5").alias("b")
    ).first()
    assert row.a == Decimal("123.45") and row.b == Decimal("0.5")
    assert dict(spark.range(1).select(d.literal("123.45").alias("a")).dtypes)[
        "a"
    ] == "decimal(5,2)"


@pytest.mark.parametrize(
    "op,cases",
    [
        ("+", [("1.25", "3.333"), ("99.99", "0.001")]),
        ("-", [("1.25", "3.333"), ("0.01", "0.009")]),
        ("*", [("1.25", "3.333"), ("12.34", "0.5")]),
        ("/", [("1.00", "3.000"), ("10.00", "7.001"), ("22.50", "0.075")]),
    ],
)
def test_values_match_python_decimal_half_up(spark, op, cases):
    import pyspark.sql.functions as F

    ta, tb = "decimal(12,2)", "decimal(9,3)"
    out_t = d.result_type(op, ta, tb)
    scale = int(out_t.rstrip(")").split(",")[1])
    q = Decimal(1).scaleb(-scale)
    for sa, sb in cases:
        got = (
            spark.range(1)
            .select(d.binary(op, F.lit(sa).cast(ta), ta, F.lit(sb).cast(tb), tb).alias("r"))
            .first()
            .r
        )
        a, b = Decimal(sa), Decimal(sb)
        want = {
            "+": a + b, "-": a - b, "*": a * b,
            "/": (a / b) if op == "/" else None,
        }[op]
        want = want.quantize(q, rounding=ROUND_HALF_UP)
        assert got == want, (op, sa, sb, got, want)


def test_high_scale_divisor_keeps_guard_digits(spark):
    # Presto: decimal(10,0) / decimal(5,5) -> decimal(20,5); Spark's native
    # quotient scale for these operands is max(6, 0+5+1) = 6 — only 1 guard
    # digit — the shim widens the numerator to keep >= 4
    import pyspark.sql.functions as F

    ta, tb = "decimal(10,0)", "decimal(5,5)"
    got = (
        spark.range(1)
        .select(d.binary("/", F.lit("1"), ta, F.lit("0.00007"), tb).alias("r"))
        .first()
        .r
    )
    want = (Decimal(1) / Decimal("0.00007")).quantize(
        Decimal("0.00001"), rounding=ROUND_HALF_UP
    )
    assert got == want
