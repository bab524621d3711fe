"""Presto function shim sanity: renames resolve, adapters behave, unknown
names fail loudly."""

import pyspark.sql.functions as F
import pytest

from verax_spark.functions.presto import presto_call


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame(
        [(1, 2.5, "hello world", [1, 2, 3], True)],
        "i bigint, d double, s string, xs array<int>, b boolean",
    )


def test_scalar_renames_resolve(one):
    row = one.select(
        presto_call("cardinality", F.col("xs")).alias("card"),
        presto_call("strpos", F.col("s"), "world").alias("pos"),
        presto_call("codepoint", F.lit("A")).alias("cp"),
        presto_call("power", F.col("d"), 2).alias("sq"),
        presto_call("ceiling", F.col("d")).alias("ce"),
        presto_call("starts_with", F.col("s"), "he").alias("sw"),
        presto_call("regexp_like", F.col("s"), "w.rld").alias("rl"),
    ).collect()[0]
    assert (row.card, row.pos, row.cp) == (3, 7, 65)
    assert row.sq == 6.25 and row.ce == 3 and row.sw and row.rl


def test_aggregate_renames_resolve(one):
    row = one.select(
        presto_call("approx_distinct", F.col("i")).alias("ad"),
        presto_call("arbitrary", F.col("s")).alias("arb"),
        presto_call("bool_and", F.col("b")).alias("ba"),
        presto_call("bool_or", F.col("b")).alias("bo"),
    ).collect()[0]
    assert (row.ad, row.arb, row.ba, row.bo) == (1, "hello world", True, True)


def test_array_agg_and_set_agg(spark):
    df = spark.createDataFrame([(1,), (2,), (2,)], "x int")
    row = df.select(
        F.sort_array(presto_call("array_agg", F.col("x"))).alias("la"),
        F.sort_array(presto_call("set_agg", F.col("x"))).alias("sa"),
    ).collect()[0]
    assert row.la == [1, 2, 2] and row.sa == [1, 2]


def test_unknown_function_raises_actionably(one):
    with pytest.raises(ValueError, match="no Spark mapping"):
        one.select(presto_call("definitely_not_a_function", F.col("i")))


def test_array_union_dedups(one):
    row = one.select(
        presto_call("array_union", F.col("xs"), F.array(F.lit(3), F.lit(4))).alias("u")
    ).collect()[0]
    assert row.u == [1, 2, 3, 4]
