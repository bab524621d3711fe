"""Differential tests for the per-operator corpus (SURVEY §2 coverage)."""

import pytest

from verax_spark.queries import operators
from verax_spark.testing import run_differential

NAMES = sorted(operators.QUERIES)


@pytest.mark.parametrize("name", NAMES)
def test_operator_matches_oracle(spark, sf_dir, name):
    rows = run_differential(
        spark, sf_dir, name, operators.QUERIES[name], operators.ORACLE[name]
    )
    assert rows > 0, f"{name}: empty result"


def test_groups_frame_unbounded_and_count(spark, sf_dir):
    """GROUPS emulation sanity beyond the oracled query: unbounded preceding
    equals a running per-group total; count over all-groups frame equals the
    partition size."""
    import pyspark.sql.functions as F

    from verax_spark.operators.windows import with_groups_frame

    from verax_spark.catalog import Catalog

    cat = Catalog(spark, sf_dir)
    base = cat.orders.filter(F.col("o_custkey") < 5).withColumn(
        "mon", F.date_trunc("month", "o_orderdate").cast("date")
    )
    out = with_groups_frame(
        base, "n_all", F.lit(1), agg="count",
        partition_by=["o_custkey"], order_by="mon",
        preceding=None, following=None,
    )
    sizes = {r.o_custkey: r.n for r in base.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in out.select("o_custkey", "n_all").distinct().collect():
        assert r.n_all == sizes[r.o_custkey]
