"""Differential tests: every TPC-H corpus query vs the DuckDB oracle.

Mirrors the reference's checkSame strategy
(axiom/optimizer/tests/QueryTestBase.h:70-95).
"""

import pytest

from verax_spark.queries import tpch
from verax_spark.testing import run_differential

QUERY_NAMES = sorted(tpch.QUERIES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_tpch_query_matches_oracle(spark, sf_dir, name):
    rows = run_differential(spark, sf_dir, name, tpch.QUERIES[name], tpch.ORACLE[name])
    # every corpus query should produce rows at smoke scale
    assert rows > 0, f"{name}: empty result — filters too tight for testdata"
