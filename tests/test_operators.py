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
