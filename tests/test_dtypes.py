"""Schema parity: every oracled query's column dtypes must agree with the
oracle engine at the pandas level (int vs float vs object), catching
silent widenings like DuckDB HUGEINT→float64 or Spark int32 ranks before
the driver's schema check does. Timestamp unit (ns vs us) differences are
representational and allowed."""

import pandas as pd
import pytest

import __spark_entry__ as E
from verax_spark.testing import duckdb_connection

SKIP = {"st_windowed_counts"}  # streaming drain; covered by its own tests


def _kind(dtype) -> str:
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    return "object"


QUERIES = E.queries()
ORACLES = E.oracle_sql()
NAMES = sorted(set(QUERIES) & set(ORACLES) - SKIP)


@pytest.mark.parametrize("name", NAMES)
def test_dtype_kinds_match_oracle(spark, sf_dir, name):
    spdf = QUERIES[name](spark, sf_dir).limit(0).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(f"select * from ({ORACLES[name]}) q limit 0").df()
    finally:
        con.close()
    got = {c: _kind(t) for c, t in spdf.dtypes.items()}
    want = {c: _kind(t) for c, t in odf.dtypes.items()}
    assert got == want, f"{name}: dtype kinds differ {got} vs {want}"
