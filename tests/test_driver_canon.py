"""Driver-canonicalization compatibility of declared query results.

The round driver canonicalizes each query's result by sorting the pandas
frame over ALL columns; a list/dict cell raises ``TypeError: unhashable
type`` inside pandas and the driver row goes red regardless of values
(CORRECTNESS_r10: op_fn_batch13/op_fn_batch15). Every declared query must
therefore emit flat scalar columns — arrays/maps serialized to strings.

These tests pin the two queries that regressed plus the emulated driver
sort for them; tools/selfcheck.py enforces the flat-schema rule over the
whole 167-query surface.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from verax_spark.queries import operators


def _driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Emulate the driver's canonicalization: sort rows by every column."""
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols).reset_index(drop=True)


@pytest.mark.parametrize("name", ["op_fn_batch13", "op_fn_batch15"])
def test_flat_schema_and_pandas_sortable(spark, sf_dir, name):
    df = operators.QUERIES[name](spark, sf_dir)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert complex_cols == [], (
        f"{name} emits driver-unsortable complex columns {complex_cols}"
    )
    pdf = df.toPandas()
    canon = _driver_canon(pdf)  # raises TypeError on unhashable cells
    assert len(canon) == len(pdf)


def test_batch13_serialized_arrays(spark, sf_dir):
    rows = {
        r["d"]: r
        for r in operators.QUERIES["op_fn_batch13"](spark, sf_dir).collect()
    }
    assert rows[0]["top2"] == "9,7"
    assert rows[0]["au"] == "0,5,7"
    assert rows[1]["ad"] == "1"


def test_batch15_serialized_arrays(spark, sf_dir):
    rows = {
        r["g"]: r
        for r in operators.QUERIES["op_fn_batch15"](spark, sf_dir).collect()
    }
    assert rows[0]["alf"] == "1"
    assert rows[0]["mtk"] == "b"
    assert rows[3]["mvk"] == "7"
