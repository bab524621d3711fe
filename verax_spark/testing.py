"""Differential-testing harness: Spark result vs DuckDB oracle.

Models the reference's primary test strategy — every optimized plan is
executed and compared row-for-row against an independent reference execution
(axiom/optimizer/tests/QueryTestBase.h:70-95 ``checkSame``). Here the
independent engine is DuckDB running ANSI SQL over the same parquet files.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from verax_spark.catalog import ALL_TABLES


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the driver tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from read_parquet('{path}')")
    return con


def _canon(v):
    """Canonical comparable form of one cell: ndarray/list/tuple -> tuple
    of canonical elements, numpy scalars -> python, floats rounded to 9
    significant digits (nested values can't use the column-level isclose
    path). Engines differ in container type (Spark toPandas gives
    ndarray, DuckDB gives list) but not in element values."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if v != v:  # NaN
            return "nan"
        return float(f"{v:.9g}")
    return v


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by the stringified canonical value
    tuple (order-insensitive compare, like the driver's sorted value-hash;
    str-keyed so array/map cells — unhashable, unorderable — sort too)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        key = df.apply(
            lambda row: tuple((x is None, str(_canon(x))) for x in row), axis=1
        )
        df = df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)
    return df


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    *,
    rtol: float = 1e-9,
    atol: float = 1e-9,
    context: str = "",
) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{context}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{context}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64").to_numpy()
            bv = bv.astype("float64").to_numpy()
            ok = np.isclose(av, bv, rtol=rtol, atol=atol, equal_nan=True)
            assert ok.all(), (
                f"{context}: float column {col} differs at rows "
                f"{np.nonzero(~ok)[0][:5]}: {av[~ok][:5]} vs {bv[~ok][:5]}"
            )
        else:
            # map through _canon first: container types differ per engine
            # (ndarray vs list) even when element values are identical.
            # A top-level scalar float-NaN in a non-float column is
            # pandas' null marker for a nullable bool/int/string when it
            # comes from DuckDB .df() (NULL promotion) — canonicalize to
            # None on the ORACLE side only, so an engine-produced NaN in
            # an object column still fails against an oracle NULL
            # (ADVICE r08). Nested values keep NaN-vs-None distinct.
            def _cell(x, nan_is_null: bool):
                if nan_is_null and isinstance(x, float) and x != x:
                    x = None
                return str(_canon(x))

            av = av.map(lambda x: _cell(x, False)).to_numpy()
            bv = bv.map(lambda x: _cell(x, True)).to_numpy()
            bad = av != bv
            assert not bad.any(), (
                f"{context}: column {col} differs at rows "
                f"{np.nonzero(bad)[0][:5]}: {av[bad][:5]} vs {bv[bad][:5]}"
            )


def run_differential(spark, sf_dir: str, name: str, query_fn, oracle_sql: str) -> int:
    """Run one query both ways and assert equality; returns row count."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, context=name)
    return len(spark_pdf)
