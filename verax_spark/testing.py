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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values (order-insensitive
    compare, like the driver's sorted value-hash)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
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
            av = av.astype(str).to_numpy()
            bv = bv.astype(str).to_numpy()
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
