"""Copy-on-write DELETE/UPDATE (TableWrite kDelete/kUpdate analog,
ref axiom/connectors/ConnectorMetadata.h:457-627)."""

import os
import uuid

import pyspark.sql.functions as F
import pytest

from verax_spark.sources.cow import delete_rows, update_rows


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / f"t_{uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(100)], "id int, bucket int, v double"
    )
    # bucketed repartition → each bucket's rows concentrate in one file
    df.repartition(4, "bucket").write.parquet(path)
    return path


def _files(path):
    return sorted(f for f in os.listdir(path) if f.endswith(".parquet"))


def test_delete_rows_removes_only_matches(spark, table):
    before = _files(table)
    n = delete_rows(spark, table, F.col("bucket") == 2)
    assert n >= 1
    back = spark.read.parquet(table)
    assert back.filter(F.col("bucket") == 2).count() == 0
    assert back.count() == 75
    # untouched files survive in place (file-granular copy-on-write)
    after = _files(table)
    assert len(set(before) & set(after)) == len(before) - n


def test_delete_noop_when_no_match(spark, table):
    before = _files(table)
    assert delete_rows(spark, table, F.col("bucket") == 99) == 0
    assert _files(table) == before
    assert spark.read.parquet(table).count() == 100


def test_update_rows_patches_only_matches(spark, table):
    n = update_rows(
        spark, table, {"v": F.col("v") * 10}, F.col("bucket") == 1
    )
    assert n >= 1
    back = spark.read.parquet(table)
    # matched rows patched, type preserved
    got = {r.id: r.v for r in back.collect()}
    for i in range(100):
        assert got[i] == (i * 10.0 if i % 4 == 1 else float(i))
    assert dict(back.dtypes)["v"] == "double"


def test_update_unknown_column_raises(spark, table):
    with pytest.raises(ValueError, match="unknown columns"):
        update_rows(spark, table, {"nope": F.lit(1)}, F.col("bucket") == 0)


def test_update_casts_back_to_column_type(spark, table):
    # assignment yields int; column is double — must come back as double
    update_rows(spark, table, {"v": F.lit(7)}, F.col("bucket") == 3)
    back = spark.read.parquet(table)
    assert dict(back.dtypes)["v"] == "double"
    assert back.filter(F.col("bucket") == 3).select(F.min("v")).collect()[0][0] == 7.0
