"""Physical table layouts: partitioning and bucketing.

Reference: connector tables carry one or more physical TableLayouts with
partitioning columns, sort order, and bucket counts
(axiom/connectors/ConnectorMetadata.h:176-353); the local Hive connector
encodes them in a `.schema` file per table directory
(axiom/connectors/hive/README.md). The optimizer uses layouts for
co-partitioning awareness (Distribution::isSamePartition, Schema.h:190) and
index-style lookups.

Spark equivalents, used here:
- **Hive-style partitioning** (`partitionBy`): directory-per-value; enables
  partition pruning — the scan reads only matching directories.
- **Bucketing** (`bucketBy().sortBy()` + saveAsTable): pre-shuffled layout;
  equi-joins and aggregations on the bucket key need NO exchange — the
  Spark analog of the reference's co-located index joins
  (axiom/optimizer/Optimization.cpp:817 joinByIndex). At 100 TB, bucketing
  the fact tables on their join keys turns every repeated join into a
  shuffle-free merge — this is the single biggest shuffle saver available.

The reference's row-level index lookup (LookupKeys,
ConnectorMetadata.h:392-418) has no vanilla Spark analog (SURVEY §4);
bucketed sort-merge or broadcast joins are the documented approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], *, mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (TableLayout.partitioning)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table (TableLayout bucketing/sort order).

    Joins between tables bucketed the same way on the same keys execute
    without any Exchange (asserted in tests/test_layout.py).
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
        .format("parquet")
    )
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
