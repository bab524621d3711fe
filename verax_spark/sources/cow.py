"""Copy-on-write row-level DELETE / UPDATE over plain parquet tables.

Reference surface: TableWriteNode WriteKind kDelete / kUpdate
(axiom/connectors/ConnectorMetadata.h:457-627) — row-id driven row-level
mutation. Spark-first translation: the row-id is (file, position); instead of
tracking positions we use FILE-GRANULAR copy-on-write, the same strategy
Delta/Iceberg use for non-vectorized deletes:

1. prune: find the files that contain at least one matching row via the
   hidden ``_metadata.file_path`` column (a column-pruned scan; predicate
   pushdown + footer min/max skip files that cannot match);
2. rewrite: read ONLY those files, drop/patch the matching rows, write the
   survivors as new uniquely-named files into the table directory;
3. swap: delete the superseded files.

Untouched files are never read or rewritten, so cost scales with the
affected-file fraction, not table size — at 100 TB a selective delete
rewrites a handful of files. Ordering is write-new-then-drop-old: a crash in
between leaves duplicate rows (visible, repairable) rather than lost data.
Plain directories have no snapshot isolation — concurrent readers mid-swap
can observe both or neither file; a real lakehouse deployment would put
Delta/Iceberg under this same API.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession

from verax_spark.sources import versions


def _affected_files(
    spark: SparkSession, path: str, predicate: Column, schema=None
) -> list[str]:
    """Files containing ≥1 matching row (driver-side list, bounded by file
    count). Column-pruned: only _metadata + predicate columns are read.
    An explicit ``schema`` skips the footer-inference pass (the hidden
    ``_metadata`` column is available either way)."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    rows = (
        reader.parquet(path)
        .filter(predicate)
        .select("_metadata.file_path")
        .distinct()
        .collect()
    )
    return [r.file_path for r in rows]


def _local(p: str) -> str:
    return p.removeprefix("file://").removeprefix("file:")


def _rewrite(
    spark: SparkSession,
    path: str,
    affected: list[str],
    transform,
    txn=None,
    schema=None,
) -> int:
    """Copy-on-write body: transform(affected-file rows) → new files in the
    table dir, then drop the superseded files. Returns #files rewritten.

    Inside a transaction (sources/txn.py), superseded files are retired
    into the undo dir instead of deleted and new files are recorded, making
    the rewrite reversible at file-metadata cost."""
    if not affected:
        return 0
    if schema is None:  # pin schema (all-delete case)
        schema = spark.read.parquet(path).schema
    replaced = transform(spark.read.schema(schema).parquet(*affected))
    staging = os.path.join(_local(path), f"_cow_staging_{uuid.uuid4().hex[:12]}")
    replaced.write.mode("overwrite").parquet(staging)
    prefix = f"cow-{uuid.uuid4().hex[:12]}"
    for name in os.listdir(staging):
        if name.endswith(".parquet"):
            dest = os.path.join(_local(path), f"{prefix}-{name}")
            os.rename(os.path.join(staging, name), dest)
            if txn is not None:
                txn.record_added(dest)
    shutil.rmtree(staging, ignore_errors=True)
    for f in affected:
        if txn is not None:
            txn.retire(path, f)
        else:
            # versioned tables keep superseded files readable for time
            # travel (falls back to delete when no version log exists)
            versions.retire_file(path, f)
    if txn is None and versions.enabled(path):
        versions.record(path)
    return len(affected)


def delete_rows(
    spark: SparkSession, path: str, predicate: Column, txn=None, schema=None
) -> int:
    """DELETE FROM <path> WHERE predicate (WriteKind::kDelete analog).

    Returns the number of files rewritten. ``schema`` (optional, the
    table's pinned schema) removes every footer-inference job — DML never
    changes a table's schema, so callers that hold it should pass it.
    """
    affected = _affected_files(spark, path, predicate, schema)
    return _rewrite(
        spark, path, affected, lambda df: df.filter(~predicate), txn, schema
    )


def update_rows(
    spark: SparkSession,
    path: str,
    assignments: dict[str, Column],
    predicate: Column,
    txn=None,
    schema=None,
) -> int:
    """UPDATE <path> SET col = expr, ... WHERE predicate (kUpdate analog).

    Non-matching rows in affected files are rewritten unchanged; column
    types are preserved (each assignment is cast back to the column's
    original type, matching the reference's updated-column type contract,
    ConnectorMetadata.h:565-590).
    """
    import pyspark.sql.functions as F

    if schema is None:
        schema = spark.read.parquet(path).schema
    types = {f.name: f.dataType.simpleString() for f in schema}
    unknown = set(assignments) - set(types)
    if unknown:
        raise ValueError(f"UPDATE of unknown columns: {sorted(unknown)}")

    def patch(df: DataFrame) -> DataFrame:
        out = df
        for col, expr in assignments.items():
            out = out.withColumn(
                col,
                F.when(predicate, expr.cast(types[col])).otherwise(F.col(col)),
            )
        return out

    affected = _affected_files(spark, path, predicate, schema)
    return _rewrite(spark, path, affected, patch, txn, schema)
