"""Parquet-directory connector (hive ConnectorMetadata analog).

One directory, one ``<table>.parquet`` file (or sub-directory) per table —
the layout the driver testdata and all writable fixtures use. Statistics
come from parquet footers (driver-side metadata, no jobs); DML lowers onto
the file-granular copy-on-write path (sources/cow.py), the same rewrite the
SQL front door's DELETE/UPDATE uses.

Reference: hive connector metadata — tables with layouts + stats
(axiom/connectors/ConnectorMetadata.h:262-353), write support kInsert/
kDelete/kUpdate (ConnectorMetadata.h:457-627).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from verax_spark.connectors.base import Connector, ConnectorTable


class ParquetConnector(Connector):
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        name: str = "parquet",
        writable: bool = False,
        unique_keys: dict[str, frozenset] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.name = name
        self.writable = writable
        self._unique = unique_keys or {}

    def list_tables(self) -> list[str]:
        out = []
        for entry in sorted(os.listdir(self.root)):
            if entry.endswith(".parquet"):
                out.append(entry[: -len(".parquet")])
        return out

    def _path(self, table: str) -> str:
        path = os.path.join(self.root, f"{table}.parquet")
        if not os.path.exists(path):
            raise KeyError(f"{self.name}.{table}: no such table at {path}")
        return path

    def table(self, table: str) -> ConnectorTable:
        path = self._path(table)
        return ConnectorTable(
            name=table,
            df=self.spark.read.parquet(path),
            unique_keys=frozenset(self._unique.get(table, ())),
            writable=self.writable,
            path=path,
        )

    def _writable_path(self, table: str) -> str:
        if not self.writable:
            raise NotImplementedError(f"{self.name}: read-only connector")
        return self._path(table)

    def insert(self, table: str, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self._writable_path(table))

    def delete_where(self, table: str, predicate) -> None:
        from verax_spark.sources.cow import delete_rows

        delete_rows(self.spark, self._writable_path(table), predicate)

    def update_where(self, table: str, assignments: dict, predicate) -> None:
        from verax_spark.sources.cow import update_rows

        update_rows(self.spark, self._writable_path(table), assignments, predicate)
