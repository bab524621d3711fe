"""Multi-format file connector: one directory, one ``<table>.<ext>`` per
table, format resolved from the extension.

The reference's Hive connector reads more than one file format from the
same catalog (DWRF + parquet, connectors/hive/README.md — DWRF itself has
no Spark reader and is documented as unreachable in COVERAGE.md). Spark's
DataSource layer gives parquet/ORC/CSV/JSON natively, so the Spark-first
analog is an extension-dispatched catalog over the same ConnectorTable
metadata surface.

Formats and their planning cost:
- ``parquet`` / ``orc``: schema from file metadata — no Spark job.
- ``csv`` (header) / ``json`` (lines): schema inference is a one-time
  planning scan of the file, cached on the connector (text formats carry
  no embedded schema; pass ``schemas={table: ddl}`` to skip the scan —
  the same trade the reference's text-file Hive tables make with their
  ``.schema`` sidecar files).

Statistics: parquet tables get footer stats (sources/stats); other
formats return None and the planner falls back to sampling — matching
the reference, where non-columnar layouts expose no cheap rowcounts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from verax_spark.connectors.base import Connector, ConnectorTable

_EXTS = ("parquet", "orc", "csv", "json")


class FilesConnector(Connector):
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        name: str = "files",
        unique_keys: dict[str, frozenset] | None = None,
        schemas: dict[str, "str | StructType"] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.name = name
        self._unique = unique_keys or {}
        self._schemas = schemas or {}
        self._cache: dict[str, DataFrame] = {}

    def _scan(self) -> dict[str, tuple[str, str]]:
        """table -> (format, path); later-listed extensions do not shadow
        earlier ones — duplicates raise so a catalog is never ambiguous."""
        out: dict[str, tuple[str, str]] = {}
        for entry in sorted(os.listdir(self.root)):
            base, dot, ext = entry.rpartition(".")
            if dot and ext in _EXTS:
                if base in out:
                    raise ValueError(
                        f"{self.name}.{base}: ambiguous — both "
                        f".{out[base][0]} and .{ext} exist"
                    )
                out[base] = (ext, os.path.join(self.root, entry))
        return out

    def list_tables(self) -> list[str]:
        return sorted(self._scan())

    def _read(self, table: str, fmt: str, path: str) -> DataFrame:
        if table in self._cache:
            return self._cache[table]
        reader = self.spark.read
        if fmt == "parquet":
            df = reader.parquet(path)
        elif fmt == "orc":
            df = reader.orc(path)
        elif fmt == "csv":
            ddl = self._schemas.get(table)
            if ddl:
                df = reader.schema(ddl).option("header", True).csv(path)
            else:
                df = reader.option("header", True).option(
                    "inferSchema", True
                ).csv(path)
        else:  # json (lines)
            ddl = self._schemas.get(table)
            df = (
                reader.schema(ddl).json(path) if ddl else reader.json(path)
            )
        self._cache[table] = df
        return df

    def table(self, table: str) -> ConnectorTable:
        catalog = self._scan()
        if table not in catalog:
            raise KeyError(f"{self.name}.{table}: no such table in {self.root}")
        fmt, path = catalog[table]
        return ConnectorTable(
            name=table,
            df=self._read(table, fmt, path),
            unique_keys=frozenset(self._unique.get(table, ())),
            path=path if fmt == "parquet" else None,
            extra={"format": fmt},
        )
