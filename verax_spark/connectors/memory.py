"""In-memory connector (test ConnectorMetadata analog).

Named DataFrames registered at runtime — the reference's test connector
serves the same role for optimizer/executor tests
(axiom/connectors/ConnectorMetadata.h test impl). Writes rewrite the stored
logical plan (a LocalRelation-backed table behaves like a tiny mutable
table; everything stays lazy until an action).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verax_spark.connectors.base import Connector, ConnectorTable


class MemoryConnector(Connector):
    def __init__(self, *, name: str = "memory"):
        self.name = name
        self._tables: dict[str, DataFrame] = {}
        self._unique: dict[str, frozenset] = {}

    def register(
        self, table: str, df: DataFrame, *, unique_keys=frozenset()
    ) -> "MemoryConnector":
        self._tables[table] = df
        self._unique[table] = frozenset(unique_keys)
        return self

    def list_tables(self) -> list[str]:
        return sorted(self._tables)

    def table(self, table: str) -> ConnectorTable:
        if table not in self._tables:
            raise KeyError(f"{self.name}.{table}: not registered")
        return ConnectorTable(
            name=table,
            df=self._tables[table],
            unique_keys=self._unique.get(table, frozenset()),
            writable=True,
        )

    def insert(self, table: str, rows: DataFrame) -> None:
        self._tables[table] = self.table(table).df.unionByName(rows)

    def delete_where(self, table: str, predicate) -> None:
        self._tables[table] = self.table(table).df.filter(~F.lit(predicate))

    def update_where(self, table: str, assignments: dict, predicate) -> None:
        df = self.table(table).df
        for col, expr in assignments.items():
            df = df.withColumn(
                col, F.when(F.lit(predicate), expr).otherwise(F.col(col))
            )
        self._tables[table] = df
