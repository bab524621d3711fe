"""Connector API (ConnectorMetadata analog, ref connectors/ConnectorMetadata.h:176-353).

A connector resolves table names to :class:`ConnectorTable` handles carrying
exactly the metadata the planner consumes: the scan DataFrame, declared
unique keys (trusted like PRIMARY KEY; footers may falsify, never prove),
physical layout (bucketing), statistics, and write capability. Spark's
DataSource machinery does the execution-side work (splits, pushdown); this
layer is metadata only — resolving a table never runs a Spark job.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ConnectorTable:
    """TableHandle: what planning needs to know about one table."""

    name: str
    df: DataFrame
    unique_keys: frozenset = frozenset()  # column names with ≤1 row per value
    bucketed_by: tuple[tuple[str, ...], int] | None = None  # (cols, buckets)
    writable: bool = False
    path: str | None = None  # physical location when file-backed
    extra: dict = field(default_factory=dict)


class Connector(ABC):
    """Named catalog of tables (ConnectorMetadata analog)."""

    #: catalog name used to qualify tables in SQL text (``tpch.orders``)
    name: str

    @abstractmethod
    def list_tables(self) -> list[str]:
        """Known table names (listTables analog)."""

    @abstractmethod
    def table(self, table: str) -> ConnectorTable:
        """Resolve a table (findTable analog); KeyError when unknown."""

    def stats(self, table: str):
        """TableStats for the table, or None when the source has no cheap
        metadata (generated/in-memory sources estimate by sampling)."""
        handle = self.table(table)
        if handle.path is None:
            return None
        from verax_spark.sources.stats import table_stats

        return table_stats(handle.df)

    # -- write surface (WriteKind kCreate/kInsert/kDelete/kUpdate,
    # ref connectors/ConnectorMetadata.h:457-627) -------------------------
    def insert(self, table: str, rows: DataFrame) -> None:
        raise NotImplementedError(f"{self.name}: read-only connector")

    def delete_where(self, table: str, predicate) -> None:
        raise NotImplementedError(f"{self.name}: read-only connector")

    def update_where(self, table: str, assignments: dict, predicate) -> None:
        raise NotImplementedError(f"{self.name}: read-only connector")
