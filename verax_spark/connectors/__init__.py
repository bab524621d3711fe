"""Connector metadata layer — the reference's extension surface.

The reference defines an abstract ``ConnectorMetadata`` API (table
resolution, layouts with stats/bucketing/unique keys, write support) with
three implementations: hive (files), tpch (generated), and a test connector
(axiom/connectors/ConnectorMetadata.h:176-353; hive/ tpch/ subdirs). This
package is the Spark-first analog:

- :class:`ParquetConnector` — a directory of parquet tables (hive analog):
  footer statistics, declared unique keys, copy-on-write DML.
- :class:`TpchConnector` — deterministic formula-generated TPC-H-style
  tables at any scale factor (tpch analog): zero files, generated
  distributively with ``spark.range`` + closed-form integer arithmetic, so
  the same rows are reproducible in ANSI SQL by any engine (oracle-able —
  no engine-specific hashing).
- :class:`MemoryConnector` — named in-session DataFrames (test analog).
- :class:`FilesConnector` — one directory, mixed formats by extension
  (parquet/ORC/CSV/JSON): the Hive connector's multi-format catalog,
  re-expressed over Spark's native DataSources.

``PrestoSession.attach(connector)`` exposes a connector's tables to SQL
text under ``<catalog>.<table>`` qualified names.
"""

from verax_spark.connectors.base import Connector, ConnectorTable
from verax_spark.connectors.files import FilesConnector
from verax_spark.connectors.memory import MemoryConnector
from verax_spark.connectors.parquet import ParquetConnector
from verax_spark.connectors.tpch import TpchConnector

__all__ = [
    "Connector",
    "ConnectorTable",
    "FilesConnector",
    "MemoryConnector",
    "ParquetConnector",
    "TpchConnector",
]
