"""Map-as-struct subfield rewrite (axiom/optimizer/Subfields.cpp analog).

The reference tracks per-path subfield accesses and can rewrite hot map keys
`m['k']` into projected struct columns pushed to the scan
(axiom/optimizer/ToGraph.h:81-137; OptimizerOptions.h:38-46
pushdownSubfields/allMapsAsStruct). Catalyst prunes struct fields natively
(NestedColumnPruning) but never converts map lookups, so a query touching 3
hot keys of a wide map column still deserializes every entry of every row.

This rewrite hoists the hot keys into top-level columns immediately after
the scan and drops the map, so downstream operators carry only the narrow
columns — at 100 TB the difference between shuffling a 3-column row and a
full serialized map. Works for real MapType columns and for JSON-encoded
maps (the testdata's events.props VARCHAR), where from_json with a pruned
schema gives the same effect: only the named keys are parsed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import MapType, StringType


def maps_as_structs(
    df: DataFrame,
    hot_keys: dict[str, list[str]],
    *,
    value_type: str = "string",
    drop_source: bool = True,
) -> DataFrame:
    """Rewrite `col → {key: ...}` map access patterns into flat columns
    named `{col}_{key}`.

    hot_keys: map column (MapType or JSON string column) → keys to hoist.
    """
    for col, keys in hot_keys.items():
        dtype = df.schema[col].dataType
        if isinstance(dtype, MapType):
            for k in keys:
                df = df.withColumn(f"{col}_{k}", F.col(col).getItem(k))
        elif isinstance(dtype, StringType):
            # JSON map: parse ONLY the hot keys (pruned schema = pruned parse)
            schema = ", ".join(f"`{k}` {value_type}" for k in keys)
            parsed = F.from_json(F.col(col), schema)
            for k in keys:
                df = df.withColumn(f"{col}_{k}", parsed.getField(k))
        else:
            raise TypeError(f"{col}: expected MapType or JSON string, got {dtype}")
        if drop_source:
            df = df.drop(col)
    return df
