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


def stats_backed_keys(stats, col: str, keys: list[str]) -> list[str]:
    """Filter candidate hot keys by per-path footer statistics: a key
    outside the map's observed key range (the ``col.key`` subfield chunk
    stats, sources/stats.py TableStats.subfields) can never match — hoisting
    it would add an always-null column and mask the scan-pruning win. The
    reference gates subfield pushdown on per-path stats the same way
    (ConnectorMetadata.h:51-93). Returns keys in input order; when the
    footer has no key-path stats, all candidates pass (stats absence must
    not disable the rewrite, only un-gate it).

    Writers may truncate string statistics. A prefix-truncated min is still
    a sound LOWER bound, so ``k < min`` always proves absence; a truncated
    max that a buggy writer failed to increment bounds only the prefix, so
    the sound upper-side test is ``k[:len(max)] > max`` — k exceeds every
    possible extension of the stored prefix (ADVICE r03)."""
    cs = stats.path_stats(f"{col}.key") if stats is not None else None
    if cs is None or cs.min is None or cs.max is None:
        return list(keys)
    lo, hi = cs.min, cs.max
    if isinstance(lo, bytes):
        lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
    lo, hi = str(lo), str(hi)

    def absent(k: str) -> bool:
        return k < lo or k[: len(hi)] > hi

    return [k for k in keys if not absent(str(k))]


def maps_as_structs(
    df: DataFrame,
    hot_keys: dict[str, list[str]],
    *,
    value_type: str = "string",
    drop_source: bool = True,
    stats=None,
) -> DataFrame:
    """Rewrite `col → {key: ...}` map access patterns into flat columns
    named `{col}_{key}`.

    hot_keys: map column (MapType or JSON string column) → keys to hoist.
    ``stats`` (sources/stats.TableStats) gates the rewrite per key via
    stats_backed_keys — keys the footer proves absent are not hoisted.
    """
    for col, keys in hot_keys.items():
        dtype = df.schema[col].dataType
        pruned: list[str] = []
        if stats is not None and isinstance(dtype, MapType):
            kept = stats_backed_keys(stats, col, keys)
            pruned = [k for k in keys if k not in kept]
            keys = kept
        if isinstance(dtype, MapType):
            for k in keys:
                df = df.withColumn(f"{col}_{k}", F.col(col).getItem(k))
            for k in pruned:
                # footer-proven absent: the lookup is all-null, but the
                # column must still exist — downstream references expect a
                # stable schema regardless of pruning (ADVICE r03)
                df = df.withColumn(
                    f"{col}_{k}", F.lit(None).cast(dtype.valueType)
                )
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
