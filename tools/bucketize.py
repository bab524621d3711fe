"""Materialize bucketed TableLayouts for a bench corpus directory.

Round-6 verdict #2: the four worst sf100 ratios (q3/q9/q12/q16) all pay an
orderkey fact shuffle every run. The reference's TableLayout
(axiom/connectors/ConnectorMetadata.h:176-286) exists precisely so storage
can declare bucketing once and the optimizer exploits it on every query.
This tool is the write-once side: it materializes orders+lineitem bucketed
AND sorted on orderkey (one file per bucket, so the per-bucket sort order is
trusted and sort-merge joins skip the Sort too) and registers them in the
layout registry (sources/layout.py). Catalog.table() picks the layouts up
automatically in every later session over the same source files; rows are
identical by construction so results and hashes are unchanged.

Usage:  python tools/bucketize.py [sf_dir] [--buckets=N]
        (default sf_dir /tmp/sf100, N=32 — one bucket per local core;
        a 1000-executor cluster would use e.g. 4096)
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# table → list of (bucket columns, primary) — a table may carry several
# layouts (the reference's multiple ColumnGroups per SchemaTable,
# Schema.h:238-264); `primary` is the default when a query doesn't declare
# which clustering it exploits. orderkey is the dominant repeated join/agg
# key of the corpus (q3/q4/q9/q10/q12/q18/q21 + SQL front door); the
# suppkey/partkey/custkey layouts serve the distinct-supplier and
# per-part/per-customer aggregations (q2/q11/q13/q15/q16/q17/q20).
BUCKET_SPECS = {
    "orders": [(["o_orderkey"], True), (["o_custkey"], False)],
    "lineitem": [
        (["l_orderkey"], True),
        (["l_suppkey"], False),
        (["l_partkey"], False),
    ],
}

# table → (derived-column spec, sort columns) for the materialized-
# projection copy (r10, VERDICT r09 #1): precomputed unit columns +
# range-sort by shipdate, so shipdate-windowed scan-bound queries
# (q1/q6/q14/q15/q20 class) read pruned row groups of precomputed int64
# instead of full-span doubles. The canonical SQL lives with the queries
# that consume it (queries/tpch.py LINEITEM_DERIVED).


def _projection_specs():
    from verax_spark.queries.tpch import LINEITEM_DERIVED, ORDERS_DERIVED

    # the __sd/__od DATE shadows exist because TIMESTAMP_NTZ predicates
    # never become parquet FilterPredicates (no row-group pruning); DATE
    # predicates do — see queries/tpch.py _range_pred.
    # n_files: range-sorted copies serve WINDOWED scans, so the file count
    # sets the post-pruning parallelism — at 32 files a one-year lineitem
    # window landed on ~5 files = 5 of 32 cores (measured: the pruned scan
    # was SLOWER end-to-end than the full bucket scan, 5.4s vs 5.0s at
    # sf100). ~7 years of data x 32-way target parallelism → 256 lineitem
    # files (~36 MB each; a one-year window = ~37 files), 128 for the
    # ~5x-smaller orders.
    return {
        "lineitem": (LINEITEM_DERIVED, ["l_shipdate"], 256),
        "orders": (ORDERS_DERIVED, ["o_orderdate"], 128),
    }


def main() -> None:
    sf_dir = next((a for a in sys.argv[1:] if not a.startswith("--")), "/tmp/sf100")
    n = int(
        next(
            (a.split("=", 1)[1] for a in sys.argv if a.startswith("--buckets=")),
            "32",
        )
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from verax_spark.session import get_spark
    from verax_spark.sources.layout import (
        materialize_bucketed_layout,
        materialize_projection_layout,
    )

    spark = get_spark("verax-bucketize")
    spark.sparkContext.setLogLevel("WARN")
    for t, layouts in BUCKET_SPECS.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            print(f"skip {t}: {src} missing")
            continue
        for bcols, primary in layouts:
            if "--skip-existing" in sys.argv and _have_layout(src, t, bcols):
                print(f"{t} {bcols}: already materialized, skip", flush=True)
                continue
            t0 = time.perf_counter()
            tbl = materialize_bucketed_layout(
                spark, src, t, bcols, n_buckets=n, sort_cols=bcols,
                primary=primary,
            )
            print(
                f"{t} -> {tbl} ({time.perf_counter() - t0:.1f}s)", flush=True
            )
    for t, (derived, sort_cols, n_files) in _projection_specs().items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        if "--skip-existing" in sys.argv and _have_projection(
            src, t, derived, n_files
        ):
            print(f"{t} projection: already materialized, skip", flush=True)
            continue
        t0 = time.perf_counter()
        tbl = materialize_projection_layout(
            spark, src, t, derived, sort_cols=sort_cols, n_files=n_files
        )
        print(f"{t} -> {tbl} ({time.perf_counter() - t0:.1f}s)", flush=True)


def _have_layout(src: str, t: str, bcols) -> bool:
    """Registry entry exists for this (source, bucket columns) and its
    files are on disk — lets an interrupted run resume without rewriting
    completed multi-GB copies (disk-peak relief: each copy's shuffle
    stays on disk until the writing session exits)."""
    from verax_spark.sources.layout import registered_layout

    e = registered_layout(src, t, frozenset(c.lower() for c in bcols))
    return (
        e is not None
        and list(e["bucket_cols"]) == list(bcols)
        and os.path.isdir(e["location"].removeprefix("file:"))
    )


def _have_projection(src: str, t: str, derived, n_files: int) -> bool:
    from verax_spark.sources.layout import projection_covering

    e = projection_covering(src, t, derived)
    return e is not None and e.get("n_files") == n_files


if __name__ == "__main__":
    main()
