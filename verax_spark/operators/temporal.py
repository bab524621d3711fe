"""Temporal joins: as-of (nearest-preceding) and banded range joins.

The reference engine has no as-of/range/interval joins (verified in SURVEY
§2.5; ref axiom/optimizer/Optimization.cpp produces only equi/theta/cross
joins) — these are beyond-reference operators that large-scale event and
training-data pipelines need for timeline alignment (e.g. "join each label
event to the most recent feature snapshot at or before it").

Both are implemented shuffle-once and without any O(|L|·|R|) blowup:

- ``asof_join``: union-tag both sides, one window over the by-key ordered by
  time, ``last(..., ignorenulls=True)`` carries the most recent right row
  forward onto each left row. Exactly one shuffle (the window partitioning)
  over |L|+|R| rows — the distributed analog of a merge as-of join. At 100 TB
  this is one sort-shuffle; no join fanout exists at all.
- ``range_join``: equi-join on (key, time-bucket) with the left interval
  exploded to the buckets it covers (≤ ceil(len/width)+1 per row) and a
  residual BETWEEN filter. Each (left, right) match is produced exactly once
  — in the right row's bucket — so no dedup pass is needed. Catalyst sees a
  plain equi-join: shuffle-hash/SMJ on (key, bucket), never a nested-loop
  cartesian product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
    tie_break: str,
    tolerance_us: int | None = None,
    prefix: str = "asof_",
    salt_col: str | None = None,
    salt_factor: int = 8,
) -> DataFrame:
    """Backward as-of join: for each left row, attach `value_cols` from the
    most recent right row with the same by-key and ``right_ts <= left_ts``
    (inclusive). Unmatched left rows keep nulls (left-outer semantics).

    Ties among right rows at the same timestamp resolve to the largest
    `tie_break` value, deterministically (cross-engine reproducibility —
    pass a unique id column). ``tolerance_us`` bounds the lookback window:
    matches older than `left_ts - tolerance_us` microseconds are nulled.

    ``salt_col`` enables the hot-key escape: the single window partition per
    by-key serializes a pathologically hot key (zipf user at 100 TB), so
    salting splits each key's LEFT rows into ``salt_factor`` deterministic
    sub-partitions (xxhash64 of a high-cardinality left column — never
    rand(), which breaks retry idempotency) and replicates the RIGHT rows
    into every sub-partition. Each left row still sees every right row of
    its key, so results are bit-identical to the unsalted path; the cost is
    ``salt_factor``× the (usually far smaller) right side.
    """
    if tie_break not in value_cols:
        value_cols = [*value_cols, tie_break]
    lcols = left.columns
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    ts_type = rtypes[right_ts]

    if salt_col is None:
        lsalt = F.lit(0)
        rsalt = F.lit(0)
    else:
        lsalt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_factor))
        rsalt = F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))

    tagged_left = left.select(
        F.col(left_by).alias("__by"),
        lsalt.alias("__salt"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtypes[tie_break]).alias("__tie"),
        F.lit(None).cast(ts_type).alias("__rts"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = (
        right.filter(F.col(right_by).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(right_by).alias("__by"),
            rsalt.alias("__salt"),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.col(tie_break).alias("__tie"),
            F.col(right_ts).alias("__rts"),
            *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
            *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        )
    )
    # Right rows sort before left rows at equal ts (__side 0 < 1) → the match
    # is inclusive; among equal right timestamps the largest tie_break wins.
    w = (
        Window.partitionBy("__by", "__salt")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        F.last("__rts", ignorenulls=True).over(w).alias("__mts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1)
    in_window = F.col("__mts").isNotNull()
    if tolerance_us is not None:
        in_window = in_window & (
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__mts"))
            <= F.lit(int(tolerance_us))
        )
    return out.select(
        *lcols,
        *[
            F.when(in_window, F.col(f"__m_{c}")).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_seconds: int,
) -> DataFrame:
    """Inner interval join: rows where ``left_key = right_key`` and
    ``left_start <= right_ts <= left_end`` (inclusive both ends).

    `bucket_seconds` should be on the order of the typical interval length:
    each left row is replicated to ceil(interval/bucket)+1 buckets, each
    right row hashes to exactly one, and the equi-join on (key, bucket)
    bounds candidate pairs to same-bucket rows. Output columns: all left
    columns then all right columns (names must not collide).
    """
    width_us = int(bucket_seconds) * 1_000_000
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(left_start)) / width_us),
                F.floor(F.unix_micros(F.col(left_end)) / width_us),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket", F.floor(F.unix_micros(F.col(right_ts)) / width_us)
    )
    joined = lb.join(
        rb,
        (lb["__bucket"] == rb["__bucket"])
        & (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_start))
        & (F.col(right_ts) <= F.col(left_end)),
        "inner",
    )
    return joined.select(*left.columns, *right.columns)
