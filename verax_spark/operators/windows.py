"""Window-frame helpers beyond Spark's native surface.

GROUPS frames (ref axiom/logical_plan/ExprApi.h WindowFrame kGroups; SQL
``GROUPS BETWEEN n PRECEDING AND m FOLLOWING``) aggregate over whole peer
groups of the ORDER BY key. Spark has ROWS and RANGE only — but a GROUPS
frame is exactly a RANGE frame over ``dense_rank`` of the ordering key:
peer group i gets dense rank i, and [rank - n, rank + m] selects complete
peer groups. Both windows share the same partitioning and ordering, so the
second pass adds NO exchange and no extra sort — one shuffle total, same as
a native frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_UNBOUNDED = object()

_AGGS = {
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "collect_list": F.collect_list,
}


def with_groups_frame(
    df: DataFrame,
    out_col: str,
    value: Column | str,
    *,
    agg: str = "sum",
    partition_by: list[str] | None = None,
    order_by: str | None = None,
    preceding: int | None = 0,
    following: int | None = 0,
) -> DataFrame:
    """Add ``out_col`` = agg(value) over a GROUPS frame.

    ``preceding``/``following`` count peer groups (None = unbounded). The
    emulation is exact for any aggregate (each peer group enters the frame
    wholly or not at all, matching the SQL standard's GROUPS semantics).
    """
    if order_by is None:
        raise ValueError("GROUPS frames require an ORDER BY key")
    parts = partition_by or []
    w_rank = Window.partitionBy(*parts).orderBy(order_by)
    lo = Window.unboundedPreceding if preceding is None else -int(preceding)
    hi = Window.unboundedFollowing if following is None else int(following)
    w_frame = (
        Window.partitionBy(*parts).orderBy("__grp").rangeBetween(lo, hi)
    )
    agg_fn = _AGGS.get(agg)
    if agg_fn is None:
        raise ValueError(f"unsupported aggregate {agg!r} (have {sorted(_AGGS)})")
    return (
        df.withColumn("__grp", F.dense_rank().over(w_rank))
        .withColumn(out_col, agg_fn(value).over(w_frame))
        .drop("__grp")
    )
