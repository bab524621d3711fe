"""Sequence packing for LLM pretraining: concat-and-chunk.

The standard pretraining data layout concatenates document token streams in
a deterministic order and cuts the stream into fixed-capacity context
windows ("packs"); a document can straddle pack boundaries. This is pure
window arithmetic — a per-shard running token offset and integer division —
so it runs as one shuffle (by shard) + one sort, no UDFs, and scales
linearly: each shard packs independently, exactly how a 100 TB corpus is
packed across workers in practice.

Beyond-reference operator (the reference has no training-data surface);
part of the LLM-data-pipeline suite alongside dedup/quality/tokenize.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def pack_sequences(
    df: DataFrame,
    token_count_col: Column,
    id_col: str,
    *,
    capacity: int,
    n_shards: int | None = None,
) -> DataFrame:
    """Assign each document its pack spans.

    Documents are ordered by ``id_col`` within ``pmod(id, n_shards)``
    shards; each shard's token stream is chunked into ``capacity``-token
    packs. Returns one row per (document, pack) span:

    ``(id, shard, pack_id, pack_offset, tokens_in_pack)``

    where ``pack_offset`` is the document's start position inside the pack.
    Zero-token documents produce no rows (they occupy no stream space).

    ``n_shards`` defaults to the input's partition count: the running-offset
    window shuffles by shard, so a single shard would funnel the whole corpus
    through one partition — each shard packs independently, which is how a
    100 TB corpus parallelizes. Pass ``n_shards=1`` explicitly only when one
    globally contiguous stream is required.
    """
    if n_shards is None:
        n_shards = max(df.rdd.getNumPartitions(), 1)
    n = token_count_col.cast("long")
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    based = df.select(
        F.col(id_col),
        shard.alias("shard"),
        n.alias("__n"),
    ).withColumn("__start", F.coalesce(F.sum("__n").over(w), F.lit(0)).cast("long"))
    spans = (
        based.filter(F.col("__n") > 0)
        .withColumn("__end", F.col("__start") + F.col("__n"))
        .withColumn(
            "pack_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__start") / capacity),
                    F.floor((F.col("__end") - 1) / capacity),
                )
            ),
        )
    )
    pack_start = F.col("pack_id") * capacity
    return spans.select(
        id_col,
        "shard",
        F.col("pack_id").cast("long"),
        F.greatest(F.col("__start") - pack_start, F.lit(0))
        .cast("long")
        .alias("pack_offset"),
        (
            F.least(F.col("__end"), pack_start + capacity)
            - F.greatest(F.col("__start"), pack_start)
        )
        .cast("long")
        .alias("tokens_in_pack"),
    )
