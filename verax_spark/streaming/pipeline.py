"""Structured Streaming ingestion for the events table.

The reference is a batch-only planner — no watermarks, windows-over-time, or
stateful operators anywhere in axiom/ (SURVEY §0, verified) — so this module
is a beyond-reference extension: the streaming half a training-data pipeline
needs, built on Structured Streaming so the same DataFrame expressions the
batch operators use run incrementally.

Scale design: file-source streams are the 100 TB-friendly pattern
(landing-zone parquet → incremental triggers; maxFilesPerTrigger bounds
per-batch work); watermarks bound state for late data; session windows and
applyInPandasWithState cover the custom-stateful-operator escape hatch.
Tests drive everything with Trigger.AvailableNow over the static testdata —
deterministic, no timing dependence — and cross-check stream results against
the equivalent batch aggregation.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    DoubleType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # legacy nanos layout (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, sf_dir: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet, with the same timestamp
    normalization the batch catalog applies (parquet TIMESTAMP micros or the
    legacy nanos-as-int64 layout — a streaming source needs an explicit
    schema, so probe the footer once via a batch read)."""
    from pyspark.sql.types import TimestampNTZType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField(
                "ts",
                LongType() if isinstance(ts_type, LongType) else TimestampNTZType(),
            ),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    reader = (
        spark.readStream.schema(schema)
        .format("parquet")
        # the streaming file source wants a directory: watch sf_dir and
        # select just the events file (a landing zone would be a real dir)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(sf_dir)
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with a watermark bounding late-data state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


def session_windows(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based), the streaming analog of
    sessionization in training-data pipelines."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user running
    event count + value sum, emitted per micro-batch (update mode). The
    reference has no stateful-op surface; this is the Spark-native escape
    hatch for operators windows/aggs can't express."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id bigint, n_events bigint, total_value double"
    state_schema = "n bigint, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    *,
    mode: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain the whole source with Trigger.AvailableNow into a memory sink
    and return the materialized result — deterministic harness for tests
    and the driver.

    Each call gets a fresh checkpoint (uuid component): the memory-sink drain
    is always a full recomputation, and a reused checkpoint would replay
    committed offsets and return an empty/stale table on the second call.

    ``state_partitions`` pins the stateful operator's partition count for
    THIS query (captured at first batch from spark.sql.shuffle.partitions
    and baked into the checkpoint forever — the same knob as Flink's max
    parallelism). Stateful ops pay per-partition state-store setup every
    micro-batch, so a small drain with the session's 32 shuffle partitions
    spends its wall clock opening 32 stores per side; a production stream
    sizes this to its key cardinality instead. None = session default.
    """
    import uuid

    spark = stream_df.sparkSession
    ckpt = f"/tmp/verax_ckpt/{query_name}_{os.getpid()}_{uuid.uuid4().hex[:12]}"
    conf = spark.conf
    saved = conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(mode or _output_mode(stream_df))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            conf.set("spark.sql.shuffle.partitions", saved)
    return spark.table(query_name)


def _output_mode(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()
    if "session_window" in plan:
        # session-window aggs only support append (finalized sessions emit
        # once the watermark passes them)
        return "append"
    if "FlatMapGroupsInPandasWithState" in plan or "Aggregate" in plan:
        return "update"
    return "append"


def streaming_dedup(
    events: DataFrame, *, key_cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys within the watermark window
    (state is bounded by the watermark — the streaming analog of the batch
    exact_dedup operator, and the standard first stage of a streaming
    ingestion pipeline)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    *,
    within: str = "1 hour",
    watermark: str = "24 hours",
) -> DataFrame:
    """Stream-stream inner interval join: right rows whose event time falls
    in [left_ts, left_ts + within], per key. Both sides carry watermarks and
    the join condition carries the time bound, so each side's join state is
    evicted once the other side's watermark passes ts + within — bounded
    state at any stream length (the production shape for joining two 100 TB
    event streams). Column names must already be disjoint (rename before
    calling)."""
    l = left.withWatermark(ts_left, watermark)
    r = right.withWatermark(ts_right, watermark)
    cond = (
        (F.col(key_left) == F.col(key_right))
        & (F.col(ts_right) >= F.col(ts_left))
        & (F.col(ts_right) <= F.col(ts_left) + F.expr(f"interval {within}"))
    )
    return l.join(r, cond)


def enriched_windowed_totals(
    events: DataFrame,
    dim: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment join + windowed aggregation: each micro-batch
    joins the (broadcast) static dimension — no stream-side state beyond the
    windowed agg, the standard shape for joining a 100 TB event stream to a
    bounded dimension table."""
    joined = events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"], "inner"
    )
    return (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(
            F.col("w.start").alias("window_start"), "c_mktsegment", "n", "total"
        )
    )
