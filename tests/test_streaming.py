"""Structured Streaming tests: AvailableNow drain of the static events
table, cross-checked against the equivalent batch aggregation."""

import shutil

import pyspark.sql.functions as F
import pytest

from verax_spark.catalog import Catalog
from verax_spark.streaming import (
    read_events_stream,
    run_available_now,
    session_windows,
    user_running_stats,
    windowed_event_counts,
)
from verax_spark.testing import assert_frames_match


@pytest.fixture(autouse=True)
def clean_checkpoints():
    shutil.rmtree("/tmp/verax_ckpt", ignore_errors=True)
    yield


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = (
        run_available_now(windowed_event_counts(stream), "win_counts")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    events = Catalog(spark, sf_dir).events
    want = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    assert_frames_match(got, want, context="windowed_counts")


def test_session_windows_produce_rows(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_available_now(session_windows(stream), "sessions")
    assert got.count() > 0
    # session invariant: end >= start, events >= 1
    bad = got.filter(
        (F.col("session_end") < F.col("session_start")) | (F.col("n_events") < 1)
    ).count()
    assert bad == 0


def test_stateful_running_stats(spark, sf_dir):
    """applyInPandasWithState totals must equal the batch per-user totals
    after draining the whole source (state accumulates across batches; the
    memory sink keeps the latest update per user last)."""
    stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
    result = run_available_now(user_running_stats(stream), "user_stats")
    # latest emission per user = final running totals
    latest = (
        result.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
        )
        .orderBy("user_id")
        .toPandas()
    )
    events = Catalog(spark, sf_dir).events
    want = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
        .toPandas()
    )
    assert_frames_match(latest, want, context="stateful_stats")


def test_streaming_dedup_drops_injected_duplicates(spark, sf_dir):
    """Union the stream with itself → every event duplicated; streaming
    dedup must restore the original count."""
    from pyspark.sql import functions as F2

    from verax_spark.streaming import read_events_stream
    from verax_spark.streaming.pipeline import run_available_now, streaming_dedup

    stream = read_events_stream(spark, sf_dir)
    doubled = stream.unionAll(stream)
    deduped = streaming_dedup(doubled, key_cols=["event_id"])
    got = run_available_now(
        deduped.select("event_id"), "stream_dedup"
    )
    want = Catalog(spark, sf_dir).events.count()
    assert got.select(F2.countDistinct("event_id")).collect()[0][0] == want
    assert got.count() == want


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream inner interval join (watermarked both sides) must emit
    exactly the pairs the equivalent batch self-join produces."""
    from verax_spark.streaming.pipeline import stream_stream_interval_join

    def side(name_prefix):
        return read_events_stream(spark, sf_dir).select(
            F.col("user_id").alias(f"{name_prefix}_user"),
            F.col("ts").alias(f"{name_prefix}_ts"),
            F.col("event_id").alias(f"{name_prefix}_id"),
            "event_type",
        )

    views = side("v").filter(F.col("event_type") == "view").drop("event_type")
    purchases = (
        side("p").filter(F.col("event_type") == "purchase").drop("event_type")
    )
    got = (
        run_available_now(
            stream_stream_interval_join(
                views, purchases, "v_user", "p_user", "v_ts", "p_ts",
                within="2 hours", watermark="3650 days",
            ).select("v_id", "p_id"),
            "ssj_test",
            mode="append",
        )
        .orderBy("v_id", "p_id")
        .toPandas()
    )
    ev = Catalog(spark, sf_dir).events
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    want = (
        v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("interval 2 hours")),
        )
        .select("v_id", "p_id")
        .orderBy("v_id", "p_id")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert_frames_match(got, want, context="stream-stream join")
