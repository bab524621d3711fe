from verax_spark.streaming.pipeline import (
    streaming_dedup,
    read_events_stream,
    run_available_now,
    session_windows,
    user_running_stats,
    windowed_event_counts,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "session_windows",
    "user_running_stats",
    "run_available_now",
    "streaming_dedup",
]
