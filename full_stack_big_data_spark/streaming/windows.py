"""Event-time windows + watermarks over the events stream.

The reference carries an event-time field it never uses
(``twitter.avsc:13-16``; SURVEY.md §2.5) — its only time semantics is the
batch-side interval query. These builders are the principled streaming
version: tumbling / sliding / session windows with watermark-bounded
state, which is what makes unbounded aggregation state safe at 100 TB/day
ingest (state store evicts windows older than the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def with_event_time(events: DataFrame) -> DataFrame:
    """Normalize the events stream's nanos-long ts (see catalog.py) into a
    proper event-time column, streaming-safe (no data-dependent branch)."""
    if dict(events.dtypes).get("ts") == "bigint":
        events = events.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    e = with_event_time(events).withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("events"))
        .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                "event_type", "events")
    )


def sliding_counts(events: DataFrame, width: str = "1 hour",
                   slide: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    e = with_event_time(events).withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("events"))
        .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                "event_type", "events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: a session extends while successive events
    arrive within ``gap`` of the previous one."""
    e = with_event_time(events).withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.date_format("w.start", TS_FMT + ".SSSSSS").alias("session_start"),
                F.date_format("w.end", TS_FMT + ".SSSSSS").alias("session_end"),
                "n_events")
    )
