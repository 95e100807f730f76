"""Streaming operators: watermarked event-time windows, session
windows, stream dedup, stream-static joins.

The reference has NO event-time semantics (events arrive in WAL order,
postrack.go:366; no watermarks, no windows — SURVEY.md §2b) — these are
the consumer-side operators its users would hand-roll in HandleFunc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_window_counts(
    events: DataFrame, watermark: str = "1 hour", window_len: str = "1 hour"
) -> DataFrame:
    """Watermarked tumbling-window aggregation. Late rows beyond the
    watermark are dropped; state is bounded by the watermark horizon —
    the 100 TB-stream essential (unbounded state = OOM)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )
def sliding_window_counts(
    events: DataFrame,
    watermark: str = "1 hour",
    window_len: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Watermarked SLIDING windows: each event lands in
    window_len/slide overlapping windows. State per open window is
    bounded by the watermark, same as tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:00").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user (session_window merges events
    closer than `gap`)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
    )


def stream_dedup(events: DataFrame, keys: list[str], watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key only within the
    watermark horizon (vs dropDuplicates whose state grows forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_join(stream: DataFrame, static: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream ⋈ static dimension. The static side is re-planned per
    micro-batch (picks up dim updates); broadcast by Catalyst when
    small."""
    return stream.join(static, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream ⋈ stream equi+interval join: right event within
    [left_ts, left_ts + interval] for the same key. Watermarks on BOTH
    sides + the time-range condition bound the join state (without them
    Spark would buffer both streams forever — the 100 TB killer)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"interval {interval}"))
    )
    return lw.join(rw, cond).drop(rw[key])
