"""Streaming-native metrics (SURVEY.md §2.8 T1/T6/T7): watermarked windowed
aggregations over the change stream — the LWN-per-time-slice accounting the
reference traces (Parser.cpp:1482-1512) done as a real Structured Streaming
stateful aggregation (watermark bounds state, late events beyond it drop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window throughput per op type with an event-time watermark.

    The watermark is the streaming form of the reference's restart
    low-watermark (min open-transaction position, user-manual.adoc:148-162):
    it bounds how late an event may arrive and still be aggregated, which
    bounds state exactly like the reference bounds its transaction buffer.
    """
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("op"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.length("html")).alias("html_bytes"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op",
            "n_events",
            "html_bytes",
            "approx_urls",
        )
    )


def session_windows_per_url(
    stream: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Session windows per key (T6): bursts of changes to the same url —
    built-in session_window, state bounded by the same watermark mechanism."""
    return (
        stream.withWatermark("warc_ts", gap)
        .groupBy(F.session_window("warc_ts", gap).alias("win"), F.col("url"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "url",
            "n_events",
        )
    )
