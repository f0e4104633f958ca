"""Sessionization + event-stream operators over the `events` table.

Spark-first re-expression of the reference's phrase-gap split
(split_phrase_events, /root/reference/scripts/seed_influx.jl:442-488:
split a per-series event stream where the inter-event gap exceeds a
threshold) and highest-note collapse (collapse_to_highest_notes,
...:398-422) as lag-window sessionization and max_by aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "collapse_max_value"]


def sessionize(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Split each user's event stream into sessions at gaps ≥ gap_seconds.

    lag + cumulative-sum-of-gap-flags (the standard relational
    sessionization; one shuffle on user_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap >= gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sid = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w)
    )
    return (
        with_sid.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def collapse_max_value(events: DataFrame) -> DataFrame:
    """Per (user, event_type): the event with the max value (ties →
    earliest event_id), reference collapse-to-highest semantics."""
    return events.groupBy("user_id", "event_type").agg(
        F.max_by("event_id", F.struct(F.col("value"), (-F.col("event_id")))).alias(
            "top_event_id"
        ),
        F.round(F.max("value"), 6).alias("max_value"),
    )
