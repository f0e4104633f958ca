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

__all__ = ["sessionize", "collapse_max_value", "split_phrases"]


def split_phrases(tokens_df: DataFrame, jump_threshold: int = 12) -> DataFrame:
    """Split each token series into phrases at large value jumps.

    Token-domain analogue of the reference's phrase-gap split
    (split_phrase_events, /root/reference/scripts/seed_influx.jl:442-488:
    a new phrase starts where the inter-event gap exceeds a threshold).
    Entirely narrow — the phrase boundary flags and their running count
    (a per-row prefix scan) are computed inside the token array with
    native expressions, so no explode/shuffle/window is needed.
    Emits (doc_id, phrase_idx, phrase, phrase_len)."""
    toks = F.col("tokens")
    n = F.size(toks)
    # 0-based positions where a new phrase begins (position i starts a
    # phrase iff |tokens[i] - tokens[i-1]| >= threshold)
    # (sequence(1, 0) would count DOWN — guard single-token docs)
    bpos = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.abs(F.element_at(toks, i + 1) - F.element_at(toks, i))
            >= jump_threshold,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(0)), bpos)
    ends = F.concat(bpos, F.array(n))
    phrases = F.zip_with(starts, ends, lambda s, e: F.slice(toks, s + 1, e - s))
    return tokens_df.filter(n > 0).select(
        "doc_id",
        F.posexplode(phrases).alias("phrase_idx", "phrase"),
    ).withColumn("phrase_len", F.size("phrase"))


def sessionize(events: DataFrame, gap_seconds: int = 3600) -> DataFrame:
    """Split each user's event stream into sessions at gaps ≥ gap_seconds.

    lag + cumulative-sum-of-gap-flags (the standard relational
    sessionization; one shuffle on user_id).  NULL timestamps follow the
    SQL oracle exactly: they sort last (DuckDB's ASC default) and only a
    NULL *lagged* epoch opens a session — a row's own NULL ts yields a
    NULL gap, which is not >= the threshold."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    epoch = F.col("ts").cast("timestamp").cast("long")
    lag_epoch = F.lag(epoch).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(lag_epoch.isNull(), F.lit(1))
        .when(epoch - lag_epoch >= gap_seconds, F.lit(1))
        .otherwise(F.lit(0)),
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
