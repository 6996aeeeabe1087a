"""Structured Streaming extensions (beyond reference parity — the
reference has no streaming surface, SURVEY §2.11; progressive ER is its
closest concept).

Three streaming shapes a continuously-ingesting ER / training-data
pipeline needs:

  * incremental blocking: stream of profiles -> stream of
    (key, profile_id) postings, appendable to a blocks store
  * streaming exact dedup: drop already-seen content hashes with
    dropDuplicates + watermark (state TTL)
  * windowed event rollups: event-time tumbling windows + watermark

All are plain readStream->transform->writeStream graphs; the
transformations reuse the same column expressions as the batch
operators, so batch/stream parity is by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.blocking.strategies import TOKEN_SPLIT_RE


def incremental_blocking_keys(
    profile_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming token keygen: each micro-batch of profiles becomes
    (profile_id, key) postings — the incremental feed of a token-block
    store. Stateless, so it scales with input rate only."""
    return (
        profile_stream.select(
            F.col(id_col).alias("profile_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)
            ).alias("key"),
        )
        .where(F.length("key") > 0)
        .dropDuplicates(["profile_id", "key"])
    )


def streaming_exact_dedup(
    doc_stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: normalize -> hash -> dropDuplicates with
    a watermark bounding the dedup state. Documents whose normalized
    hash was seen within the watermark horizon are dropped."""
    normalized = doc_stream.withColumn(
        "text_hash",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))),
    )
    return normalized.withWatermark(ts_col, watermark).dropDuplicates(
        ["text_hash"]
    )


def windowed_event_counts(
    event_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window rollup with late-data handling —
    the streaming twin of entry.q_events_hourly."""
    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
