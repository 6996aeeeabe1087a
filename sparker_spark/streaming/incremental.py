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


def streaming_sessionize(
    event_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    an inactivity gap, via ``applyInPandasWithState`` (the streaming
    twin of entry.q_events_sessionize).

    State per user = the open session (start, last event, count, value
    sum) as int64 microseconds; a session closes and is emitted either
    when a later event arrives more than ``gap`` after the last one, or
    when the event-time watermark passes last+gap (timeout path — this
    is what a windowed agg cannot express: the session length is
    data-dependent, not a fixed tumbling window).

    Output: (user_id, session_start, session_end, n_events,
    total_value), append mode.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = _duration_us(gap)

    out_schema = (
        f"{user_col} long, session_start timestamp, session_end timestamp,"
        " n_events long, total_value double"
    )
    state_schema = "start long, last long, n long, total double"

    def _emit(user, start, last, n, total):
        return pd.DataFrame(
            {
                user_col: [user],
                "session_start": [pd.to_datetime(start, unit="us")],
                "session_end": [pd.to_datetime(last, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def sessionize(key, pdfs, state):
        (user,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                yield _emit(user, start, last, n, total)
            state.remove()
            return
        frames = [pdf for pdf in pdfs]
        rows = pd.concat(frames) if len(frames) > 1 else frames[0]
        rows = rows.sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000
        vals = rows["value"].astype("float64")
        if state.exists:
            start, last, n, total = state.get
        else:
            start = None
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start is None:
                start, last, n, total = t, t, 1, float(v)
            elif t - last > gap_us:
                yield _emit(user, start, last, n, total)
                start, last, n, total = t, t, 1, float(v)
            else:
                last, n, total = t, n + 1, total + float(v)
        state.update((start, last, n, total))
        # event-time timeout at last + gap: fires once the watermark
        # passes it, closing the session without further events
        state.setTimeoutTimestamp((last + gap_us) // 1000)

    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            sessionize,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_us(spec: str) -> int:
    """'30 minutes' -> microseconds (same unit strings Spark accepts)."""
    n, unit = spec.split()
    mult = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(n) * mult
