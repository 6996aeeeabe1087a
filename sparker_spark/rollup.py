"""Hypertable-style rollup cascade.

Multi-resolution time aggregates (minute -> hour -> day ...) where
every coarser level is computed FROM the next finer level, not from
the raw events: one scan of the raw data total, and each further level
aggregates an already-reduced relation — the continuous-aggregate
design of time-series stores. The cascade is exact for decomposable
aggregates: count and sum re-aggregate directly; avg is carried as
(sum, count) and finalized per level; min/max re-aggregate as
themselves.

Scale shape: level 1 is one shuffle over the events keyed by
(bucket, dims); every later level shuffles only the previous level's
output (rows ~ #buckets × #dims — orders of magnitude smaller). For a
streaming feed, the finest level is exactly what the watermarked
windowed aggregation in streaming/incremental.py emits; the cascade
then maintains the coarser levels from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# supported bucket widths, finest -> coarsest
_LEVELS = ["minute", "hour", "day", "week", "month"]


class RollupCascade:
    @staticmethod
    def cascade(
        events: DataFrame,
        levels: list[str],
        ts_col: str = "ts",
        value_col: str = "value",
        dims: list[str] | None = None,
    ) -> dict[str, DataFrame]:
        """Returns {level: DataFrame(bucket, *dims, n_events, sum_value,
        min_value, max_value, avg_value)} with each coarser level
        derived from the finer one. ``levels`` must be ordered finest
        first and drawn from minute/hour/day/week/month."""
        assert levels, "need at least one level"
        order = [_LEVELS.index(lv) for lv in levels]
        assert order == sorted(order), "levels must be finest -> coarsest"
        dims = dims or []

        out: dict[str, DataFrame] = {}
        prev = None
        for lv in levels:
            if prev is None:
                base = events.groupBy(
                    F.date_trunc(lv, F.col(ts_col)).alias("bucket"), *dims
                ).agg(
                    F.count("*").alias("n_events"),
                    F.sum(value_col).alias("sum_value"),
                    F.min(value_col).alias("min_value"),
                    F.max(value_col).alias("max_value"),
                )
            else:
                # re-aggregate the previous level — never the raw data
                base = RollupCascade.reaggregate(prev, lv, dims)
            prev = base
            out[lv] = base.withColumn(
                "avg_value", F.col("sum_value") / F.col("n_events")
            )
        return out

    @staticmethod
    def reaggregate(
        level: DataFrame, to_level: str, dims: list[str] | None = None
    ) -> DataFrame:
        """Roll a finer level's output (bucket, *dims, n_events,
        sum_value, min_value, max_value) up to ``to_level`` — the
        incremental-maintenance entry point when the finest level is
        produced elsewhere (e.g. the watermarked streaming windowed
        aggregation in streaming/incremental.py)."""
        dims = dims or []
        return level.groupBy(
            F.date_trunc(to_level, F.col("bucket")).alias("bucket"), *dims
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )


class SlidingWindows:
    @staticmethod
    def counts(
        events,
        window: str = "1 hour",
        slide: str = "15 minutes",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ):
        """Overlapping sliding-window counts per type — the batch twin
        of the Structured-Streaming windowed aggregation (identical
        ``F.window`` semantics, epoch-aligned): each event lands in
        window/slide overlapping windows. One explode + one hash
        aggregate; output bounded by types x windows."""
        from pyspark.sql import functions as F

        w = F.window(ts_col, window, slide)
        return (
            events.groupBy(w.alias("w"), type_col)
            .agg(F.count("*").cast("long").alias("n"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                type_col,
                "n",
            )
        )
