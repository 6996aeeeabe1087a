"""Tests for the rollup cascade: coarse-from-fine must equal
coarse-from-raw (the invariant that makes continuous aggregates
trustworthy)."""

from pyspark.sql import functions as F

from sparker_spark.rollup import RollupCascade


def _events(spark, sf_dir):
    from sparker_spark.entry import _load_events

    return _load_events(spark, sf_dir)


def test_cascade_matches_direct_aggregation(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = RollupCascade.cascade(
        ev, ["minute", "hour", "day"], dims=["event_type"]
    )

    def canon(df):
        return {
            (str(r["bucket"]), r["event_type"]): (
                r["n_events"],
                round(r["sum_value"], 6),
                round(r["min_value"], 6),
                round(r["max_value"], 6),
            )
            for r in df.collect()
        }

    for lv in ["hour", "day"]:
        direct = ev.groupBy(
            F.date_trunc(lv, "ts").alias("bucket"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        assert canon(out[lv]) == canon(direct), lv

    # row counts strictly shrink up the cascade
    assert out["minute"].count() >= out["hour"].count() >= out["day"].count()


def test_cascade_rejects_wrong_order(spark, sf_dir):
    import pytest

    ev = _events(spark, sf_dir)
    with pytest.raises(AssertionError):
        RollupCascade.cascade(ev, ["day", "minute"])


def test_streaming_feed_composes_with_cascade(spark, sf_dir, tmp_path):
    """The continuous-aggregate deployment shape: a streaming windowed
    aggregation maintains the finest (hourly) level; the batch cascade
    rolls it up to days. The composed result must equal aggregating
    the raw events directly at day granularity."""
    from pyspark.sql import functions as F

    from sparker_spark.streaming.incremental import windowed_event_counts

    ev = _events(spark, sf_dir)
    src = tmp_path / "events_feed"
    ev.select("event_id", "ts", "user_id", "event_type", "value").write.parquet(
        str(src)
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(str(src))
    hourly = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        hourly.writeStream.format("memory")
        .queryName("hourly_feed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    fine = spark.sql(
        "SELECT window_start AS bucket, event_type, n_events, sum_value,"
        " sum_value AS min_value, sum_value AS max_value FROM hourly_feed"
    )
    daily = RollupCascade.reaggregate(fine, "day", dims=["event_type"])
    # append-mode emission is gated on the watermark passing a window's
    # end, so hours within the watermark horizon of the stream's final
    # event never emit — the last day is structurally incomplete.
    # Compare only fully-emitted days.
    last_day = str(
        ev.agg(F.date_trunc("day", F.max("ts")).alias("d")).first()["d"]
    )
    got = {
        (str(r["bucket"]), r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in daily.collect()
        if str(r["bucket"]) < last_day
    }
    want = {
        (str(r["bucket"]), r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
        if str(r["bucket"]) < last_day
    }
    assert got == want
    assert len(got) > 0
