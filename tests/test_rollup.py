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
