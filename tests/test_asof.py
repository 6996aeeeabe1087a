"""Tests for the distributed as-of join (sparker_spark/asof.py)."""

from pyspark.sql import functions as F

from sparker_spark.asof import AsofJoin


def _ts(s):
    return F.to_timestamp(F.lit(s))


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_asof_basic_latest_prior(spark):
    left = _mk(
        spark,
        [(1, 100, "2024-01-01 10:00:05"), (1, 101, "2024-01-01 10:00:20")],
        "user_id long, event_id long, ts string",
    )
    right = _mk(
        spark,
        [
            (1, 7, "2024-01-01 10:00:00"),
            (1, 8, "2024-01-01 10:00:10"),
            (1, 9, "2024-01-01 10:00:30"),
        ],
        "user_id long, event_id long, ts string",
    )
    out = {
        r["event_id"]: r["r_event_id"]
        for r in AsofJoin.asof_join(left, right, on="user_id").collect()
    }
    assert out == {100: 7, 101: 8}  # never the future row 9


def test_asof_equal_ts_matches_and_tiebreak(spark):
    left = _mk(
        spark,
        [(1, 100, "2024-01-01 10:00:10")],
        "user_id long, event_id long, ts string",
    )
    right = _mk(
        spark,
        [(1, 7, "2024-01-01 10:00:10"), (1, 9, "2024-01-01 10:00:10")],
        "user_id long, event_id long, ts string",
    )
    out = AsofJoin.asof_join(
        left, right, on="user_id", right_tiebreak="event_id"
    ).collect()
    # equal timestamp matches; greatest tiebreak wins deterministically
    assert out[0]["r_event_id"] == 9


def test_asof_no_match_is_null_and_key_isolation(spark):
    left = _mk(
        spark,
        [(1, 100, "2024-01-01 10:00:00"), (2, 200, "2024-01-01 11:00:00")],
        "user_id long, event_id long, ts string",
    )
    right = _mk(
        spark,
        [(2, 7, "2024-01-01 10:59:00")],
        "user_id long, event_id long, ts string",
    )
    out = {
        r["event_id"]: r["r_event_id"]
        for r in AsofJoin.asof_join(left, right, on="user_id").collect()
    }
    # user 1 has no view at all; user 2's view must not leak to user 1
    assert out == {100: None, 200: 7}


def test_asof_matches_naive_on_random_data(spark):
    """Union+window rewrite must equal the brute-force per-row scan on
    random data with duplicate timestamps across keys."""
    import random

    rng = random.Random(11)
    lrows = [
        (rng.randrange(4), 100 + i, rng.randrange(0, 50))
        for i in range(40)
    ]
    rrows = [
        (rng.randrange(4), 500 + i, rng.randrange(0, 50))
        for i in range(40)
    ]
    left = spark.createDataFrame(lrows, "k long, lid long, t long").withColumn(
        "ts", F.timestamp_micros("t")
    )
    right = spark.createDataFrame(rrows, "k long, rid long, t long").withColumn(
        "ts", F.timestamp_micros("t")
    )
    got = {
        r["lid"]: r["r_rid"]
        for r in AsofJoin.asof_join(
            left, right, on="k", right_tiebreak="rid"
        ).collect()
    }
    want = {}
    for lk, lid, lt in lrows:
        best = None
        for rk, rid, rt in rrows:
            if rk == lk and rt <= lt and (
                best is None or (rt, rid) > (best[0], best[1])
            ):
                best = (rt, rid)
        want[lid] = best[1] if best else None
    assert got == want


def test_asof_tolerance(spark):
    left = _mk(
        spark,
        [(1, 100, "2024-01-01 10:00:10"), (1, 101, "2024-01-01 10:05:00")],
        "user_id long, event_id long, ts string",
    )
    right = _mk(
        spark,
        [(1, 7, "2024-01-01 10:00:00")],
        "user_id long, event_id long, ts string",
    )
    out = {
        r["event_id"]: r["r_event_id"]
        for r in AsofJoin.asof_join(
            left, right, on="user_id", tolerance_us=60_000_000
        ).collect()
    }
    # 10s-old match kept; 5min-old match nulled by the 60s tolerance
    assert out == {100: 7, 101: None}
