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


def test_asof_forward_and_nearest(spark):
    import datetime as dt

    from sparker_spark.asof import AsofJoin

    t0 = dt.datetime(2026, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(10), "L10"), (1, ts(50), "L50"), (2, ts(5), "Lx")],
        "k long, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, ts(8), "R8"), (1, ts(12), "R12"), (1, ts(100), "R100")],
        "k long, ts timestamp, rv string",
    )
    fwd = {
        (r["k"], r["lv"]): r["r_rv"]
        for r in AsofJoin.asof_join(
            left, right, on="k", direction="forward"
        ).collect()
    }
    # L10 -> first right at/after t=10 is R12; L50 -> R100; k=2 -> none
    assert fwd == {(1, "L10"): "R12", (1, "L50"): "R100", (2, "Lx"): None}

    near = {
        (r["k"], r["lv"]): r["r_rv"]
        for r in AsofJoin.asof_join(
            left, right, on="k", direction="nearest"
        ).collect()
    }
    # L10: back R8 (d=2) vs fwd R12 (d=2) -> tie -> backward R8
    # L50: back R12 (d=38) vs fwd R100 (d=50) -> R12
    assert near == {(1, "L10"): "R8", (1, "L50"): "R12", (2, "Lx"): None}


def test_asof_forward_tolerance_and_same_ts(spark):
    import datetime as dt

    from sparker_spark.asof import AsofJoin

    t0 = dt.datetime(2026, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(10), "L")], "k long, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, ts(10), 1, "Rsame_a"), (1, ts(10), 2, "Rsame_b"), (1, ts(99), 3, "Rfar")],
        "k long, ts timestamp, rid long, rv string",
    )
    # same-instant right row qualifies in forward mode; greatest
    # tiebreak wins in every direction
    got = AsofJoin.asof_join(
        left, right, on="k", direction="forward", right_tiebreak="rid"
    ).collect()[0]
    assert got["r_rv"] == "Rsame_b"
    # tolerance nulls the far match
    far_left = spark.createDataFrame(
        [(1, ts(20), "L2")], "k long, ts timestamp, lv string"
    )
    got2 = AsofJoin.asof_join(
        far_left,
        right.where("rid = 3"),
        on="k",
        direction="forward",
        tolerance_us=1_000_000,
    ).collect()[0]
    assert got2["r_rv"] is None
