"""Tests for the banded range join (sparker_spark/rangejoin.py)."""

import random

from pyspark.sql import functions as F

from sparker_spark.rangejoin import RangeJoin


def test_range_join_matches_naive(spark):
    """Banded rewrite must equal the naive cross-join filter on random
    data with values clustered to hit bucket boundaries."""
    rng = random.Random(7)
    lrows = [(rng.randrange(3), i, rng.uniform(0, 20)) for i in range(60)]
    rrows = [(rng.randrange(3), 1000 + i, rng.uniform(0, 20)) for i in range(60)]
    left = spark.createDataFrame(lrows, "k long, lid long, val double")
    right = spark.createDataFrame(rrows, "k long, rid long, val double")
    radius = 1.5

    got = {
        (r["k"], r["lid"], r["r_rid"])
        for r in RangeJoin.within(left, right, on="k", radius=radius).collect()
    }
    want = {
        (lk, lid, rid)
        for lk, lid, lv in lrows
        for rk, rid, rv in rrows
        if lk == rk and abs(lv - rv) <= radius
    }
    assert got == want
    assert len(want) > 0


def test_range_join_boundary_inclusive_and_negative_values(spark):
    left = spark.createDataFrame(
        [(1, 0, -2.0), (1, 1, 0.0)], "k long, lid long, val double"
    )
    right = spark.createDataFrame(
        [(1, 10, -3.0), (1, 11, 1.0), (2, 12, 0.0)],
        "k long, rid long, val double",
    )
    got = {
        (r["lid"], r["r_rid"])
        for r in RangeJoin.within(left, right, on="k", radius=1.0).collect()
    }
    # -2.0 matches -3.0 (|d|=1.0 inclusive, negative bucket edge);
    # 0.0 matches 1.0; key 2 never leaks
    assert got == {(0, 10), (1, 11)}
