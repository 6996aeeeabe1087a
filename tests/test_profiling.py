"""Attribute profiling summary against a hand-computed fixture."""

import math

from sparker_spark.profiling import AttributeProfile


def test_summary_hand_fixture(spark):
    rows = [
        (1, 0, "name", "alice"),
        (2, 0, "name", "bob"),
        (3, 0, "name", "alice"),
        (1, 0, "city", "x"),
        (2, 0, "city", "x"),
        (3, 0, "city", "x"),
        (4, 0, "city", None),   # dropped
        (5, 0, "city", "  "),   # blank: dropped
    ]
    eav = spark.createDataFrame(
        rows, "profile_id long, source_id int, attr string, value string"
    )
    out = {
        (r["source_id"], r["attr"]): r
        for r in AttributeProfile.summary(eav).collect()
    }
    name = out[(0, "name")]
    assert name["n_values"] == 3 and name["n_distinct"] == 2
    assert abs(name["avg_len"] - (5 + 3 + 5) / 3) < 1e-6
    # H = log2(3) - (2*log2(2) + 1*log2(1))/3
    assert abs(name["entropy"] - (math.log2(3) - 2 / 3)) < 1e-6
    city = out[(0, "city")]
    assert city["n_values"] == 3 and city["n_distinct"] == 1
    assert city["entropy"] == 0.0  # constant attribute: zero entropy
