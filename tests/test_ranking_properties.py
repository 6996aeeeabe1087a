"""Property-based tests (hypothesis) for the distributed ranking
primitives — the building blocks every "exact global order without a
single-partition window" claim rests on (sparker_spark/ranking.py).

Each property compares against the trivially-correct single-machine
formulation on randomized inputs, including adversarial duplicates and
skew that hand-written fixtures tend to miss.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparker_spark.ranking import (
    global_cumsum,
    global_rank,
    global_topk,
    release,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=0, max_value=1_000_000),
    ),
    min_size=0,
    max_size=120,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_global_rank_matches_sorted_enumeration(spark, rows):
    # unique total order: dedupe on the full tuple
    rows = sorted(set(rows))
    df = spark.createDataFrame(rows, "a long, b long") if rows else (
        spark.createDataFrame([], "a long, b long")
    )
    ranked = global_rank(df, ["a", "b"], out="pos")
    got = {(r["a"], r["b"]): r["pos"] for r in ranked.collect()}
    release(ranked)
    want = {t: i for i, t in enumerate(rows)}
    assert got == want


@given(rows=ROWS, k=st.integers(min_value=0, max_value=150))
@settings(**_SETTINGS)
def test_global_topk_matches_sort_limit(spark, rows, k):
    rows = sorted(set(rows))
    df = spark.createDataFrame(rows, "a long, b long") if rows else (
        spark.createDataFrame([], "a long, b long")
    )
    # order: a DESC, b ASC — mixed directions exercise the range
    # partitioner's key construction
    out = global_topk(df, [("a", True), ("b", False)], k)
    got = sorted((r["a"], r["b"]) for r in out.collect())
    release(out)
    want = sorted(sorted(rows, key=lambda t: (-t[0], t[1]))[:k])
    assert got == want


@given(rows=ROWS, desc=st.booleans())
@settings(**_SETTINGS)
def test_global_cumsum_matches_running_total(spark, rows, desc):
    rows = sorted(set(rows))
    df = spark.createDataFrame(rows, "a long, b long") if rows else (
        spark.createDataFrame([], "a long, b long")
    )
    out = global_cumsum(df, ["a", "b"], value="b", out="cum", descending=desc)
    got = {(r["a"], r["b"]): r["cum"] for r in out.collect()}
    release(out)
    ordered = sorted(rows, reverse=desc)
    acc, want = 0, {}
    for a, b in ordered:
        acc += b
        want[(a, b)] = acc
    assert got == want


def test_global_topk_all_ties_single_value(spark):
    """Every row identical on the first key: the boundary partition
    must cut on the tiebreaker deterministically."""
    rows = [(7, i) for i in range(40)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = global_topk(df, [("a", True), ("b", False)], 13)
    got = sorted((r["a"], r["b"]) for r in out.collect())
    release(out)
    assert got == [(7, i) for i in range(13)]


@pytest.mark.parametrize("k", [0, 1, 39, 40, 41, 10_000])
def test_global_topk_boundary_k(spark, k):
    rows = [(i % 5, i) for i in range(40)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = global_topk(df, [("a", False), ("b", False)], k)
    got = sorted((r["a"], r["b"]) for r in out.collect())
    release(out)
    want = sorted(sorted(rows)[:k])
    assert got == want
