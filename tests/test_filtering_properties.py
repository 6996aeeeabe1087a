"""Property-based tests for block filtering's two tie semantics —
the subtlest parity surface in the engine (Python reference:
tie-inclusive cutoff with half-even rounding, filters.py:75-89; Scala:
exact truncation with half-up rounding, BlockFiltering.scala:28-39).
Randomized profile/block sets with heavy comparison-count ties are
checked against a direct Python model of each rule.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparker_spark.filters import BlockFiltering

PB = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),   # profile_id
        st.integers(min_value=0, max_value=30),  # block_id
        st.integers(min_value=1, max_value=4),   # comparisons (ties!)
    ),
    min_size=1,
    max_size=60,
)
R = st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.8, 1.0])

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _round_half_even(x: float) -> int:
    frac = x - math.floor(x)
    if frac == 0.5:
        f = int(math.floor(x))
        return f if f % 2 == 0 else f + 1
    return int(math.floor(x + 0.5)) if frac > 0.5 else (
        int(math.floor(x)) if frac < 0.5 else int(x)
    )


def _model(rows, r, tie_inclusive):
    by_profile = {}
    for pid, bid, comp in rows:
        by_profile.setdefault(pid, []).append((comp, bid))
    keep = set()
    for pid, blocks in by_profile.items():
        blocks.sort()
        n = len(blocks)
        if tie_inclusive:
            idx0 = _round_half_even(n * r)
            idx = min(max(idx0 - 1, 0), n - 1)
            cutoff = blocks[idx][0]
            keep |= {(pid, bid) for comp, bid in blocks if comp <= cutoff}
        else:
            k = int(math.floor(n * r + 0.5))
            keep |= {(pid, bid) for comp, bid in blocks[:k]}
    return keep


@given(rows=PB, r=R, tie_inclusive=st.booleans())
@settings(**_SETTINGS)
def test_block_filtering_matches_model(spark, rows, r, tie_inclusive):
    # dedupe (profile, block); one comparisons value per block
    comp_of = {}
    for pid, bid, comp in rows:
        comp_of[bid] = comp
    uniq = sorted({(pid, bid) for pid, bid, _ in rows})
    data = [(pid, 0, bid, comp_of[bid]) for pid, bid in uniq]
    df = spark.createDataFrame(
        data, "profile_id long, source_id int, block_id long, comparisons long"
    )
    out = BlockFiltering.block_filtering(df, r, tie_inclusive=tie_inclusive)
    got = {(row["profile_id"], row["block_id"]) for row in out.collect()}
    want = _model(
        [(pid, bid, comp_of[bid]) for pid, bid in uniq], r, tie_inclusive
    )
    assert got == want
