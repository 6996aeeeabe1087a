"""Model-check the event-analytics operators (funnel, transitions,
retention) against pure-Python sequential oracles on randomized event
logs — any disagreement between the distributed plan and the model is
a bug in one of them."""

import datetime as dt
import random
from collections import Counter, defaultdict

import pytest

from sparker_spark.funnel import Funnel, Retention, Transitions

T0 = dt.datetime(2026, 3, 1)
TYPES = ["view", "click", "signup", "purchase", "error"]


def _rand_events(rng, n_users=25, max_events=15):
    rows = []
    eid = 0
    for u in range(n_users):
        for _ in range(rng.randint(0, max_events)):
            rows.append(
                (
                    eid,
                    u,
                    T0 + dt.timedelta(minutes=rng.randint(0, 5000)),
                    rng.choice(TYPES),
                )
            )
            eid += 1
    return rows


def _model_funnel(rows, steps):
    by_user = defaultdict(list)
    for eid, u, ts, et in rows:
        by_user[u].append((ts, eid, et))
    counts = Counter()
    for u, evs in by_user.items():
        evs.sort()
        prev_t = None
        for i, step in enumerate(steps):
            qual = [
                t
                for t, _, et in evs
                if et == step and (prev_t is None or t > prev_t)
            ]
            if not qual:
                break
            prev_t = min(qual)
            counts[i + 1] += 1
    return counts


def _model_transitions(rows):
    by_user = defaultdict(list)
    for eid, u, ts, et in rows:
        by_user[u].append((ts, eid, et))
    counts = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    return counts


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_funnel_matches_model(spark, seed):
    rng = random.Random(seed)
    rows = _rand_events(rng)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    steps = ["view", "click", "purchase"]
    got = {
        r["step"]: r["n_users"]
        for r in Funnel.conversion(ev, steps).collect()
    }
    want = _model_funnel(rows, steps)
    assert got == {i + 1: want.get(i + 1, 0) for i in range(len(steps))}


@pytest.mark.parametrize("seed", [3, 11])
def test_transitions_match_model(spark, seed):
    rng = random.Random(seed)
    rows = _rand_events(rng)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in Transitions.event_transitions(ev).collect()
    }
    want = dict(_model_transitions(rows))
    assert got == want
    # probabilities are row-normalized
    by_from = defaultdict(float)
    for r in Transitions.event_transitions(ev).collect():
        by_from[r["from_type"]] += r["p"]
    for total in by_from.values():
        assert total == pytest.approx(1.0, abs=1e-4)


@pytest.mark.parametrize("seed", [5])
def test_retention_matches_model(spark, seed):
    rng = random.Random(seed)
    rows = _rand_events(rng)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    first = {}
    active = set()
    for _, u, ts, _ in rows:
        d = ts.date()
        first[u] = min(first.get(u, d), d)
        active.add((u, d))
    want = Counter()
    for u, d in active:
        want[(first[u].isoformat(), (d - first[u]).days)] += 1
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in Retention.cohorts(ev).collect()
    }
    assert got == dict(want)
