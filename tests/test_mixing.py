"""Token-budget corpus mixing (sparker_spark/llm/mixing.py)."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.mixing import MixPlanner, _normalized


def _docs(spark):
    # src a: 4 docs x 10 tokens; src b: 2 docs x 20 tokens;
    # src c: 1 doc x 30 tokens (excluded from weights below)
    rows = []
    i = 0
    for _ in range(4):
        rows.append((i, " ".join(["w"] * 10), "a")); i += 1
    for _ in range(2):
        rows.append((i, " ".join(["w"] * 20), "b")); i += 1
    rows.append((i, " ".join(["w"] * 30), "c"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_budget_plan_targets_caps_and_exclusion(spark):
    plan = {
        r["source"]: r
        for r in MixPlanner.budget_plan(
            _docs(spark), {"a": 3.0, "b": 1.0}, 40
        ).collect()
    }
    # weights normalize 0.75/0.25 -> targets 30/10 of budget 40
    assert plan["a"]["available_tokens"] == 40
    assert plan["a"]["target_tokens"] == 30.0
    assert plan["a"]["rate"] == 0.75
    assert plan["b"]["available_tokens"] == 40
    assert plan["b"]["rate"] == 0.25
    # source absent from the weights: rate 0 (excluded)
    assert plan["c"]["rate"] == 0.0
    # over-asked source caps at 1.0
    plan2 = {
        r["source"]: r["rate"]
        for r in MixPlanner.budget_plan(
            _docs(spark), {"a": 1.0}, 10_000
        ).collect()
    }
    assert plan2["a"] == 1.0


def test_sample_respects_rates_and_is_deterministic(spark):
    docs = _docs(spark)
    s1 = MixPlanner.sample_to_budget(docs, {"a": 3.0, "b": 1.0}, 40, seed=5)
    s2 = MixPlanner.sample_to_budget(docs, {"a": 3.0, "b": 1.0}, 40, seed=5)
    r1 = sorted(tuple(r) for r in s1.collect())
    assert r1 == sorted(tuple(r) for r in s2.collect())
    # rate-1.0 source keeps everything
    full = MixPlanner.sample_to_budget(docs, {"b": 1.0}, 10_000, seed=5)
    assert {r["doc_id"] for r in full.collect()} == {4, 5}
    # excluded source contributes nothing
    assert all(r["source"] != "c" for r in s1.collect())


def test_realized_mix_accounting(spark):
    docs = _docs(spark)
    sampled = MixPlanner.sample_to_budget(docs, {"a": 1.0}, 10_000)
    mix = MixPlanner.realized_mix(sampled).collect()
    assert len(mix) == 1
    assert mix[0]["source"] == "a"
    assert mix[0]["sampled_docs"] == 4
    assert mix[0]["sampled_tokens"] == 40


def test_weight_validation():
    with pytest.raises(ValueError, match="non-empty"):
        _normalized({})
    with pytest.raises(ValueError, match="non-negative"):
        _normalized({"a": -1.0})
    with pytest.raises(ValueError, match="positive"):
        _normalized({"a": 0.0})
    assert _normalized({"a": 1, "b": 3}) == {"a": 0.25, "b": 0.75}


def test_counts_col_passthrough(spark):
    docs = _docs(spark).withColumn("n_bpe", F.lit(7).cast("long"))
    plan = {
        r["source"]: r["available_tokens"]
        for r in MixPlanner.budget_plan(
            docs, {"a": 1.0, "b": 1.0}, 20, counts_col="n_bpe"
        ).collect()
    }
    assert plan["a"] == 28 and plan["b"] == 14


# ------------------------------------------------- renormalization


def _brute_water_fill(totals, wn, budget, eps=1e-9):
    """Independent check: iterate cap-and-redistribute to a fixed
    point (the textbook formulation the closed form solves)."""
    capped = set()
    while True:
        w_un = sum(wn[s] for s, a in totals if s not in capped and wn.get(s, 0) > 0)
        if w_un <= 0:
            break
        b_rem = budget - sum(a for s, a in totals if s in capped)
        theta = b_rem / w_un
        newly = {
            s
            for s, a in totals
            if s not in capped and wn.get(s, 0) > 0 and a / wn[s] < theta
        }
        if not newly:
            return theta, capped
        capped |= newly
    return None, capped


def test_water_fill_matches_brute_force():
    import random

    for seed in range(200):
        rng = random.Random(seed)
        n = rng.randint(1, 8)
        totals = sorted(
            (f"s{i}", rng.randint(0, 500)) for i in range(n)
        )
        weights = {s: float(rng.randint(0, 4)) for s, _ in totals}
        if sum(weights.values()) <= 0:
            weights[totals[0][0]] = 1.0
        budget = rng.randint(1, 1200)
        wn = _normalized(weights)
        out = MixPlanner._water_fill(totals, wn, budget)
        theta, capped = _brute_water_fill(totals, wn, budget)
        total_avail_w = sum(a for s, a in totals if wn.get(s, 0) > 0)
        for s, a in totals:
            t, r = out[s]
            if wn.get(s, 0.0) <= 0 or a == 0:
                assert (t, r) == (0.0, 0.0)
            elif theta is None or budget >= total_avail_w:
                # budget >= supply: everything capped
                assert r == 1.0 and t == float(a)
            elif s in capped or a / wn[s] < theta - 1e-6:
                assert r == 1.0 and t == float(a), (seed, s, out, theta)
            else:
                assert abs(t - theta * wn[s]) < 1e-6 * max(1.0, t)
                assert 0.0 < r <= 1.0
        # feasible case: renormalized targets sum to the budget
        if theta is not None and budget < total_avail_w:
            got = sum(out[s][0] for s, _ in totals)
            assert abs(got - budget) < 1e-6 * budget, (seed, got, budget)


def test_budget_plan_renormalize(spark):
    docs = _docs(spark)
    # under-supplied fixture: weights a:3 b:1, budget 60 -> raw
    # targets 45/15; src a has only 40 avail (capped), so water-fill
    # gives a all 40 and b the remaining 20 (rate 0.5)
    plan = {
        r["source"]: r
        for r in MixPlanner.budget_plan(
            docs, {"a": 3.0, "b": 1.0}, 60, renormalize=True
        ).collect()
    }
    assert plan["a"]["rate"] == 1.0  # raw target 45 > avail 40: capped
    assert plan["a"]["renorm_rate"] == 1.0
    assert abs(plan["a"]["renorm_target_tokens"] - 40.0) < 1e-9
    assert abs(plan["b"]["renorm_target_tokens"] - 20.0) < 1e-6
    assert abs(plan["b"]["renorm_rate"] - 0.5) < 1e-6
    assert plan["c"]["renorm_rate"] == 0.0  # not in weights
    # raw columns unchanged vs the non-renormalized plan
    raw = {
        r["source"]: r
        for r in MixPlanner.budget_plan(
            docs, {"a": 3.0, "b": 1.0}, 60
        ).collect()
    }
    for s in raw:
        assert raw[s]["rate"] == plan[s]["rate"]
        assert raw[s]["target_tokens"] == plan[s]["target_tokens"]


def test_sample_to_budget_renormalized(spark):
    docs = _docs(spark)
    sampled = MixPlanner.sample_to_budget(
        docs, {"a": 3.0, "b": 1.0}, 60, seed=5, renormalize=True
    ).collect()
    # all of source a is kept (renorm_rate 1.0)
    a_docs = [r for r in sampled if r["source"] == "a"]
    assert len(a_docs) == 4
    # source c never sampled
    assert not [r for r in sampled if r["source"] == "c"]


def test_water_fill_degenerate_tiny_weights():
    """Regression (r9 review): a weight that quantizes to 0 at 12
    decimals must not divide by zero — the suffix with zero quantized
    weight caps everything left (water level +inf), matching the SQL
    oracle's x/0.0 = inf fixed point."""
    totals = [("a", 10), ("b", 1000)]
    wn = {"a": 1.0 - 1e-14, "b": 1e-14}
    out = MixPlanner._water_fill(totals, wn, 500)
    # 'a' caps (avail 10 < its share); 'b' has ~zero weight -> the
    # remaining suffix quantizes to 0 -> everything left caps too
    assert out["a"] == (10.0, 1.0)
    assert out["b"] == (1000.0, 1.0)


def test_sample_with_repeats_epoch_factors(spark):
    """Epoch factors: rate > 1 repeats documents; floor(r) guaranteed
    copies, frac(r) probabilistic extra; determinism; runaway guard."""
    docs = _docs(spark)
    # source a: 40 tokens avail, weight-only recipe, budget 100 ->
    # rate 2.5: every doc gets 2 copies, ~half get a third
    out = MixPlanner.sample_with_repeats(
        docs, {"a": 1.0}, 100, seed=3
    ).collect()
    by_doc = {}
    for r in out:
        assert r["source"] == "a"
        by_doc.setdefault(r["doc_id"], []).append(r["copy"])
    assert set(by_doc) == {0, 1, 2, 3}
    for d, copies in by_doc.items():
        assert sorted(copies) == list(range(1, len(copies) + 1))
        assert len(copies) in (2, 3)
    # deterministic
    out2 = MixPlanner.sample_with_repeats(docs, {"a": 1.0}, 100, seed=3)
    assert sorted(map(tuple, out)) == sorted(
        tuple(r) for r in out2.collect()
    )
    # runaway guard
    import pytest

    with pytest.raises(ValueError, match="max_repeats"):
        MixPlanner.sample_with_repeats(
            docs, {"a": 1.0}, 10_000_000, seed=3
        )
