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
