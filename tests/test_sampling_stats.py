"""Deterministic sampling/splits, SRP embedding LSH, exact quantiles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.dedup import Dedup
from sparker_spark.llm.sampling import Sampling
from sparker_spark.stats import GroupStats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_split_total_and_stability(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = Sampling.split(docs, "doc_id", w, seed=7).select("doc_id", "split")
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == docs.count()  # every row assigned
    # proportions land near the weights (hash-uniformity sanity)
    n = len(rows)
    train_frac = sum(1 for s in rows.values() if s == "train") / n
    assert 0.7 < train_frac < 0.9
    # pure function of the key: a different partitioning produces the
    # IDENTICAL assignment (the property randomSplit lacks)
    re = Sampling.split(docs.repartition(7), "doc_id", w, seed=7)
    rows2 = {r["doc_id"]: r["split"] for r in re.select("doc_id", "split").collect()}
    assert rows == rows2


def test_split_seed_independence(spark, docs):
    w = {"a": 0.5, "b": 0.5}
    s1 = {r["doc_id"]: r["split"] for r in Sampling.split(docs, "doc_id", w, seed=1).collect()}
    s2 = {r["doc_id"]: r["split"] for r in Sampling.split(docs, "doc_id", w, seed=2).collect()}
    assert s1 != s2  # different seeds reshuffle
    agree = sum(1 for k in s1 if s1[k] == s2[k]) / len(s1)
    assert 0.3 < agree < 0.7  # ~independent assignments


def test_sample_is_nested_by_fraction(spark, docs):
    """coord < f is monotone in f: the 20% sample is a strict subset
    of the 50% sample under the same seed — lets a pipeline grow its
    sample without resampling everything."""
    small = {r["doc_id"] for r in Sampling.sample(docs, "doc_id", 0.2, seed=3).select("doc_id").collect()}
    big = {r["doc_id"] for r in Sampling.sample(docs, "doc_id", 0.5, seed=3).select("doc_id").collect()}
    assert small <= big
    assert len(small) < len(big)


def test_srp_pairs_subset_of_exact(spark, sf_dir):
    """After verification every SRP pair satisfies the threshold, and
    the pair set is a subset of the exact O(n²) baseline at the same
    threshold (LSH only loses candidates, never invents them)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    t = 0.3
    srp = Dedup.embedding_srp_pairs(emb, bits=16, bands=8, threshold=t)
    exact = Dedup.embedding_cosine_pairs(emb, threshold=t)
    srp_set = {(r["p1"], r["p2"]) for r in srp.collect()}
    exact_set = {(r["p1"], r["p2"]) for r in exact.collect()}
    assert srp_set, "fixture should produce at least one pair"
    assert srp_set <= exact_set
    # with 8 two-bit bands recall on this fixture is high; guard the
    # banding wiring (a broken bucket join returns ~nothing)
    assert len(srp_set) >= len(exact_set) * 0.5


def test_group_quantiles_match_numpy(spark):
    rows = [("a", float(v)) for v in range(101)] + [
        ("b", float(v) * 2.5) for v in range(53)
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    out = {
        r["k"]: r
        for r in GroupStats.quantiles(df, ["k"], "value", [0.5, 0.9]).collect()
    }
    for k, vals in [("a", [v for v in range(101)]), ("b", [v * 2.5 for v in range(53)])]:
        assert out[k]["n"] == len(vals)
        assert out[k]["q_5"] == pytest.approx(np.percentile(vals, 50), abs=1e-9)
        assert out[k]["q_9"] == pytest.approx(np.percentile(vals, 90), abs=1e-9)


def test_group_quantiles_approx_close_to_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["q_9"]
        for r in GroupStats.quantiles(ev, ["event_type"], "value", [0.9]).collect()
    }
    approx = {
        r["event_type"]: r["q_9"]
        for r in GroupStats.quantiles(
            ev, ["event_type"], "value", [0.9], exact=False
        ).collect()
    }
    for k in exact:
        spread = abs(exact[k]) + 1.0
        assert abs(approx[k] - exact[k]) <= 0.05 * spread
