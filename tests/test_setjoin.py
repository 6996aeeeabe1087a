"""Prefix-filtered set-similarity join: hand fixture + randomized
equivalence against the brute-force shared-token join (the prefix
filter must be lossless at every threshold)."""

import random

import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.setjoin import SetSimilarityJoin


def brute_force(spark, docs, t):
    toks = SetSimilarityJoin.tokens(docs)
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = toks.select(F.col("doc_id").alias("p1"), "tok")
    b = toks.select(F.col("doc_id").alias("p2"), "tok")
    inter = (
        a.join(b, "tok")
        .where("p1 < p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("p1"), F.col("n").alias("n1")), "p1")
        .join(sizes.select(F.col("doc_id").alias("p2"), F.col("n").alias("n2")), "p2")
        .withColumn("j", F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")))
        .where(F.col("j") >= t)
    )
    return {(r["p1"], r["p2"], r["inter"]) for r in out.collect()}


def test_prefix_join_fixture(spark):
    rows = [
        (0, "a b c d"),          # {a b c d}
        (1, "a b c d e"),        # J(0,1) = 4/5 = 0.8
        (2, "a b x y"),          # J(0,2) = 2/6 = 0.33
        (3, "q r s"),            # disjoint
        (4, "a b c d"),          # identical to 0 -> J = 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["p1"], r["p2"]): (r["inter"], r["jaccard"])
        for r in SetSimilarityJoin.jaccard_prefix_join(docs, 0.5).collect()
    }
    assert set(got) == {(0, 1), (0, 4), (1, 4)}
    assert got[(0, 4)] == (4, 1.0)
    assert got[(0, 1)][0] == 4 and got[(0, 1)][1] == 0.8


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8])
def test_prefix_join_lossless_random(spark, t):
    rnd = random.Random(42)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for d in range(60):
        base = rnd.sample(vocab, rnd.randint(3, 15))
        rows.append((d, " ".join(base)))
        if rnd.random() < 0.4:  # planted near-dup with small edits
            dup = list(base)
            if len(dup) > 3 and rnd.random() < 0.5:
                dup.pop(rnd.randrange(len(dup)))
            dup.append(rnd.choice(vocab))
            rows.append((1000 + d, " ".join(dup)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    want = brute_force(spark, docs, t)
    got = {
        (r["p1"], r["p2"], r["inter"])
        for r in SetSimilarityJoin.jaccard_prefix_join(docs, t).collect()
    }
    assert got == want


def test_ngram_jaccard_plan_equivalence(spark):
    """Dedup.ngram_jaccard_pairs must produce the identical relation
    through both physical plans (naive shared-shingle join vs PPJoin
    prefix filter), including on a corpus with a hot shared shingle,
    and auto mode must route the hot corpus to the prefix plan."""
    from sparker_spark.llm.dedup import Dedup

    rnd = random.Random(7)
    boiler = "the quick brown fox jumps over it"  # hot boilerplate
    rows = []
    for d in range(40):
        tail = " ".join(rnd.sample([f"w{i}" for i in range(30)], 6))
        rows.append((d, f"{boiler} {tail}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.2, 0.5):
        naive = {
            tuple(r)
            for r in Dedup.ngram_jaccard_pairs(docs, 3, t, plan="naive").collect()
        }
        prefix = {
            tuple(r)
            for r in Dedup.ngram_jaccard_pairs(docs, 3, t, plan="prefix").collect()
        }
        auto = {
            tuple(r)
            for r in Dedup.ngram_jaccard_pairs(docs, 3, t, plan="auto").collect()
        }
        assert naive == prefix == auto, t
        if t == 0.2:
            assert naive  # the boilerplate guarantees pairs at 0.2


def test_prefix_join_empty_and_single_token(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "solo"), (3, "   ")], ["doc_id", "text"]
    )
    got = {
        (r["p1"], r["p2"])
        for r in SetSimilarityJoin.jaccard_prefix_join(docs, 0.5).collect()
    }
    assert got == {(1, 2)}


def test_ngram_jaccard_plan_equivalence_property(spark):
    """Property: on randomized corpora (mixed hot/rare vocabulary,
    variable doc lengths, several thresholds) the naive and
    prefix-filtered plans produce the identical pair relation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sparker_spark.llm.dedup import Dedup

    corpus = st.lists(
        st.lists(
            st.sampled_from(
                ["the", "a", "of"] + [f"w{i}" for i in range(25)]
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=0,
        max_size=25,
    )

    @given(docs=corpus, t=st.sampled_from([0.1, 0.3, 0.6, 0.9]))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(docs, t):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        naive = {
            tuple(r)
            for r in Dedup.ngram_jaccard_pairs(df, 3, t, plan="naive").collect()
        }
        prefix = {
            tuple(r)
            for r in Dedup.ngram_jaccard_pairs(df, 3, t, plan="prefix").collect()
        }
        assert naive == prefix, (t, rows)

    check()
