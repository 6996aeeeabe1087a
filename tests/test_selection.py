"""DSIR importance resampling + CCNet perplexity partition
(llm/selection.py) and tokenizer fertility (llm/bpe.py BPEEval)."""

import math

from pyspark.sql import functions as F

from sparker_spark.llm.selection import (
    ImportanceSelection,
    PerplexityPartition,
)


def _docs(spark):
    # 'en'-flavored docs share the words the target distribution
    # upweights; 'xx' docs are disjoint vocabulary
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the rug", "en"),
        (2, "zzz yyy xxx www vvv uuu", "xx"),
        (3, "the cat and the dog", "xx"),
        (4, "", "xx"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_gram_counts_unigram_bigram(spark):
    counts = ImportanceSelection.hashed_gram_counts(
        spark.createDataFrame([(0, "a b a")], ["doc_id", "text"]),
        buckets=1 << 20,
    )
    total = counts.agg(F.sum("c")).first()[0]
    # 3 unigrams + 2 bigrams
    assert total == 5


def test_logweights_direction_and_empty(spark):
    lw = {
        r["doc_id"]: r
        for r in ImportanceSelection.logweights(
            _docs(spark), "lang = 'en'", buckets=4096
        ).collect()
    }
    # target-aligned docs outweigh the disjoint-vocab doc
    assert lw[0]["logweight"] > lw[2]["logweight"]
    assert lw[1]["logweight"] > lw[2]["logweight"]
    # doc 3 shares target words -> beats doc 2 as well
    assert lw[3]["logweight"] > lw[2]["logweight"]
    # empty doc: zero grams, zero weight
    assert lw[4]["n_grams"] == 0 and lw[4]["logweight"] == 0.0


def test_bucket_logratio_normalizes(spark):
    lr = ImportanceSelection.bucket_logratio(
        _docs(spark), "lang = 'en'", buckets=64
    ).collect()
    assert all(r["lr"] is not None for r in lr)
    # smoothed ratios are finite and bounded by ln(N_r + aB)
    assert all(abs(float(r["lr"])) < 20 for r in lr)


def test_gumbel_topk_deterministic_and_sized(spark):
    lw = ImportanceSelection.logweights(
        _docs(spark), "lang = 'en'", buckets=4096
    )
    s1 = sorted(
        r["doc_id"]
        for r in ImportanceSelection.gumbel_topk(lw, k=3, seed=9).collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in ImportanceSelection.gumbel_topk(lw, k=3, seed=9).collect()
    )
    assert s1 == s2 and len(s1) == 3
    # a different seed may pick a different set but stays size-k
    s3 = ImportanceSelection.gumbel_topk(lw, k=3, seed=10).collect()
    assert len(s3) == 3


def test_gumbel_topk_weight_dominance(spark):
    # weights so extreme the Gumbel noise (~[-2, 5] at 6dp) cannot
    # overturn them: top-2 must be the two heavy docs
    w = spark.createDataFrame(
        [(0, 1000.0), (1, 900.0), (2, 0.0), (3, -500.0)],
        ["doc_id", "logweight"],
    )
    got = sorted(
        r["doc_id"]
        for r in ImportanceSelection.gumbel_topk(w, k=2, seed=1).collect()
    )
    assert got == [0, 1]


def test_ppl_partition_terciles(spark):
    # 6 'en' docs with graded repetitiveness -> distinct LM scores;
    # each tercile gets 2 docs
    rows = [
        (i, " ".join((["the cat"] * (6 - i)) + [f"u{i} v{i}"]), "en")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = PerplexityPartition.assign(docs).collect()
    assert len(out) == 6
    buckets = {}
    for r in out:
        buckets.setdefault(r["ppl_bucket"], []).append(r["avg_logprob"])
    assert set(buckets) == {"head", "middle", "tail"}
    assert min(buckets["head"]) >= max(buckets["middle"])
    assert min(buckets["middle"]) >= max(buckets["tail"])


def test_ppl_partition_skips_unscorable(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a b", "en"), (1, "one", "en"), (2, "", "en")],
        ["doc_id", "text", "lang"],
    )
    out = PerplexityPartition.assign(docs).collect()
    assert sorted(r["doc_id"] for r in out) == [0]


def test_fertility_fixed_merges(spark):
    from sparker_spark.llm.bpe import BPEEval

    docs = spark.createDataFrame(
        [(0, "the the in", "en"), (1, "qq qq", "de")],
        ["doc_id", "text", "lang"],
    )
    merges = spark.createDataFrame(
        [(1, "t", "h", "th"), (2, "th", "e", "the"), (3, "i", "n", "in")],
        "rank int, left string, right string, merged string",
    )
    out = {r["lang"]: r for r in BPEEval.fertility(docs, merges).collect()}
    # 'the' -> ['the'] (1 token), 'in' -> ['in'] (1 token)
    assert out["en"]["n_words"] == 3 and out["en"]["n_tokens"] == 3
    assert out["en"]["fertility"] == 1.0
    assert out["en"]["pct_single_token"] == 1.0
    # chars/token: (3+3+2)/3
    assert math.isclose(
        out["en"]["chars_per_token"], round(8 / 3, 6), abs_tol=1e-6
    )
    # 'qq' has no merges -> 2 single-char tokens per word
    assert out["de"]["n_tokens"] == 4
    assert out["de"]["fertility"] == 2.0
    assert out["de"]["pct_single_token"] == 0.0


def test_sample_by_ppl_bucket(spark):
    from sparker_spark.llm.selection import sample_by_ppl_bucket

    rows = [
        (i, " ".join((["the cat"] * (6 - i)) + [f"u{i} v{i}"]), "en")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    kept = sample_by_ppl_bucket(
        docs, {"head": 1.0, "middle": 1.0, "tail": 0.0}, seed=3
    ).collect()
    # tail dropped entirely, head+middle kept whole -> 4 of 6 docs
    assert len(kept) == 4
    assert all(r["ppl_bucket"] in ("head", "middle") for r in kept)
    # deterministic under reruns
    kept2 = sample_by_ppl_bucket(
        docs, {"head": 1.0, "middle": 1.0, "tail": 0.0}, seed=3
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == sorted(
        r["doc_id"] for r in kept2
    )
    # absent bucket -> rate 0
    none_kept = sample_by_ppl_bucket(docs, {}, seed=3).collect()
    assert none_kept == []


def test_mix_weights_from_affinity(spark):
    from sparker_spark.llm.selection import mix_weights_from_affinity

    rep = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", -1.0)],
        ["source", "mean_logweight"],
    )
    w = {r["source"]: r["weight"] for r in
         mix_weights_from_affinity(rep).collect()}
    # ordering follows affinity; weights normalize to ~1
    assert w["a"] > w["b"] > w["c"] > 0
    assert abs(sum(w.values()) - 1.0) < 1e-5
    # high temperature flattens toward uniform
    flat = {r["source"]: r["weight"] for r in
            mix_weights_from_affinity(rep, temperature=100.0).collect()}
    assert abs(flat["a"] - flat["c"]) < 0.01


def test_mix_weights_from_affinity_degenerate(spark):
    import pytest

    from sparker_spark.llm.selection import mix_weights_from_affinity

    schema = "source string, mean_logweight double"
    # empty report: sum(w) is NULL -> clear error, not float(None)
    empty = spark.createDataFrame([], schema)
    with pytest.raises(ValueError, match="NULL"):
        mix_weights_from_affinity(empty)
    # every exp term rounds to 0 at 6 dp -> clear error, not NULL/NaN
    # weights (exp(-20) ~ 2e-9 rounds to 0.000000)
    far = spark.createDataFrame([("a", -20.0), ("b", -25.0)], schema)
    with pytest.raises(ValueError, match="0 at 6 dp"):
        mix_weights_from_affinity(far)
    # the documented escape hatch: temperature spreads the same mix
    w = {r["source"]: r["weight"] for r in
         mix_weights_from_affinity(far, temperature=10.0).collect()}
    assert w["a"] > w["b"] > 0
