"""NB log-odds quality classifier (llm/classifier.py): fastText's
linear-over-hashed-ngrams architecture with one-pass deterministic
training — the classifier-filter stage of published curation recipes.
"""

import pytest


def test_classifier_separates_classes(spark):
    from sparker_spark.llm.classifier import QualityClassifier

    good = [
        (i, "the quick brown fox jumps over the lazy dog", "good")
        for i in range(20)
    ]
    bad = [
        (100 + i, "zz qq xx vv kk jj ww yy", "bad") for i in range(20)
    ]
    docs = spark.createDataFrame(
        good + bad, "doc_id long, text string, source string"
    )
    out = {
        r["doc_id"]: r
        for r in QualityClassifier.train_score(
            docs, "source = 'good'", buckets=256
        ).collect()
    }
    assert len(out) == 40
    assert all(out[i]["pred"] for i in range(20))
    assert not any(out[100 + i]["pred"] for i in range(20))
    assert out[0]["logit"] > 0 > out[100]["logit"]


def test_classifier_prior_only_for_gramless_docs(spark):
    from sparker_spark.llm.classifier import QualityClassifier

    docs = spark.createDataFrame(
        [(0, "alpha beta", "a"), (1, "gamma delta", "b"), (2, "", "b"),
         (3, None, "b")],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r
        for r in QualityClassifier.train_score(
            docs, "source = 'a'", buckets=64
        ).collect()
    }
    # docs 2/3 have zero grams -> logit == prior == ln(1/3), rounded
    import math

    prior = math.floor(math.log(1 / 3) * 1e6 + 0.5) / 1e6
    assert out[2]["n_grams"] == 0 and out[2]["logit"] == prior
    assert out[3]["logit"] == prior


def test_classifier_requires_both_classes(spark):
    from sparker_spark.llm.classifier import QualityClassifier

    docs = spark.createDataFrame(
        [(0, "a b", "x")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="BOTH classes"):
        QualityClassifier.train_score(docs, "source = 'x'")
    with pytest.raises(ValueError, match="BOTH classes"):
        QualityClassifier.train_score(docs, "source = 'nope'")


def test_curate_classifier_stage_composes(spark):
    """curate(classifier_labels=...) composes with the quality floor
    and exact dedup: the classifier drops off-distribution docs, the
    later stages still run on the survivors."""
    from sparker_spark.curate import curate

    good_text = "the quick brown fox jumps over the lazy dog again"
    rows = (
        [(i, good_text, "good") for i in range(10)]
        + [(50 + i, "zz qq xx vv kk jj ww yy uu tt", "bad")
           for i in range(10)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    labels = docs.where("source = 'good'").select("doc_id")
    out = curate(
        docs,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        jaccard_threshold=None,
        exact_dedup=True,
        classifier_labels=labels,
        classifier_buckets=128,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # classifier drops the word-salad class; exact dedup then keeps
    # ONE canonical copy of the identical good docs
    assert kept == {0}
