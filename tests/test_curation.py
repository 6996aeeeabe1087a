"""Hand-computed fixtures for the corpus-curation operators:
decontamination (n-gram overlap) and repetition quality statistics."""

import pytest

from sparker_spark.llm.curation import Decontamination, RepetitionStats


@pytest.fixture(scope="module")
def train(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),  # shares 3-grams with eval 100
        (1, "one two three four five"),  # no overlap
        (2, "alpha beta gamma unrelated tail here"),  # one overlapping 3-gram
        (3, "xy"),  # shorter than a 3-gram -> zero n-grams
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def eval_docs(spark):
    rows = [
        (100, "alpha beta gamma delta"),
        (101, "totally disjoint benchmark prompt"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_overlap_ngrams(train, eval_docs):
    out = {
        r["doc_id"]: r
        for r in Decontamination.overlap_ngrams(train, eval_docs, 3).collect()
    }
    assert set(out) == {0, 1, 2, 3}  # total over the train side
    # doc 0: 4 distinct 3-grams; eval doc 100 holds "alpha beta gamma"
    # and "beta gamma delta" -> 2 overlaps
    assert out[0]["n_ngrams"] == 4
    assert out[0]["n_overlap_ngrams"] == 2
    assert out[0]["contaminated"]
    # doc 1: clean
    assert out[1]["n_overlap_ngrams"] == 0 and not out[1]["contaminated"]
    # doc 2: only "alpha beta gamma" overlaps
    assert out[2]["n_overlap_ngrams"] == 1 and out[2]["contaminated"]
    # doc 3: no n-grams at all -> present with zeros
    assert out[3]["n_ngrams"] == 0 and not out[3]["contaminated"]


def test_line_stats(spark):
    docs = spark.createDataFrame(
        [
            # 4 non-empty lines; "dup" x2 (3 chars each), "solo x" once,
            # "longer line" once -> dup_line_frac = 2/4,
            # char frac = 6 / (3+3+6+11) = 6/23
            (0, "dup\ndup\nsolo x\n\nlonger line\n"),
            (1, "a\nb\nc"),  # no duplicates
            (2, ""),  # no lines at all
            (3, "  spaced  \nspaced"),  # trim makes these duplicates
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in RepetitionStats.line_stats(docs).collect()}
    assert out[0]["n_lines"] == 4
    assert out[0]["dup_line_frac"] == 0.5
    assert out[0]["dup_line_char_frac"] == round(6 / 23, 6)
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["n_lines"] == 0 and out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 2 and out[3]["dup_line_frac"] == 1.0


def test_ngram_stats(spark):
    docs = spark.createDataFrame(
        [
            # tokens: a b a b a -> bigrams: "a b","b a","a b","b a" (4);
            # top count 2 -> top_frac 0.5, all repeat -> dup_frac 1.0
            (0, "a b a b a"),
            (1, "w x y z"),  # 3 distinct bigrams, none repeat
            (2, "solo"),  # no bigrams
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in RepetitionStats.ngram_stats(docs, 2).collect()}
    assert out[0]["n_ngrams"] == 4
    assert out[0]["top_ngram_frac"] == 0.5
    assert out[0]["dup_ngram_frac"] == 1.0
    assert out[1]["n_ngrams"] == 3
    assert out[1]["top_ngram_frac"] == round(1 / 3, 6)
    assert out[1]["dup_ngram_frac"] == 0.0
    assert out[2]["n_ngrams"] == 0 and out[2]["top_ngram_frac"] == 0.0
