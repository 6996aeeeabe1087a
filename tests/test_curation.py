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


def test_quality_quantile_cutoff(spark):
    from sparker_spark.llm.curation import QualityFilter

    # 8 docs in one lang with strictly increasing quality (longer text
    # with more stopwords scores higher); frac=0.25 -> cutoff is the
    # 2nd smallest score, so exactly one doc is dropped
    rows = [
        (i, "the a of and to in is that it for word " * (i + 1), "en")
        for i in range(8)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = QualityFilter.quantile_cutoff(docs, frac=0.25, group_col="lang")
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 8
    dropped = [d for d, r in got.items() if not r["kept"]]
    scores = {d: r["quality_score"] for d, r in got.items()}
    cutoff = got[0]["cutoff"]
    # value-based rule: kept iff score >= cutoff (the 2nd smallest)
    assert cutoff == sorted(scores.values())[1]
    assert dropped == [min(scores, key=scores.get)]


def test_quality_quantile_per_group(spark):
    from sparker_spark.llm.curation import QualityFilter

    # two langs with different score ranges -> independent cutoffs
    rows = [(i, "the a of and " * (i + 1), "en") for i in range(4)] + [
        (10 + i, "zz qq " * (i + 1), "de") for i in range(4)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = QualityFilter.quantile_cutoff(docs, frac=0.25, group_col="lang")
    cuts = {r["lang"]: r["cutoff"] for r in out.collect()}
    assert len(cuts) == 2 and cuts["en"] != cuts["de"]


def test_redact_pii(spark):
    from sparker_spark.llm.curation import Redaction

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
        (1, "server at 192.168.0.1 and 10.0.0.255 rebooted"),
        (2, "no pii here at all"),
        (3, "a@b.io mailed c.d@e-f.org twice"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in Redaction.redact_pii(docs).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert out[0]["redacted_text"] == "contact <EMAIL> or call <PHONE> now"
    # IPs are redacted as IPs, never half-eaten as phone digit runs
    assert out[1]["n_ip"] == 2 and out[1]["n_phone"] == 0
    assert out[1]["redacted_text"] == "server at <IP> and <IP> rebooted"
    assert out[2]["redacted_text"] == "no pii here at all"
    assert (out[2]["n_email"], out[2]["n_ip"], out[2]["n_phone"]) == (0, 0, 0)
    assert out[3]["n_email"] == 2
    assert out[3]["redacted_text"] == "<EMAIL> mailed <EMAIL> twice"


def test_tfidf_top_terms(spark):
    from sparker_spark.llm.text import TextAnalysis

    rows = [
        (0, "apple apple banana shared"),
        (1, "banana cherry shared"),
        (2, "cherry cherry cherry shared"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = TextAnalysis.tfidf_top_terms(docs, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # 'shared' has df=3 -> idf = ln(1) = 0, never ranks above a
    # doc-specific term; doc 0's top term is apple (tf=2, df=1)
    assert sorted(got[0])[0] == (1, "apple")
    assert sorted(got[2])[0] == (1, "cherry")
    # every doc gets at most k rows, ranks are 1..k
    for d, pairs in got.items():
        assert [p[0] for p in sorted(pairs)] == list(range(1, len(pairs) + 1))


def test_pmi_collocations(spark):
    import math

    from sparker_spark.llm.text import Collocations

    # 'x y' always co-occur (4 docs); 'x z' once; singles elsewhere
    rows = [
        (0, "x y a"), (1, "x y b"), (2, "x y c"), (3, "x y d"),
        (4, "x z"), (5, "q r"), (6, "q s"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = Collocations.pmi_top(docs, min_pairs=2, k=5).collect()
    top = out[0]
    assert (top["t1"], top["t2"]) == ("x", "y")
    # pmi(x,y) = ln(7 * 4 / (5 * 4))
    assert top["pmi"] == pytest.approx(round(math.log(7 * 4 / 20), 6), abs=1e-9)
    pairs = [(r["t1"], r["t2"]) for r in out]
    assert ("x", "z") not in pairs  # below min_pairs


def test_sliding_window_counts(spark):
    import datetime as dt

    from sparker_spark.rollup import SlidingWindows

    t = dt.datetime(2026, 1, 1, 12, 7, 0)  # inside bucket 12:00
    ev = spark.createDataFrame(
        [(1, t, "click")], "event_id long, ts timestamp, event_type string"
    )
    got = sorted(
        r["window_start"] for r in SlidingWindows.counts(ev).collect()
    )
    # one event -> exactly 4 overlapping 1h/15m windows
    assert got == [
        "2026-01-01 11:15:00",
        "2026-01-01 11:30:00",
        "2026-01-01 11:45:00",
        "2026-01-01 12:00:00",
    ]
