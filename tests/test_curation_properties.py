"""Model-check the curation operators against a pure-Python oracle on
randomized micro-corpora (same approach as the ranking/filtering
property suites): any disagreement between the distributed plan and
the sequential model is a bug in one of them."""

import random
from collections import Counter

import pytest

from sparker_spark.llm.curation import Decontamination, RepetitionStats

WORDS = ["alpha", "beta", "gamma", "delta", "x", "y", "z1"]


def _rand_docs(rng, n_docs, max_tokens=12, with_newlines=False):
    docs = []
    for i in range(n_docs):
        k = rng.randint(0, max_tokens)
        toks = [rng.choice(WORDS) for _ in range(k)]
        if with_newlines and toks:
            # sprinkle newlines to form random lines
            parts = []
            for t in toks:
                parts.append(t)
                if rng.random() < 0.3:
                    parts.append("\n")
            text = " ".join(parts).replace(" \n ", "\n")
        else:
            text = " ".join(toks)
        docs.append((i, text))
    return docs


def _ngrams(text, n):
    toks = text.lower().split()
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_overlap_ngrams_matches_model(spark, seed):
    rng = random.Random(seed)
    train_rows = _rand_docs(rng, 25)
    eval_rows = [(100 + i, t) for i, (_, t) in enumerate(_rand_docs(rng, 6))]
    n = 2
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    ev = spark.createDataFrame(eval_rows, ["doc_id", "text"])

    ev_set = set()
    for _, t in eval_rows:
        ev_set.update(_ngrams(t, n))
    expected = {}
    for did, t in train_rows:
        grams = set(_ngrams(t, n))
        expected[did] = (len(grams), len(grams & ev_set))

    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_overlap_ngrams"], r["contaminated"])
        for r in Decontamination.overlap_ngrams(train, ev, n).collect()
    }
    assert set(out) == set(expected)
    for did, (tot, ov) in expected.items():
        assert out[did] == (tot, ov, ov > 0), f"doc {did}"


@pytest.mark.parametrize("seed", [3, 4])
def test_ngram_stats_matches_model(spark, seed):
    rng = random.Random(seed)
    rows = _rand_docs(rng, 30)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_ngrams"], r["top_ngram_frac"], r["dup_ngram_frac"])
        for r in RepetitionStats.ngram_stats(docs, 2).collect()
    }
    for did, t in rows:
        counts = Counter(_ngrams(t, 2))
        total = sum(counts.values())
        if total == 0:
            assert out[did] == (0, 0.0, 0.0)
            continue
        top = round(max(counts.values()) / total, 6)
        dup = round(
            sum(c for c in counts.values() if c > 1) / total, 6
        )
        got = out[did]
        assert got[0] == total and abs(got[1] - top) < 1e-9 and abs(got[2] - dup) < 1e-9


@pytest.mark.parametrize("seed", [5, 6])
def test_line_stats_matches_model(spark, seed):
    rng = random.Random(seed)
    rows = _rand_docs(rng, 30, with_newlines=True)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"])
        for r in RepetitionStats.line_stats(docs).collect()
    }
    for did, t in rows:
        lines = [ln.strip(" ") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln != ""]
        counts = Counter(lines)
        n = len(lines)
        if n == 0:
            assert out[did] == (0, 0.0, 0.0)
            continue
        dup_rows = sum(c for c in counts.values() if c > 1)
        chars = sum(len(ln) * c for ln, c in counts.items())
        dup_chars = sum(len(ln) * c for ln, c in counts.items() if c > 1)
        exp = (
            n,
            round(dup_rows / n, 6),
            round(dup_chars / chars, 6) if chars else 0.0,
        )
        got = out[did]
        assert got[0] == exp[0]
        assert abs(got[1] - exp[1]) < 1e-9 and abs(got[2] - exp[2]) < 1e-9
