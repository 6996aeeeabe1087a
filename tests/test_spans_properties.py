"""Model-check the duplicated-span operators against a pure-Python
oracle on randomized micro-corpora (same approach as the curation
property suite): any disagreement between the distributed plan and the
sequential model is a bug in one of them."""

import random

import pytest

from sparker_spark.llm.spans import (
    clean_against_hashes,
    duplicated_spans,
    remove_spans,
    span_index,
    spans_against_index,
)

# tiny vocabulary so k-window collisions are common
WORDS = ["a", "b", "c", "dd"]


def _rand_docs(rng, n_docs, max_tokens=16):
    return [
        (i, " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, max_tokens))))
        for i in range(n_docs)
    ]


def _model_windows(docs, k):
    """{(doc_id, pos): shingle} for every k-window (1-based pos) of the
    lowercased whitespace token stream."""
    wins = {}
    for doc_id, text in docs:
        toks = text.lower().split(" ") if text else [""]
        for i in range(len(toks) - k + 1):
            wins[(doc_id, i + 1)] = " ".join(toks[i : i + k])
    return wins


def _model_spans(docs, k, min_occ, keep_first=False):
    """Sequential model of duplicated_spans: covered positions ->
    merged maximal intervals."""
    wins = _model_windows(docs, k)
    from collections import Counter

    freq = Counter(wins.values())
    first = {}
    for key in sorted(wins):  # (doc_id, pos) lexicographic
        s = wins[key]
        if s not in first:
            first[s] = key
    covered = {}
    for (doc_id, pos), s in wins.items():
        if freq[s] < min_occ:
            continue
        if keep_first and first[s] == (doc_id, pos):
            continue
        covered.setdefault(doc_id, []).append((pos, pos + k - 1))
    spans = {}
    for doc_id, ivs in covered.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        spans[doc_id] = merged
    return spans


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
@pytest.mark.parametrize("keep_first", [False, True])
def test_duplicated_spans_matches_model(spark, seed, keep_first):
    rng = random.Random(seed)
    docs = _rand_docs(rng, 12)
    k = rng.choice([2, 3])
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {}
    for r in duplicated_spans(
        df, shingle_size=k, min_occurrences=2, keep_first=keep_first
    ).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for v in got.values():
        v.sort()
    assert got == _model_spans(docs, k, 2, keep_first=keep_first)


@pytest.mark.parametrize("seed", [5, 6])
def test_remove_spans_matches_model(spark, seed):
    rng = random.Random(seed)
    docs = _rand_docs(rng, 10)
    k = 3
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = duplicated_spans(df, shingle_size=k, min_occurrences=2)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_spans(df, spans).collect()
    }
    model_spans = _model_spans(docs, k, 2)
    for doc_id, text in docs:
        words = text.split(" ")  # '' -> ['']
        cut = set()
        for s, e in model_spans.get(doc_id, []):
            cut.update(range(s, e + 1))
        kept = [w for p, w in enumerate(words, 1) if p not in cut]
        assert got[doc_id] == (
            " ".join(kept),
            len(kept),
            len(words) - len(kept),
        )


@pytest.mark.parametrize("seed", [7, 8])
def test_index_paths_agree_with_model(spark, seed):
    rng = random.Random(seed)
    corpus = _rand_docs(rng, 8)
    incoming = [(i + 100, t) for i, t in _rand_docs(rng, 8)]
    k = 3
    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    idf = spark.createDataFrame(incoming, ["doc_id", "text"])
    idx = span_index(cdf, shingle_size=k, min_occurrences=1)
    join_path = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_spans(
            idf, spans_against_index(idf, idx, shingle_size=k)
        ).collect()
    }
    lit_path = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in clean_against_hashes(
            idf, [r["h"] for r in idx.collect()], shingle_size=k
        ).collect()
    }
    assert join_path == lit_path
    # model: cut incoming windows whose shingle occurs in the corpus
    cwins = set(_model_windows(corpus, k).values())
    iwins = _model_windows(incoming, k)
    for doc_id, text in incoming:
        words = text.split(" ")
        cut = set()
        for (d, pos), s in iwins.items():
            if d == doc_id and s in cwins:
                cut.update(range(pos, pos + k))
        kept = [w for p, w in enumerate(words, 1) if p not in cut]
        assert join_path[doc_id] == (" ".join(kept), len(words) - len(kept))
