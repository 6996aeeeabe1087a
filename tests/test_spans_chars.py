"""Char-offset-faithful span removal (round-10 ask #5): remove_spans
normalizes whitespace (documented); remove_spans_chars instead
preserves every original byte outside the removed intervals and
returns the intervals themselves, so provenance/audit pipelines can
reconstruct exactly what was cut and from where.
"""

import pytest


def _apply_intervals(text: str, intervals: list[tuple[int, int]]) -> str:
    """Reference edit: cut 1-based inclusive [start, end] char ranges
    from the original text."""
    out = []
    prev = 1
    for s, e in sorted(intervals):
        out.append(text[prev - 1:s - 1])
        prev = e + 1
    out.append(text[prev - 1:])
    return "".join(out)


def _run(spark, docs_rows, spans_rows):
    from sparker_spark.llm.spans import remove_spans_chars

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    spans = spark.createDataFrame(
        spans_rows, "doc_id long, span_start long, span_end long, span_words long"
    )
    return {
        r["doc_id"]: r for r in remove_spans_chars(docs, spans).collect()
    }


def test_intervals_reconstruct_clean_text(spark):
    """THE contract: cutting removed_intervals from the ORIGINAL text
    reproduces clean_text byte-for-byte — including weird whitespace
    (tabs, doubled spaces, leading/trailing runs) that the
    word-normalizing remove_spans would collapse."""
    docs = [
        (0, "keep aa bb cc keep2"),
        (1, "  lead aa bb\t\ttab  trail  "),
        (2, "aa bb cc"),          # fully removed
        (3, "no spans here"),     # untouched
        (4, None),                # NULL text
    ]
    # word positions are 1-based over the split-on-whitespace stream
    # (leading whitespace makes an empty token at pos 1 for doc 1)
    spans = [
        (0, 2, 4, 3),   # cut "aa bb cc" from doc 0
        (1, 3, 4, 2),   # cut "aa bb" from doc 1 (offset by empty tok)
        (2, 1, 3, 3),   # everything
    ]
    out = _run(spark, docs, spans)
    for doc_id, text in docs:
        if text is None:
            assert out[doc_id]["clean_text"] == ""
            assert out[doc_id]["removed_intervals"] == []
            continue
        ivs = [
            (iv["start"], iv["end"])
            for iv in out[doc_id]["removed_intervals"]
        ]
        assert _apply_intervals(text, ivs) == out[doc_id]["clean_text"], (
            doc_id,
            ivs,
            out[doc_id]["clean_text"],
        )
    # the cut pieces are exactly the duplicated words + internal ws
    t0 = docs[0][1]
    (s, e), = [
        (iv["start"], iv["end"]) for iv in out[0]["removed_intervals"]
    ]
    assert t0[s - 1:e] == "aa bb cc"
    assert out[0]["clean_text"] == "keep  keep2"  # both delims survive
    assert out[3]["clean_text"] == "no spans here"
    assert out[3]["removed_intervals"] == []
    assert out[2]["n_kept"] == 0


def test_counts_match_word_semantics(spark):
    out = _run(
        spark,
        [(0, "a b c d e")],
        [(0, 2, 3, 2)],
    )
    assert out[0]["n_kept"] == 3
    assert out[0]["n_removed"] == 2


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_property_reconstruction_random(spark, seed):
    """Randomized: arbitrary whitespace shapes + arbitrary valid span
    sets — the interval edit must always reproduce clean_text."""
    import random

    rng = random.Random(seed)
    docs, spans = [], []
    for doc_id in range(25):
        n = rng.randint(0, 12)
        words = [
            "".join(rng.choice("abxy~") for _ in range(rng.randint(1, 5)))
            for _ in range(n)
        ]
        seps = [rng.choice([" ", "  ", "\t", " \t ", "\n"]) for _ in range(max(0, n - 1))]
        text = "".join(
            w + (seps[i] if i < len(seps) else "")
            for i, w in enumerate(words)
        )
        if rng.random() < 0.3:
            text = rng.choice([" ", "\t\t"]) + text
        if rng.random() < 0.3:
            text = text + rng.choice([" ", " \n"])
        docs.append((doc_id, text))
        n_pos = len(text.split()) + 5  # upper bound incl. empty tokens
        p = 1
        while p <= n_pos and rng.random() < 0.5:
            q = min(n_pos, p + rng.randint(0, 3))
            spans.append((doc_id, p, q, q - p + 1))
            p = q + 2 + rng.randint(0, 3)
    out = _run(spark, docs, spans)
    for doc_id, text in docs:
        ivs = [
            (iv["start"], iv["end"])
            for iv in out[doc_id]["removed_intervals"]
        ]
        assert _apply_intervals(text, ivs) == out[doc_id]["clean_text"], (
            doc_id,
            repr(text),
            ivs,
            repr(out[doc_id]["clean_text"]),
        )
