"""Sub-document duplicated-span detection/removal (llm/spans.py)."""

from pyspark.sql import functions as F

from sparker_spark.llm.spans import (
    duplicated_spans,
    positioned_shingles,
    remove_spans,
)

# two docs share the 10-word block "a b c d e f g h i j"; doc 2 also
# repeats its own 4-word tail twice (invisible at k=4? visible: the
# repeated run is 4 words — below k when k=5)
SHARED = "a b c d e f g h i j"


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, f"start {SHARED} middle unique0 end"),
            (1, f"other opening words {SHARED} closing"),
            (2, "p q r s p q r s totally fresh tail words here now"),
            (3, "short doc"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )


def test_positioned_shingles_positions(spark):
    pos = positioned_shingles(_docs(spark), shingle_size=5)
    d3 = pos.where(F.col("doc_id").isin(3, 4)).count()
    assert d3 == 0  # too short for any 5-window
    d0 = pos.where(F.col("doc_id") == 0).agg(
        F.min("pos"), F.max("pos"), F.count("*")
    ).first()
    # doc 0 has 14 words -> 10 windows at positions 1..10
    assert tuple(d0) == (1, 10, 10)


def test_duplicated_spans_cross_doc(spark):
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_words"])
        for r in duplicated_spans(
            _docs(spark), shingle_size=5, min_occurrences=2
        ).collect()
    }
    # doc 0: shared block at word positions 2..11
    assert spans[0] == (2, 11, 10)
    # doc 1: shared block at word positions 4..13
    assert spans[1] == (4, 13, 10)
    # doc 2's self-repeat is only 4 words (< k) -> invisible
    assert 2 not in spans
    assert 3 not in spans and 4 not in spans


def test_within_doc_repeats_count(spark):
    docs = spark.createDataFrame(
        [(0, "x1 x2 x3 x4 x5 sep x1 x2 x3 x4 x5")],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(docs, shingle_size=5, min_occurrences=2)
    got = sorted(
        (r["span_start"], r["span_end"]) for r in spans.collect()
    )
    # the 5-word run occurs twice WITHIN one doc -> both sides marked
    assert got == [(1, 5), (7, 11)]


def test_remove_spans_reconstruction(spark):
    docs = _docs(spark)
    spans = duplicated_spans(docs, shingle_size=5, min_occurrences=2)
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    assert out[0]["clean_text"] == "start middle unique0 end"
    assert out[0]["n_removed"] == 10
    assert out[1]["clean_text"] == "other opening words closing"
    # untouched docs pass through whole
    assert out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "short doc"


def test_remove_spans_full_coverage_and_min_width(spark):
    docs = spark.createDataFrame(
        [(0, SHARED), (1, SHARED)], ["doc_id", "text"]
    )
    spans = duplicated_spans(docs, shingle_size=5, min_occurrences=2)
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    # both docs are one duplicated block -> fully removed, empty text
    assert out[0]["clean_text"] == "" and out[0]["n_kept"] == 0
    assert out[1]["n_removed"] == 10
    # a min width above the span width keeps everything
    kept = remove_spans(docs, spans, min_span_words=11).collect()
    assert all(r["n_removed"] == 0 for r in kept)


def test_case_preserved_matching_case_insensitive(spark):
    docs = spark.createDataFrame(
        [
            (0, "Alpha Beta Gamma Delta Epsilon keepme"),
            (1, "alpha beta gamma delta epsilon other"),
        ],
        ["doc_id", "text"],
    )
    spans = duplicated_spans(docs, shingle_size=5, min_occurrences=2)
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    # matched case-insensitively, survivors keep ORIGINAL casing
    assert out[0]["clean_text"] == "keepme"
    assert out[1]["clean_text"] == "other"


def test_keep_first_exempts_canonical(spark):
    docs = spark.createDataFrame(
        [
            (0, f"start {SHARED} middle unique0 end"),
            (1, f"other opening words {SHARED} closing"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(
            docs, shingle_size=5, min_occurrences=2, keep_first=True
        ).collect()
    }
    # doc 0 holds every window's first occurrence -> no spans there
    assert 0 not in spans
    assert spans[1] == (4, 13)
    out = {
        r["doc_id"]: r
        for r in remove_spans(
            docs,
            duplicated_spans(
                docs, shingle_size=5, min_occurrences=2, keep_first=True
            ),
        ).collect()
    }
    # canonical copy intact, later copy cut
    assert out[0]["n_removed"] == 0
    assert out[1]["clean_text"] == "other opening words closing"


def test_curate_span_stage(spark):
    from sparker_spark.curate import curate

    docs = spark.createDataFrame(
        [
            (0, SHARED),
            (1, SHARED),
            (2, "completely different words that are not repeated"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curate(
            docs,
            redact=False,
            min_quality=None,
            max_top_ngram_frac=None,
            max_dup_ngram_frac=None,
            exact_dedup=False,
            jaccard_threshold=None,
            dup_span_words=5,
        ).collect()
    }
    # doc 0 is the canonical copy (kept whole); doc 1 is fully
    # duplicated -> emptied -> dropped; doc 2 untouched
    assert out[0] == SHARED
    assert 1 not in out
    assert out[2].startswith("completely")


def test_span_index_and_against_index(spark):
    from sparker_spark.llm.spans import (
        remove_spans,
        span_index,
        spans_against_index,
    )

    corpus = spark.createDataFrame(
        [(100, f"corpus head {SHARED} corpus tail")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (0, f"new words before {SHARED} after"),
            (1, "nothing shared with the corpus at all here"),
        ],
        ["doc_id", "text"],
    )
    idx = span_index(corpus, shingle_size=5, min_occurrences=1)
    spans = spans_against_index(incoming, idx, shingle_size=5)
    out = {
        r["doc_id"]: r
        for r in remove_spans(incoming, spans).collect()
    }
    assert out[0]["clean_text"] == "new words before after"
    assert out[0]["n_removed"] == 10
    assert out[1]["n_removed"] == 0


def test_clean_against_hashes_matches_join_path(spark):
    from sparker_spark.llm.spans import (
        clean_against_hashes,
        remove_spans,
        span_index,
        spans_against_index,
    )

    corpus = spark.createDataFrame(
        [(100, f"alpha beta {SHARED} gamma delta")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (0, f"pre {SHARED} post"),
            (1, f"{SHARED}"),
            (2, "unrelated text entirely of its own words"),
            (3, "tiny"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    idx_df = span_index(corpus, shingle_size=5, min_occurrences=1)
    hashes = [r["h"] for r in idx_df.collect()]
    lit = {
        r["doc_id"]: tuple(r)
        for r in clean_against_hashes(
            incoming, hashes, shingle_size=5
        ).collect()
    }
    join = {
        r["doc_id"]: tuple(r)
        for r in remove_spans(
            incoming,
            spans_against_index(incoming, idx_df, shingle_size=5),
        ).collect()
    }
    assert lit == join
    assert lit[0][1] == "pre post"
    assert lit[1][1] == "" and lit[1][3] == 10
    assert lit[3][3] == 0 and lit[4][3] == 0


def test_clean_against_hashes_empty_index(spark):
    from sparker_spark.llm.spans import clean_against_hashes

    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in clean_against_hashes(docs, [], shingle_size=5).collect()
    }
    assert out[0]["clean_text"] == "a b c d e f"
    assert out[0]["n_removed"] == 0
    assert out[1]["n_removed"] == 0


def test_streaming_span_clean_guard_precedes_collect(spark):
    """The max_index_size guard must fire from a bounded limit+count,
    BEFORE the index is collected to the driver (ADVICE r9: an
    oversized index is exactly the case the guard exists for, so it
    must not materialize a driver blob first)."""
    import pytest

    from sparker_spark.streaming import incremental as inc

    corpus = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    stream = stream.selectExpr(
        "CAST(value AS BIGINT) AS doc_id", "'a b c' AS text"
    )
    calls = {"collect_list": 0}
    orig_agg = inc.F.collect_list

    def counting(*a, **k):
        calls["collect_list"] += 1
        return orig_agg(*a, **k)

    inc.F.collect_list = counting
    try:
        with pytest.raises(ValueError, match="exceeds"):
            inc.streaming_span_clean(
                stream, corpus, shingle_size=5, max_index_size=3
            )
    finally:
        inc.F.collect_list = orig_agg
    assert calls["collect_list"] == 0  # guard fired before the blob
