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
