"""Word-shingle extraction + portable hashing, shared by dedup and
fingerprinting. Pure higher-order-function expressions (sequence +
transform + explode) — no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.llm.hashing import MERSENNE_31, SPARK_HASH60


def shingles(
    documents: DataFrame, shingle_size: int = 3, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id[, *carry], shingle) — distinct word n-grams of
    lowercased text.

    Distinctness is enforced with ``array_distinct`` BEFORE the
    explode: doc_id is part of every output row, so all duplicate
    (doc_id, shingle) pairs are within-document, and the per-row
    dedup (a narrow map) replaces what would otherwise be a full
    shuffle of the exploded shingle set. Callers passing a relation
    with repeated doc_id rows must pre-dedupe documents.

    ``carry``: extra per-document columns to ride through the explode
    unchanged. Attaching them here keeps the whole keygen one narrow
    map stage — joining them back onto the exploded relation
    afterwards costs a shuffle of the (much larger) shingle set
    (measured 3.3 s vs 0.8 s on the sf0.1 bench load leg).
    """
    n = int(shingle_size)
    # explicit per-position indexing instead of slice(toks, i, n):
    # slice allocates an n-element array per position just to feed
    # concat_ws; direct element references skip the copy (measured
    # 38 s -> 26 s for the 26M-shingle keygen on the 100x perf slice)
    cells = ", ".join(f"toks[i + {j - 1}]" for j in range(n))
    return documents.select(
        "doc_id",
        *carry,
        F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+").alias("toks"),
    ).select(
        "doc_id",
        *carry,
        # guard: sequence(1, 0) would generate a DESCENDING [1, 0]
        # in Spark, so short documents get an explicit empty array
        F.explode(
            F.expr(
                f"CASE WHEN size(toks) >= {n} THEN "
                f"array_distinct(transform(sequence(1, size(toks) - {n - 1}),"
                f" i -> concat_ws(' ', {cells}))) "
                f"ELSE array() END"
            )
        ).alias("shingle"),
    )


def shingle_hashes(documents: DataFrame, shingle_size: int = 3) -> DataFrame:
    """(doc_id, h, h31): 60-bit md5 hash per distinct shingle, plus the
    31-bit reduction used by MinHash permutations."""
    return shingles(documents, shingle_size).select(
        "doc_id",
        F.expr(SPARK_HASH60.format(x="shingle")).alias("h"),
    ).withColumn("h31", F.col("h") % MERSENNE_31)
