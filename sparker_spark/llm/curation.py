"""Corpus-curation operators for training-data pipelines:
benchmark decontamination and repetition-based quality statistics.

Extensions beyond the reference's ER surface (SURVEY §7.1 M8) — the
two document-level checks every pretraining pipeline runs before
tokenization:

* **Decontamination** — flag training documents that share word
  n-grams with an evaluation/benchmark set (the standard 13-gram
  overlap check, n configurable). The mechanism is the same
  shingle-hash relation the dedup family uses (llm/shingles.py):
  both sides reduce to ``(doc_id, h)`` with the portable 60-bit md5
  hash, and contamination is one equi-join on ``h``. At corpus scale
  the eval side is tiny (thousands of documents vs billions), so AQE
  broadcasts its distinct-hash relation and the training corpus is
  never shuffled — the check costs one scan of the train shingles.

* **Repetition statistics** (Gopher-style quality filters, Rae et
  al. 2021 §A1.1): per-document duplicate-line fraction (row- and
  character-weighted) and duplicate / most-frequent word-n-gram
  fractions. Everything reduces to explode → count by
  ``(doc_id, unit)`` → re-aggregate per document: the shuffle key
  always contains ``doc_id``, so the aggregation state for one
  document never exceeds its own distinct-unit count and the job
  partitions evenly at any corpus size. Pure column expressions +
  hash aggregates; no UDFs, no windows, no driver state.

Both are deterministic and engine-portable — the DuckDB oracles in
entry_r3d.py replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.llm.shingles import shingle_hashes
from sparker_spark.rounding import rnd


class Decontamination:
    @staticmethod
    def overlap_ngrams(
        train: DataFrame, eval_docs: DataFrame, n: int = 13
    ) -> DataFrame:
        """Per-train-document count of distinct word ``n``-grams that
        also occur anywhere in ``eval_docs``.

        Returns ``(doc_id, n_overlap_ngrams, n_ngrams, contaminated)``
        with one row per train document (zero counts included, so the
        output is a total function of the train corpus — callers can
        filter ``contaminated`` without an extra anti-join).

        Scale posture: ``shingle_hashes`` emits DISTINCT n-grams per
        document hashed to 8-byte ints, so the join carries no text.
        The eval hash set is deduplicated across documents before the
        join — its size is bounded by the benchmark corpus, not the
        training corpus — and the equi-join lets AQE broadcast it.
        """
        tr = shingle_hashes(train, n)
        ev = (
            shingle_hashes(eval_docs, n)
            .select("h")
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        # one pass over the train shingles: the left join marks eval
        # hits in-stream and a single hash aggregate produces both the
        # total and the overlap count
        agg = (
            tr.join(ev, "h", "left")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_ngrams"),
                F.sum(F.coalesce("hit", F.lit(0))).alias("n_overlap_ngrams"),
            )
        )
        return train.select("doc_id").join(agg, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_overlap_ngrams", F.lit(0))
            .cast("long")
            .alias("n_overlap_ngrams"),
            (F.coalesce("n_overlap_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )


class RepetitionStats:
    @staticmethod
    def line_stats(documents: DataFrame) -> DataFrame:
        """Per-document duplicate-line statistics over non-empty
        trimmed lines: ``(doc_id, n_lines, dup_line_frac,
        dup_line_char_frac)``.

        ``dup_line_frac`` is the fraction of line INSTANCES whose line
        occurs more than once in the document; ``dup_line_char_frac``
        weights the same numerator by line length (the Gopher variant).
        Documents with no non-empty lines report zero fractions.
        """
        lines = documents.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
                    lambda x: x != "",
                )
            ).alias("line"),
        )
        per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("cnt"))
        dup = F.col("cnt") > 1
        chars = F.length("line").cast("double") * F.col("cnt")
        agg = per_line.groupBy("doc_id").agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.sum(F.when(dup, F.col("cnt")).otherwise(0)).alias("dup_lines"),
            F.sum(chars).alias("line_chars"),
            F.sum(F.when(dup, chars).otherwise(0.0)).alias("dup_chars"),
        )
        return documents.select("doc_id").join(agg, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            rnd(
                F.when(
                    F.col("n_lines") > 0, F.col("dup_lines") / F.col("n_lines")
                ).otherwise(0.0),
                6,
            ).alias("dup_line_frac"),
            rnd(
                F.when(
                    F.col("line_chars") > 0, F.col("dup_chars") / F.col("line_chars")
                ).otherwise(0.0),
                6,
            ).alias("dup_line_char_frac"),
        )

    @staticmethod
    def ngram_stats(documents: DataFrame, n: int = 2) -> DataFrame:
        """Per-document word-``n``-gram repetition: ``(doc_id,
        n_ngrams, top_ngram_frac, dup_ngram_frac)`` where
        ``top_ngram_frac`` is the share of n-gram instances taken by
        the single most frequent n-gram and ``dup_ngram_frac`` the
        share of instances whose n-gram repeats (the Gopher top-2-gram
        / dup-3-gram pair of filters, occurrence-weighted).

        Unlike the dedup shingles, instances are NOT deduplicated —
        repetition is the signal here.
        """
        n = int(n)
        grams = documents.select(
            "doc_id",
            F.split(F.lower(F.col("text")), "\\s+").alias("toks"),
        ).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(toks) >= {n} THEN "
                    f"transform(sequence(1, size(toks) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(toks, i, {n}))) "
                    f"ELSE array() END"
                )
            ).alias("gram"),
        )
        per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
        agg = per_gram.groupBy("doc_id").agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.max("cnt").alias("max_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_cnt"
            ),
        )
        return documents.select("doc_id").join(agg, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            rnd(
                F.when(
                    F.col("n_ngrams") > 0, F.col("max_cnt") / F.col("n_ngrams")
                ).otherwise(0.0),
                6,
            ).alias("top_ngram_frac"),
            rnd(
                F.when(
                    F.col("n_ngrams") > 0, F.col("dup_cnt") / F.col("n_ngrams")
                ).otherwise(0.0),
                6,
            ).alias("dup_ngram_frac"),
        )
