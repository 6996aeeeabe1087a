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


class QualityFilter:
    @staticmethod
    def quantile_cutoff(
        documents: DataFrame,
        frac: float = 0.25,
        group_col: str = "lang",
    ) -> DataFrame:
        """Per-group quality floor: keep documents whose quality score
        (TextAnalysis.quality_score blend) is >= the group's exact
        ``frac``-quantile, defined as the ceil(frac·n)-th smallest
        score — a VALUE cutoff, so tie handling is deterministic and
        engine-independent. Output ``(doc_id, group, quality_score,
        cutoff, kept)`` for every document.

        Plan: score pass (pure column exprs) -> per-group window rank
        to locate the k-th smallest -> broadcast the |groups|-row
        cutoff relation back. Nothing is driver-resident; the window
        partitions by group over (score, doc_id) — at 100 TB a single
        group's sort is a range-partitioned sort, not a single-task
        sort, because only rank k is needed (Spark executes the window
        partition-parallel per group; with few giant groups, swap in
        the exact distributed quantile from stats.py which avoids the
        full sort entirely — this formulation is the oracle-exact
        definition)."""
        from pyspark.sql import Window

        from sparker_spark.llm.text import TextAnalysis

        scores = TextAnalysis.quality_score(documents).select(
            "doc_id", "quality_score"
        ).join(documents.select("doc_id", group_col), "doc_id")
        w = Window.partitionBy(group_col).orderBy("quality_score", "doc_id")
        ranked = scores.withColumn("rk", F.row_number().over(w)).withColumn(
            "n", F.count("*").over(Window.partitionBy(group_col))
        )
        cutoffs = (
            ranked.where(F.col("rk") == F.ceil(F.lit(float(frac)) * F.col("n")))
            .select(group_col, F.col("quality_score").alias("cutoff"))
        )
        return (
            scores.join(F.broadcast(cutoffs), group_col)
            .select(
                "doc_id",
                group_col,
                "quality_score",
                "cutoff",
                (F.col("quality_score") >= F.col("cutoff")).alias("kept"),
            )
        )


# PII patterns: each is valid under BOTH Java regex (Spark) and RE2
# (DuckDB) — no lookarounds, no backreferences — so redaction counts
# are oracle-checkable. Order matters: IPs redact before phones so a
# dotted quad is never half-eaten as a digit run.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\[\]. -]{6,}[0-9]", "<PHONE>"),
]


class Redaction:
    @staticmethod
    def redact_pii(
        documents: DataFrame, text_col: str = "text"
    ) -> DataFrame:
        """PII scrub for pretraining corpora: replaces emails, IPv4
        addresses and phone-number-shaped digit runs with typed
        placeholder tokens, and reports per-document match counts.
        Pure regexp_replace/regexp_count column expressions — JVM-side
        codegen, one scan, no UDFs — so the scrub runs at full scan
        speed on any corpus size. Adds ``redacted_text`` plus one
        ``n_<kind>`` count per pattern.

        The synthetic test corpus contains no PII (letters-only text),
        so correctness is established by fixture unit tests
        (tests/test_curation.py) rather than a corpus-level oracle
        query."""
        # counts run against the PROGRESSIVELY redacted text (an IPv4
        # also matches the phone digit-run shape; redacting it first
        # means it is counted once, as an IP)
        cur = F.col(text_col)
        counts = []
        for kind, pat, token in PII_PATTERNS:
            counts.append(
                F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{kind}")
            )
            cur = F.regexp_replace(cur, pat, token)
        return documents.select(
            "*", *counts, cur.alias("redacted_text")
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
            F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+").alias("toks"),
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


class BoilerplateRemoval:
    # Explicit whitespace class for line splitting/normalization —
    # NOT \s, which differs between Java regex (includes \x0B) and
    # RE2/DuckDB (does not); same portability rule as the shingle
    # splits. Lines split on \r?\n so CRLF corpora normalize to the
    # same keys as LF ones.
    _WS = "[ \t\r\f\x0B]"

    @staticmethod
    def remove_shared_lines(
        documents: DataFrame, min_docs: int = 2
    ) -> DataFrame:
        """Cross-corpus line-level boilerplate removal (the CCNet /
        CC-style cleanup): drop every line whose whitespace-trimmed
        form appears in >= ``min_docs`` DISTINCT documents (navigation
        chrome, license banners, templated footers), keep everything
        else in original order, and re-join with newlines. Returns one
        row per input document: ``(doc_id, n_lines_kept,
        n_lines_dropped, text)`` — text '' when every line was
        boilerplate.

        Scale: explode once -> hash-aggregate by normalized line ->
        one left join back -> ONE conditional aggregate per doc
        (count/collect_list skip the matched rows via when()). Every
        shuffle key is either the line key or doc_id; whitespace-only
        lines normalize to '' and never enter the frequency relation
        (the degenerate hot key), and AQE's skew-join split covers hot
        boilerplate lines. No UDFs, no windows over the corpus, no
        driver state.
        """
        ws = BoilerplateRemoval._WS
        lines = documents.select(
            "doc_id",
            F.posexplode(F.split("text", "\r?\n")).alias("idx", "ln"),
        ).withColumn(
            "key",
            F.regexp_replace("ln", f"^{ws}+|{ws}+$", ""),
        )
        freq = (
            lines.where(F.col("key") != "")
            .groupBy("key")
            .agg(F.countDistinct("doc_id").alias("ndocs"))
            .where(F.col("ndocs") >= min_docs)
            .select("key", F.lit(True).alias("_shared"))
        )
        flagged = lines.join(freq, "key", "left")
        kept_line = F.when(
            F.col("_shared").isNull(), F.struct("idx", "ln")
        )  # collect_list skips the NULLs the shared lines become
        return flagged.groupBy("doc_id").agg(
            F.count(kept_line).cast("long").alias("n_lines_kept"),
            (F.count("*") - F.count(kept_line)).cast("long").alias(
                "n_lines_dropped"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_line)),
                    lambda st: st["ln"],
                ),
                "\n",
            ).alias("text"),
        ).select("doc_id", "n_lines_kept", "n_lines_dropped", "text")
