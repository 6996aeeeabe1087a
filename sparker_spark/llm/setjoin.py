"""Prefix-filtered set-similarity join (PPJoin-style candidate
generation) — exact Jaccard self-join over token sets.

This is the third candidate-generation strategy in the dedup family,
complementing the shared-shingle equi-join (every shared token is a
candidate edge — exact but quadratic on hot tokens) and MinHash-LSH
banding (probabilistic). The prefix filter is EXACT and deterministic:
order each document's distinct tokens by ascending global frequency
(rarest first, token string as tiebreak) and keep only the first
``n - ceil(t·n) + 1`` as its *prefix*; two sets with Jaccard >= t must
share at least one prefix token (pigeonhole over the
``inter >= ceil(t/(1+t)·(n1+n2))`` bound, prefix length chosen for the
symmetric Jaccard case), so joining ONLY on prefix tokens loses no
true pair while skipping the frequent-token buckets that dominate the
naive join's cost — the candidate join keys are, by construction, the
RAREST tokens of each document.

Scale posture: the token ordering needs no global rank at all — prefix
membership only depends on each document's OWN ordering of its tokens
under the shared (document-frequency, token) sort key, a per-document
window; everything else is equi-joins and hash aggregates keyed by
token or by pair. No driver state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark.rounding import rnd


class SetSimilarityJoin:
    @staticmethod
    def tokens(documents: DataFrame, text_col: str = "text") -> DataFrame:
        """(doc_id, tok) — distinct lowercase whitespace tokens."""
        return (
            documents.select(
                "doc_id",
                F.explode(F.split(F.lower(F.col(text_col)), "\\s+")).alias("tok"),
            )
            .where(F.length("tok") > 0)
            .distinct()
        )

    @staticmethod
    def prefix_jaccard_pairs(toks: DataFrame, threshold: float) -> DataFrame:
        """Exact Jaccard >= ``threshold`` pairs over ANY distinct
        (doc_id, tok) relation — the PPJoin core shared by the
        whitespace-token join below and the shingle-hash near-dup path
        (Dedup.ngram_jaccard_pairs). Returns
        (p1, p2, inter, n1, n2, jaccard) with jaccard UNROUNDED;
        callers round for their oracle contract. Output is identical
        to the brute-force shared-token join — the prefix filter only
        prunes candidates that cannot reach the threshold."""
        t = float(threshold)
        # ascending document frequency; token value breaks ties so the
        # ordering (and therefore each prefix) is fully deterministic.
        # Prefix membership only depends on each document's OWN
        # ordering of its tokens under the shared (df, tok) sort key —
        # a per-document window, not a global rank: every doc applies
        # the same total order, which is all the correctness argument
        # (two sets at >= t share a prefix token under ANY common
        # total order) requires.
        freq = toks.groupBy("tok").agg(F.count("*").alias("df"))
        ordered = toks.join(freq, "tok")
        w = Window.partitionBy("doc_id").orderBy("df", "tok")
        sized = ordered.withColumn("pos", F.row_number().over(w)).withColumn(
            "n", F.count("*").over(Window.partitionBy("doc_id"))
        )
        # prefix length n - ceil(t*n) + 1
        prefix = sized.where(
            F.col("pos") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
        ).select("doc_id", "tok")

        cand = (
            prefix.select(F.col("doc_id").alias("p1"), "tok")
            .join(prefix.select(F.col("doc_id").alias("p2"), "tok"), "tok")
            .where(F.col("p1") < F.col("p2"))
            .select("p1", "p2")
            .distinct()
        )

        # exact verification: intersection via the token equi-join
        # restricted to candidate pairs (left-semi shrinks each side
        # to candidate docs first)
        sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
        t1 = toks.select(F.col("doc_id").alias("p1"), "tok").join(
            cand.select("p1").distinct(), "p1", "left_semi"
        )
        t2 = toks.select(F.col("doc_id").alias("p2"), "tok").join(
            cand.select("p2").distinct(), "p2", "left_semi"
        )
        inter = (
            cand.join(t1, "p1")
            .join(t2, ["p2", "tok"])
            .groupBy("p1", "p2")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.join(sizes.select(F.col("doc_id").alias("p1"), F.col("n").alias("n1")), "p1")
            .join(sizes.select(F.col("doc_id").alias("p2"), F.col("n").alias("n2")), "p2")
            .withColumn(
                "jaccard",
                F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")),
            )
            .where(F.col("jaccard") >= t)
            .select(
                "p1",
                "p2",
                F.col("inter").cast("long").alias("inter"),
                F.col("n1").cast("long").alias("n1"),
                F.col("n2").cast("long").alias("n2"),
                "jaccard",
            )
        )

    @staticmethod
    def jaccard_prefix_join(
        documents: DataFrame,
        threshold: float,
        text_col: str = "text",
    ) -> DataFrame:
        """All pairs (p1 < p2) with exact whitespace-token-set Jaccard
        >= ``threshold``: (p1, p2, inter, n1, n2, jaccard)."""
        toks = SetSimilarityJoin.tokens(documents, text_col)
        pairs = SetSimilarityJoin.prefix_jaccard_pairs(toks, threshold)
        return pairs.select(
            "p1", "p2", "inter", "n1", "n2", rnd("jaccard", 6).alias("jaccard")
        )
