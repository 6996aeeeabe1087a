"""Supervised meta-blocking pruning strategies.

Reference parity: python/sparker/supervised_metablocking.py:8-203.
Input: a DataFrame of scored edges (p1, p2, p_match[, is_match]) —
typically the FeatureGenerator output scored by a pyspark.ml
classifier. All strategies here are UDF-free (the reference uses
BooleanType Python UDFs + driver-collected max/top-k maps —
supervised_metablocking.py:58,111,167; windows + joins replace both).

Top-k tie-breaking: the reference sorts by -p_match only, leaving ties
to input order; we break ties by neighbor id ascending (deterministic).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark import ranking
from sparker_spark.ranking import global_rank


class SupervisedMB:
    @staticmethod
    def bcl(edges: DataFrame) -> DataFrame:
        """Binary-classifier pruning (supervised_metablocking.py:8-13)."""
        return edges.filter("is_match == 1")

    @staticmethod
    def cep(edges: DataFrame, total_block_size: int) -> DataFrame:
        """Cardinality edge pruning: top-⌊Σ block sizes / 2⌋ by p_match
        among the >= 0.5 subset (supervised_metablocking.py:16-25).

        Same histogram + cut-score plan as unsupervised CEP: a global
        row_number window would single-partition the edge set; the only
        global window runs over the (tiny) score histogram, and the
        score==cut tie slice is ranked with the distributed two-phase
        ranker. The ≤ K-row result is eagerly materialized so the
        cached score subset can be released (no cache accumulation
        across invocations)."""
        k = int(total_block_size / 2)
        over_t = edges.filter("p_match >= 0.5").cache()
        try:
            hist = over_t.groupBy("p_match").agg(F.count("*").alias("cnt"))
            # distributed running totals — continuous scores make this
            # histogram as large as the edge set in the worst case
            cum = ranking.global_cumsum(
                hist, ["p_match"], "cnt", out="cum", descending=True
            )
            row = (
                cum.where(F.col("cum") >= F.lit(int(k)))
                .orderBy(F.col("p_match").desc())
                .limit(1)
                .collect()
            )
            ranking.release(cum)
            if not row:
                # fewer edges than K: keep everything (< K rows)
                return over_t.localCheckpoint(eager=True)
            threshold = row[0]["p_match"]
            remaining = row[0]["cnt"] - (row[0]["cum"] - int(k))
            above = over_t.where(F.col("p_match") > F.lit(threshold))
            ranked = None
            if remaining > 0:
                ranked = global_rank(
                    over_t.where(F.col("p_match") == F.lit(threshold)),
                    ["p1", "p2"],
                    out="_rn",
                )
                ties = ranked.where(F.col("_rn") < F.lit(int(remaining))).drop("_rn")
                result = above.unionByName(ties)
            else:
                result = above
            out = result.localCheckpoint(eager=True)
            if ranked is not None:
                ranking.release(ranked)
            return out
        finally:
            over_t.unpersist()

    @staticmethod
    def wep(edges: DataFrame) -> DataFrame:
        """Weight edge pruning: mean p_match of the >= 0.5 subset as
        global threshold (supervised_metablocking.py:28-36)."""
        over_t = edges.filter("p_match >= 0.5")
        threshold = over_t.agg(F.avg("p_match").alias("t")).first()["t"]
        if threshold is None:
            return over_t
        return over_t.where(F.col("p_match") >= F.lit(threshold))

    @staticmethod
    def blast(edges: DataFrame) -> DataFrame:
        """BLAST: keep if p >= 0.35·(max_p(p1) + max_p(p2)) over the
        >= 0.5 subset (supervised_metablocking.py:39-68) — window maxes
        instead of two collected maps + UDF."""
        over_t = edges.filter("p_match >= 0.5")
        w1 = Window.partitionBy("p1")
        w2 = Window.partitionBy("p2")
        return (
            over_t.withColumn("max1", F.max("p_match").over(w1))
            .withColumn("max2", F.max("p_match").over(w2))
            .where(F.col("p_match") >= 0.35 * (F.col("max1") + F.col("max2")))
            .drop("max1", "max2")
        )

    @staticmethod
    def _top_k(edges: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
        """Per-side top-k neighbor sets of the >= 0.5 subset."""
        over_t = edges.filter("p_match >= 0.5")
        w1 = Window.partitionBy("p1").orderBy(F.col("p_match").desc(), "p2")
        w2 = Window.partitionBy("p2").orderBy(F.col("p_match").desc(), "p1")
        top1 = (
            over_t.withColumn("rn", F.row_number().over(w1))
            .where(F.col("rn") <= k)
            .select("p1", "p2")
        )
        top2 = (
            over_t.withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") <= k)
            .select("p1", "p2")
        )
        return top1, top2

    @staticmethod
    def _k(total_block_size: int, n_entities: int) -> int:
        return int(2 * max(1.0, total_block_size / n_entities))

    @staticmethod
    def cnp(edges: DataFrame, total_block_size: int, n_entities: int) -> DataFrame:
        """CNP (OR): keep if the edge is in EITHER side's top-k
        (supervised_metablocking.py:131-180)."""
        k = SupervisedMB._k(total_block_size, n_entities)
        top1, top2 = SupervisedMB._top_k(edges, k)
        over_t = edges.filter("p_match >= 0.5")
        keep = top1.unionByName(top2).distinct()
        return over_t.join(keep, ["p1", "p2"], "left_semi")

    @staticmethod
    def rcnp(edges: DataFrame, total_block_size: int, n_entities: int) -> DataFrame:
        """Reciprocal CNP (AND): edge must be in BOTH sides' top-k
        (supervised_metablocking.py:71-128)."""
        k = SupervisedMB._k(total_block_size, n_entities)
        top1, top2 = SupervisedMB._top_k(edges, k)
        over_t = edges.filter("p_match >= 0.5")
        return over_t.join(top1, ["p1", "p2"], "left_semi").join(
            top2, ["p1", "p2"], "left_semi"
        )

    @staticmethod
    def get_stats(edges: DataFrame, groundtruth: DataFrame, gt_size: int | None = None):
        """PC/PQ/F1 (supervised_metablocking.py:183-203)."""
        from sparker_spark.evaluation import Evaluation

        return Evaluation.get_stats(edges, groundtruth)
