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


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark import ranking
from sparker_spark.ranking import global_topk


class SupervisedMB:
    @staticmethod
    def bcl(edges: DataFrame) -> DataFrame:
        """Binary-classifier pruning (supervised_metablocking.py:8-13)."""
        return edges.filter("is_match == 1")

    @staticmethod
    def cep(edges: DataFrame, total_block_size: int) -> DataFrame:
        """Cardinality edge pruning: top-⌊Σ block sizes / 2⌋ by p_match
        among the >= 0.5 subset (supervised_metablocking.py:16-25).
        Deterministic ties: the kept set is exactly the first K rows
        under ORDER BY (p_match desc, p1, p2).

        Same physical plan as unsupervised CEP (``ranking.global_topk``
        — one range shuffle, partition-local sort only at the
        K-boundary). p_match is continuous, so a score histogram would
        have one group per edge; the range plan is distribution-blind.
        The ≤ K-row result is eagerly materialized so the shuffle cache
        can be released (no cache accumulation across invocations)."""
        k = int(total_block_size / 2)
        over_t = edges.filter("p_match >= 0.5")
        kept = global_topk(
            over_t, [("p_match", True), ("p1", False), ("p2", False)], k
        )
        out = kept.localCheckpoint(eager=True)
        ranking.release(kept)
        return out

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
