"""Evaluation: PC / PQ / F1 against a converted groundtruth.

Reference parity: python/sparker/utils.py:19-83 (get_statistics, via
accumulators + foreachPartition) and supervised_metablocking.py:183-203
(get_stats). Here: a semi-join + three counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.metablocking.weights import EdgeWeighting


@dataclass
class ERStats:
    pc: float  # pairs completeness (recall)
    pq: float  # pairs quality (precision)
    f1: float
    num_edges: int
    num_matches: int
    num_gt: int


class Evaluation:
    @staticmethod
    def get_stats(edges: DataFrame, gt: DataFrame) -> ERStats:
        """edges(p1,p2,...) vs gt(p1,p2), both with p1 < p2."""
        num_edges = edges.count()
        num_gt = gt.count()
        num_matches = edges.select("p1", "p2").join(gt, ["p1", "p2"], "left_semi").count()
        pc = num_matches / num_gt if num_gt else 0.0
        pq = num_matches / num_edges if num_edges else 0.0
        f1 = 2 * pc * pq / (pc + pq) if (pc + pq) > 0 else 0.0
        return ERStats(pc, pq, f1, num_edges, num_matches, num_gt)

    @staticmethod
    def block_collection_stats(blocks: BlockCollection, gt: DataFrame) -> ERStats:
        """Baseline 'no meta-blocking' PC/PQ straight from a block
        collection (utils.py:19-83, PCPQBlockCalc.scala:16-91): the
        candidate set is every distinct co-occurring pair."""
        pairs = (
            EdgeWeighting.co_occurrence(blocks)
            .where(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("p1"), F.col("dst").alias("p2"))
        )
        num_edges = pairs.count()
        num_gt = gt.count()
        num_matches = pairs.join(gt, ["p1", "p2"], "left_semi").count()
        pc = num_matches / num_gt if num_gt else 0.0
        pq = num_matches / num_edges if num_edges else 0.0
        f1 = 2 * pc * pq / (pc + pq) if (pc + pq) > 0 else 0.0
        return ERStats(pc, pq, f1, num_edges, num_matches, num_gt)
