"""CEP — Cardinality Edge Pruning (global top-K).

Reference parity: python/sparker/cep.py:230-300 (cep), :134-228
(calc_thresholds). K = floor(Σ block sizes / 2) (cep.py:282-283).

The reference collects a global weight-frequency histogram, finds the
cut weight t such that edges with weight > t number < K, then
allocates per-profile quotas of edges at weight == t in
dict-iteration order — nondeterministic (SURVEY §7.2). This engine
keeps identical semantics for the histogram and cut weight, and makes
the tie allocation deterministic: ties at weight == t are ranked by
(p1, p2) and the first `remaining` survive.

Physical plan: the histogram is a groupBy(weight) — small — and the
tie ranking is a window over the single weight==t slice, so no global
sort of the full edge set ever happens.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.metablocking.pruning_utils import WeightTypes
from sparker_spark.metablocking.weights import EdgeContext, EdgeWeighting


class CEP:
    @staticmethod
    def num_edges_to_keep(blocks: BlockCollection) -> int:
        total = blocks.meta.agg(F.sum("block_size").alias("s")).first()["s"] or 0
        return int(math.floor(total / 2))

    @staticmethod
    def prune(ctx: EdgeContext, k: int) -> DataFrame:
        half = ctx.half().cache()
        hist = (
            half.groupBy("weight")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("weight").desc())
        )
        w = Window.orderBy(F.col("weight").desc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = hist.select("weight", "cnt", F.sum("cnt").over(w).alias("cum"))
        # cut weight: first level (desc) where cumulative count reaches K
        row = (
            cum.where(F.col("cum") >= F.lit(int(k)))
            .orderBy(F.col("weight").desc())
            .limit(1)
            .collect()
        )
        if not row:
            return half  # fewer edges than K: keep everything
        threshold = row[0]["weight"]
        cum_at_t = row[0]["cum"]
        cnt_at_t = row[0]["cnt"]
        remaining = cnt_at_t - (cum_at_t - int(k))

        above = half.where(F.col("weight") > F.lit(threshold))
        tie_w = Window.orderBy("p1", "p2")
        ties = (
            half.where(F.col("weight") == F.lit(threshold))
            .withColumn("rn", F.row_number().over(tie_w))
            .where(F.col("rn") <= F.lit(int(remaining)))
            .drop("rn")
        )
        return above.unionByName(ties)

    @staticmethod
    def cep(
        blocks: BlockCollection,
        profile_blocks_filtered: DataFrame,
        weight_type: str = WeightTypes.CBS,
        use_entropy: bool = False,
    ) -> DataFrame:
        ctx = EdgeWeighting.weighted_edges(
            blocks, profile_blocks_filtered, weight_type, use_entropy
        )
        return CEP.prune(ctx, CEP.num_edges_to_keep(blocks))
