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
tie ranking runs through the distributed two-phase ranker
(``ranking.global_rank``), so no global sort and no single-partition
window ever touches the edge set. This matters because for
integer-valued weights (CBS) the ``weight == cut`` tie slice can be a
large fraction of all edges.

The pruned result (≤ K edges — bounded by construction, K = ⌊Σ block
sizes / 2⌋) is eagerly materialized with ``localCheckpoint`` so the
cached full edge set can be unpersisted before returning: repeated CEP
invocations in a long-lived session do not accumulate cached
partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.metablocking.pruning_utils import WeightTypes
from sparker_spark.metablocking.weights import EdgeContext, EdgeWeighting
from sparker_spark import ranking
from sparker_spark.ranking import global_rank


class CEP:
    @staticmethod
    def num_edges_to_keep(blocks: BlockCollection) -> int:
        total = blocks.meta.agg(F.sum("block_size").alias("s")).first()["s"] or 0
        return int(math.floor(total / 2))

    @staticmethod
    def prune(ctx: EdgeContext, k: int) -> DataFrame:
        half = ctx.half().cache()
        try:
            hist = half.groupBy("weight").agg(F.count("*").alias("cnt"))
            # running totals over the weight-level histogram via the
            # distributed cumsum — for continuous weights (JS, chi²)
            # the histogram can approach the edge count, so even this
            # stage must not single-partition
            cum = ranking.global_cumsum(
                hist, ["weight"], "cnt", out="cum", descending=True
            )
            # cut weight: first level (desc) where cumulative count reaches K
            row = (
                cum.where(F.col("cum") >= F.lit(int(k)))
                .orderBy(F.col("weight").desc())
                .limit(1)
                .collect()
            )
            ranking.release(cum)
            if not row:
                # fewer edges than K: keep everything (< K rows — bounded)
                return half.localCheckpoint(eager=True)
            threshold = row[0]["weight"]
            cum_at_t = row[0]["cum"]
            cnt_at_t = row[0]["cnt"]
            remaining = cnt_at_t - (cum_at_t - int(k))

            above = half.where(F.col("weight") > F.lit(threshold))
            ranked = None
            if remaining > 0:
                # deterministic tie break at weight == cut: rank by
                # (p1, p2) with the distributed ranker and keep the
                # first `remaining` — no single-partition window even
                # when the tie slice is most of the edge set
                ranked = global_rank(
                    half.where(F.col("weight") == F.lit(threshold)),
                    ["p1", "p2"],
                    out="_rn",
                )
                ties = ranked.where(F.col("_rn") < F.lit(int(remaining))).drop("_rn")
                result = above.unionByName(ties)
            else:
                result = above
            # ≤ K rows by construction — safe to materialize; lets the
            # full cached edge set be released in finally
            out = result.localCheckpoint(eager=True)
            if ranked is not None:
                ranking.release(ranked)
            return out
        finally:
            half.unpersist()

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
