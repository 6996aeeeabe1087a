"""CEP — Cardinality Edge Pruning (global top-K).

Reference parity: python/sparker/cep.py:230-300 (cep), :134-228
(calc_thresholds). K = floor(Σ block sizes / 2) (cep.py:282-283).

The reference collects a global weight-frequency histogram, finds the
cut weight t such that edges with weight > t number < K, then
allocates per-profile quotas of edges at weight == t in
dict-iteration order — nondeterministic (SURVEY §7.2). This engine
keeps the same selected-set semantics up to the tie allocation, which
it makes deterministic: the kept set is exactly the first K edges
under ORDER BY (weight desc, p1, p2).

Physical plan: that top-K runs through ``ranking.global_topk`` — one
range shuffle on the sort key, whole partitions below the K-boundary
kept unsorted, a partition-local sort only on the single boundary
partition. This replaced a histogram + cut-weight + tie-rank plan:
for continuous weights (JS, chi², LR scores) the weight histogram has
one group per edge, so "collect the small histogram" degenerated into
three full-size shuffles; the range plan costs one, for any weight
distribution, at any scale.

The pruned result (≤ K edges — bounded by construction) is eagerly
materialized with ``localCheckpoint`` so the cached edge set can be
unpersisted before returning: repeated CEP invocations in a long-lived
session do not accumulate cached partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark import ranking
from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.metablocking.pruning_utils import WeightTypes
from sparker_spark.metablocking.weights import EdgeContext, EdgeWeighting
from sparker_spark.ranking import global_topk


class CEP:
    @staticmethod
    def num_edges_to_keep(blocks: BlockCollection) -> int:
        total = blocks.meta.agg(F.sum("block_size").alias("s")).first()["s"] or 0
        return int(math.floor(total / 2))

    @staticmethod
    def prune(ctx: EdgeContext, k: int) -> DataFrame:
        # NOTE (r12): global_topk's range repartition runs the input
        # lineage twice (boundary sampling + shuffle), but
        # ctx.materialize() here measured SLOWER (4.1 s vs 3.5 s at
        # sf0.1): the weighting re-run over the cached block relations
        # is cheaper than writing the full edge relation once. Left
        # unmaterialized deliberately.
        half = ctx.half()
        kept = global_topk(
            half, [("weight", True), ("p1", False), ("p2", False)], int(k)
        )
        # ≤ K rows by construction — safe to materialize eagerly, which
        # lets the range-shuffle cache be released before returning
        out = kept.localCheckpoint(eager=True)
        ranking.release(kept)
        return out

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
