"""WNP — Weighted Node Pruning (+ BLAST's chi-square variant).

Reference parity: python/sparker/wnp.py:231-298 (wnp), :192-229
(calc_thresholds), :26-77 (do_pruning).

Two passes, exactly like the reference but as DataFrame aggregates:
 1. per-profile local threshold over the FULL directed neighborhood
    (avg, or max/2) — a groupBy instead of a collected+broadcast map;
 2. keep the `p1 < p2` half of the edges whose weight passes the
    endpoint thresholds under AND/OR, or BLAST's
    sqrt(t1² + t2²)/chi2divider rule for chi-square (wnp.py:47-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.metablocking.pruning_utils import (
    ComparisonTypes,
    ThresholdTypes,
    WeightTypes,
)
from sparker_spark.metablocking.weights import EdgeContext, EdgeWeighting


class WNP:
    # broadcast the per-profile threshold relation when it has at most
    # this many rows (~150 MB hashed); larger collections keep the
    # shuffled join — a billion-profile run must not OOM the driver
    BROADCAST_THRESHOLDS_MAX = 2_000_000

    @staticmethod
    def calc_thresholds(ctx: EdgeContext, threshold_type: str) -> DataFrame:
        """(profile_id, threshold) — wnp.py:192-229.

        For symmetric weight types the context stores only the
        src <= dst base relation; the directed view unions base with
        its mirror, i.e. TWO scans of the checkpointed base. The
        per-profile aggregate is instead computed with ONE scan by
        exploding each base row to both endpoints (a self-loop
        contributes once, exactly as it appears once in the directed
        view). Asymmetric types (ARCS/EJS) keep the full directed
        relation and aggregate it directly."""
        if threshold_type == ThresholdTypes.AVG:
            agg = F.avg("weight")
        elif threshold_type == ThresholdTypes.MAX_FRACT_2:
            agg = F.max("weight") / 2.0
        else:
            raise ValueError(f"invalid threshold type: {threshold_type}")
        base = ctx._base
        if base is not None:
            ends = F.when(
                F.col("src") == F.col("dst"), F.array("src")
            ).otherwise(F.array("src", "dst"))
            per_endpoint = base.select(
                F.explode(ends).alias("profile_id"), "weight"
            )
            return per_endpoint.groupBy("profile_id").agg(
                agg.alias("threshold")
            )
        return ctx.edges.groupBy(F.col("src").alias("profile_id")).agg(
            agg.alias("threshold")
        )

    @staticmethod
    def prune(
        ctx: EdgeContext,
        threshold_type: str = ThresholdTypes.AVG,
        comparison_type: str = ComparisonTypes.OR,
        chi2divider: float = 2.0,
    ) -> DataFrame:
        """Pruned edges (p1, p2, weight) with p1 < p2 — wnp.py:26-77."""
        if comparison_type not in (ComparisonTypes.AND, ComparisonTypes.OR):
            raise ValueError(f"invalid comparison type: {comparison_type}")
        ctx.materialize()  # thresholds + half legs share one edge scan
        # Broadcast the (profile, threshold) relation into BOTH
        # endpoint joins when it is small: thresholds is #profiles
        # rows, orders of magnitude below the edge relation, and
        # broadcast-hash joins remove the edge relation's exchange
        # from the prune leg entirely. The row-count guard keeps a
        # billion-profile run off the broadcast plan; on that large
        # path the thresholds are eagerly checkpointed so the two
        # shuffled join legs don't each recompute the aggregate.
        thresholds = WNP.calc_thresholds(ctx, threshold_type)
        # guard count = #distinct profiles (the thresholds relation's
        # true size). ctx.profiles is the MEMBERSHIP relation (one row
        # per profile/block pair, cached in every flow) — a plain
        # count() overstates #profiles by the avg-blocks-per-profile
        # factor and wrongly kicks mid-size corpora off the broadcast
        # plan; an approximate distinct over the cached relation is a
        # single narrow pass and the guard doesn't need exactness.
        if ctx.profiles is not None:
            # membership rows >= distinct profiles, so a cheap count()
            # of the cached relation decides the common small case
            # without the distinct aggregate
            n_profiles = ctx.profiles.count()
            if n_profiles > WNP.BROADCAST_THRESHOLDS_MAX:
                # approx_count_distinct's ~5 % rsd can UNDERestimate a
                # just-over-the-limit relation; shrink the effective
                # threshold on this path so estimator error can't
                # admit an oversized broadcast (a false negative only
                # costs the shuffled plan, which is correct anyway)
                n_profiles = ctx.profiles.agg(
                    F.approx_count_distinct("profile_id").alias("n")
                ).first()["n"]
                small = n_profiles <= 0.9 * WNP.BROADCAST_THRESHOLDS_MAX
            else:
                small = True
        else:
            n_profiles = thresholds.count()
            small = n_profiles <= WNP.BROADCAST_THRESHOLDS_MAX
        # t1/t2 are independent plan legs, so on the broadcast path the
        # threshold aggregate runs once per build. That is only safe
        # when the aggregate is merge-order-invariant: MAX is, and AVG
        # over the integer-valued CBS weights sums exactly in doubles —
        # but AVG over fractional weights (JS/ECBS/chi2/ARCS/EJS) can
        # differ in the last ulp between the two builds, flipping edges
        # that tie a threshold exactly under AND/OR. Those pin ONE
        # snapshot with a LAZY localCheckpoint (materialized by the
        # first broadcast build, reused by the second); CBS/MAX keep
        # the uncheckpointed plan, which measures ~2x faster on the hot
        # shingle leg (no collect-and-persist round-trip).
        needs_pin = (
            threshold_type == ThresholdTypes.AVG
            and ctx.weight_type != WeightTypes.CBS
        )
        if not small:
            thresholds = thresholds.localCheckpoint(eager=True)
        elif needs_pin:
            thresholds = thresholds.localCheckpoint(eager=False)
        half = ctx.half()
        t1 = thresholds.select(
            F.col("profile_id").alias("p1"), F.col("threshold").alias("t1")
        )
        t2 = thresholds.select(
            F.col("profile_id").alias("p2"), F.col("threshold").alias("t2")
        )
        if small:
            t1, t2 = F.broadcast(t1), F.broadcast(t2)
        joined = half.join(t1, "p1").join(t2, "p2")
        if ctx.weight_type == WeightTypes.CHI_SQUARE:
            # BLAST rule, wnp.py:47-60
            thr = F.sqrt(F.pow(F.col("t1"), 2.0) + F.pow(F.col("t2"), 2.0)) / float(
                chi2divider
            )
            kept = joined.where(F.col("weight") >= thr)
        elif comparison_type == ComparisonTypes.AND:
            kept = joined.where(
                (F.col("weight") >= F.col("t1")) & (F.col("weight") >= F.col("t2"))
            )
        else:
            kept = joined.where(
                (F.col("weight") >= F.col("t1")) | (F.col("weight") >= F.col("t2"))
            )
        return kept.select("p1", "p2", "weight")

    @staticmethod
    def wnp(
        blocks: BlockCollection,
        profile_blocks_filtered: DataFrame,
        threshold_type: str = ThresholdTypes.AVG,
        weight_type: str = WeightTypes.CBS,
        use_entropy: bool = False,
        chi2divider: float = 2.0,
        comparison_type: str = ComparisonTypes.OR,
    ) -> DataFrame:
        """End-to-end WNP (wnp.py:231-298): weight edges then prune.
        Returns the retained edges DataFrame (p1, p2, weight)."""
        ctx = EdgeWeighting.weighted_edges(
            blocks, profile_blocks_filtered, weight_type, use_entropy
        )
        return WNP.prune(ctx, threshold_type, comparison_type, chi2divider)

    @staticmethod
    def get_all_edges(
        blocks: BlockCollection,
        profile_blocks_filtered: DataFrame,
        weight_type: str = WeightTypes.CBS,
        use_entropy: bool = False,
    ) -> DataFrame:
        """Full weighted graph, no pruning (wnp.py:300-351). Returns
        the p1 < p2 half."""
        ctx = EdgeWeighting.weighted_edges(
            blocks, profile_blocks_filtered, weight_type, use_entropy
        )
        return ctx.half()
