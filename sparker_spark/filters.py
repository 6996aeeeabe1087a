"""Block refinement: purging and filtering.

Reference parity: python/sparker/filters.py:5-117 (BlockPurging,
BlockFiltering) and scala/.../BlockPurging.scala:26-110,
BlockFiltering.scala:29-48.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import BlockCollection
from sparker_spark.blocking.converters import Converters

# Python round() is banker's (half-to-even); Spark's round() is
# half-up and DuckDB's likewise, so block filtering uses this explicit
# half-even SQL fragment — textually identical in the engine and in
# the DuckDB oracle — to replicate filters.py:79 exactly.
ROUND_HALF_EVEN_SQL = (
    "CASE WHEN {x} - floor({x}) = 0.5 THEN "
    "CAST(CASE WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 "
    "THEN floor({x}) ELSE ceil({x}) END AS BIGINT) "
    "ELSE CAST(round({x}, 0) AS BIGINT) END"
)


class BlockPurging:
    @staticmethod
    def max_comparisons_allowed(meta: DataFrame, smooth_factor: float) -> int | None:
        """Compute the purging threshold (a driver scalar, like the
        reference filters.py:34-55 which collects the level histogram).

        Levels = distinct comparison counts, ascending, with cumulative
        sums of comparisons (cc) and block sizes (bc). Scanning from the
        top level down, the first level i where
        ``cc_bc[i]·cc_cc[i+1] < smooth·cc_cc[i]·cc_bc[i+1]`` holds wins
        and the threshold is level[i+1]; the scan-from-top-first-hit is
        equivalent to MAX over qualifying i. Fallback when no level
        qualifies: level[1] (the reference's loop leaves previous_size
        at input[1] — filters.py:40-52).
        """
        levels = (
            meta.groupBy(F.col("comparisons").alias("level"))
            .agg(
                F.sum("comparisons").alias("cc"),
                F.sum("block_size").alias("bc"),
            )
        )
        w = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, 0)
        cum = levels.select(
            "level",
            F.sum("cc").over(w).alias("cum_cc"),
            F.sum("bc").over(w).alias("cum_bc"),
        )
        lead_w = Window.orderBy("level")
        cand = cum.select(
            "level",
            "cum_cc",
            "cum_bc",
            F.lead("level").over(lead_w).alias("next_level"),
            F.lead("cum_cc").over(lead_w).alias("next_cc"),
            F.lead("cum_bc").over(lead_w).alias("next_bc"),
        )
        row = cand.agg(
            F.max(
                F.when(
                    F.col("cum_bc") * F.col("next_cc")
                    < F.lit(float(smooth_factor)) * F.col("cum_cc") * F.col("next_bc"),
                    F.col("next_level"),
                )
            ).alias("threshold"),
            F.min("next_level").alias("fallback"),
        ).first()
        threshold = row["threshold"]
        if threshold is None:
            threshold = row["fallback"]  # None too when only one level
        return threshold

    @staticmethod
    def block_purging(blocks: BlockCollection, smooth_factor: float) -> BlockCollection:
        """Drop oversized blocks (filters.py:5-57). The threshold is a
        collected scalar — O(#distinct levels) — everything else stays
        distributed."""
        threshold = BlockPurging.max_comparisons_allowed(blocks.meta, smooth_factor)
        if threshold is None:
            # single comparison level: reference returns 0 and purges
            # everything; we keep everything instead (documented
            # deviation — purging a uniform collection is never useful).
            return blocks
        meta = blocks.meta.where(F.col("comparisons") <= F.lit(int(threshold)))
        assignments = blocks.assignments.join(meta.select("block_id"), "block_id")
        return BlockCollection(assignments=assignments, meta=meta, clean=blocks.clean)


class BlockFiltering:
    @staticmethod
    def block_filtering(profile_blocks: DataFrame, r: float) -> DataFrame:
        """Per profile, keep its blocks with fewest comparisons.

        Python reference semantics (filters.py:75-89, tie-inclusive):
        sort the profile's blocks by comparisons ascending, find the
        comparison count at 0-based index
        ``clamp(round_half_even(n·r) - 1 if >0, [0, n-1])`` and keep
        every block with comparisons <= that cutoff.

        Expressed as two window functions over (profile_id) — no
        collected state, scales to any #profiles.
        """
        w = Window.partitionBy("profile_id").orderBy("comparisons", "block_id")
        wall = Window.partitionBy("profile_id")
        idx_sql = ROUND_HALF_EVEN_SQL.format(x=f"(n * CAST({float(r)} AS DOUBLE))")
        ranked = (
            profile_blocks.withColumn("rn", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wall))
            .withColumn("idx0", F.expr(idx_sql))
            .withColumn(
                "idx",
                F.least(
                    F.greatest(F.col("idx0") - 1, F.lit(0)), F.col("n") - 1
                ),
            )
            .withColumn(
                "cutoff",
                F.max(
                    F.when(F.col("rn") == F.col("idx") + 1, F.col("comparisons"))
                ).over(wall),
            )
        )
        return ranked.where(F.col("comparisons") <= F.col("cutoff")).select(
            "profile_id", "source_id", "block_id", "comparisons"
        )

    @staticmethod
    def block_filtering_quick(
        blocks: BlockCollection, r: float
    ) -> tuple[DataFrame, DataFrame, BlockCollection]:
        """Composite (filters.py:93-117): blocks -> profile_blocks ->
        filtered profile_blocks -> rebuilt blocks."""
        profile_blocks = Converters.blocks_to_profile_blocks(blocks)
        filtered = BlockFiltering.block_filtering(profile_blocks, r)
        rebuilt = Converters.profile_blocks_to_blocks(filtered, blocks)
        return profile_blocks, filtered, rebuilt
