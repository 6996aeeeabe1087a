"""Distributed banded range join.

``left ⋈ right ON key AND |left.val − right.val| <= radius`` written as
a raw inequality join plans as a BroadcastNestedLoopJoin — O(n·m) at
any scale. The banded rewrite buckets both sides by
``floor(val / radius)``: every in-radius partner lives in the same or
an adjacent bucket, so exploding the left side into its 3 candidate
buckets turns the plan into a shuffled equi-join on (key, bucket) with
the radius check as a residual filter. Shuffle volume is 3·|left| +
|right| rows, candidate volume is bounded by bucket co-membership —
the same construction GSPSN uses for its positional window
(progressive.py) and SimHash for Hamming bands (llm/dedup.py), exposed
as a general operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RangeJoin:
    @staticmethod
    def within(
        left: DataFrame,
        right: DataFrame,
        on: list[str] | str,
        radius: float,
        left_val: str = "val",
        right_val: str = "val",
        right_prefix: str = "r_",
    ) -> DataFrame:
        """Inner join of rows with equal ``on`` keys and numeric values
        within ``radius`` of each other (inclusive). Timestamps: pass a
        numeric projection (e.g. ``unix_micros(ts)``) as the value
        column. Right columns return prefixed with ``right_prefix``.
        """
        keys = [on] if isinstance(on, str) else list(on)
        r = float(radius)
        lb = F.floor(F.col(left_val) / F.lit(r))
        a = left.withColumn(
            "_bucket", F.explode(F.array(lb - 1, lb, lb + 1))
        )
        b = right.select(
            *[F.col(k) for k in keys],
            F.floor(F.col(right_val) / F.lit(r)).alias("_bucket"),
            *[
                F.col(c).alias(f"{right_prefix}{c}")
                for c in right.columns
                if c not in keys
            ],
        )
        joined = a.join(b, [*keys, "_bucket"]).where(
            F.abs(F.col(left_val) - F.col(f"{right_prefix}{right_val}"))
            <= F.lit(r)
        )
        return joined.drop("_bucket")
