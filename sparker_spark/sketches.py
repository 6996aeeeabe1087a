"""Distributed frequency sketches.

Count-min sketch built as a DataFrame aggregate: each input row
explodes into ``depth`` (row, bucket) cells via independent seeded
hashes, one groupBy produces the d×w counter table. The sketch is a
tiny relation (d·w cells) with EXACT merge semantics — cell-wise sum —
so per-partition/per-day sketches combine associatively, which is the
whole point at 100 TB: one pass over the data, constant-size state,
and skew diagnostics (hot blocking keys, heavy-hitter tokens) without
a full groupBy over the key space.

Estimates are the classic one-sided CM guarantee: estimate >= true
count, with overestimate bounded by (e/w)·N at probability 1−(1/e)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CountMinSketch:
    @staticmethod
    def build(
        df: DataFrame,
        col: str,
        width: int = 1024,
        depth: int = 4,
        seed: int = 1234,
    ) -> DataFrame:
        """One pass -> sketch relation (j, bucket, n) with d·w rows at
        most. ``xxhash64(value, seed+j)`` gives the d independent row
        hashes — JVM-side, no UDFs."""
        rows = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.pmod(F.xxhash64(F.col(col), F.lit(seed + j)), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for j in range(depth)
            ]
        )
        return (
            df.select(F.explode(rows).alias("cell"))
            .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
            .agg(F.count("*").alias("n"))
        )

    @staticmethod
    def merge(*sketches: DataFrame) -> DataFrame:
        """Cell-wise sum — exact, associative, commutative."""
        out = sketches[0]
        for s in sketches[1:]:
            out = out.unionByName(s)
        return out.groupBy("j", "bucket").agg(F.sum("n").alias("n"))

    @staticmethod
    def estimate(
        sketch: DataFrame,
        values: DataFrame,
        col: str,
        width: int = 1024,
        depth: int = 4,
        seed: int = 1234,
    ) -> DataFrame:
        """Distributed point queries: for each row of ``values``, the
        CM estimate of ``col``'s frequency — min over the d probed
        cells (absent cell = 0). The sketch side is d·w rows, so the
        probe join broadcasts."""
        probes = values.select(
            F.col(col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.pmod(
                                F.xxhash64(F.col(col), F.lit(seed + j)), F.lit(width)
                            ).alias("bucket"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("cell"),
        ).select(col, F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
        return (
            probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
            .fillna({"n": 0})
            .groupBy(col)
            .agg(F.min("n").alias("estimate"))
        )
