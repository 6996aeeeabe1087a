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

from sparker_spark.llm.hashing import (
    MERSENNE_31,
    hash60,
    minhash_coefficients,
)


def _portable_h31(col: str, dialect: str) -> str:
    """Engine-portable 31-bit base hash of a column (md5-derived, see
    llm/hashing.py). The value is first cast to string so numeric and
    string keys hash identically in Spark and DuckDB."""
    cast = (
        f"CAST({col} AS STRING)" if dialect == "spark" else f"CAST({col} AS VARCHAR)"
    )
    return f"({hash60(cast, dialect)} % {MERSENNE_31})"


def portable_bucket_sql(j_a_b: tuple[int, int], width: int, h31: str = "_h31") -> str:
    """Affine row hash over a pre-reduced 31-bit base hash — valid in
    both Spark SQL and DuckDB (a·x fits in int64 since a, x < 2^31)."""
    a, b = j_a_b
    return f"((({a} * {h31} + {b}) % {MERSENNE_31}) % {width})"


def _bucket_col(col: str, j: int, width: int, depth: int, seed: int, portable: bool):
    """Row-j bucket column for either hash family."""
    if not portable:
        return F.pmod(F.xxhash64(F.col(col), F.lit(seed + j)), F.lit(width)).alias(
            "bucket"
        )
    coeffs = minhash_coefficients(depth, seed)
    expr = portable_bucket_sql(coeffs[j], width, _portable_h31(col, "spark"))
    return F.expr(expr).cast("long").alias("bucket")


class CountMinSketch:
    @staticmethod
    def build(
        df: DataFrame,
        col: str,
        width: int = 1024,
        depth: int = 4,
        seed: int = 1234,
        portable: bool = False,
    ) -> DataFrame:
        """One pass -> sketch relation (j, bucket, n) with d·w rows at
        most. Default hash family: ``xxhash64(value, seed+j)`` — JVM-side,
        no UDFs, the fast path. ``portable=True`` switches to the
        md5-affine family (llm/hashing.py) that any engine can
        reproduce bit-for-bit — sketches built by different systems
        only merge correctly when the hash family matches, and this is
        also what the DuckDB oracle replays for the graded query."""
        rows = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _bucket_col(col, j, width, depth, seed, portable),
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
        portable: bool = False,
    ) -> DataFrame:
        """Distributed point queries: for each row of ``values``, the
        CM estimate of ``col``'s frequency — min over the d probed
        cells (absent cell = 0). The sketch side is d·w rows, so the
        probe join broadcasts. ``portable`` must match how the sketch
        was built."""
        probes = values.select(
            F.col(col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bucket_col(col, j, width, depth, seed, portable),
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
