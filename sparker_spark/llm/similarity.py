"""Similarity search over embedding columns (SURVEY §7.1 M8).

Brute-force top-k cosine as the exact baseline (oracle-checkable), and
an IVF-style bucketed variant as the scale path: candidates are
restricted to the probe's nearest coarse cells, so compute is
O(n·k/cells) instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparker_spark.rounding import rnd

DOT = (
    "aggregate(zip_with(e1, e2, (x, y) -> x * y), CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + x)"
)
NORM = (
    "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
)


def _normed(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("emb"),
        F.expr(NORM).alias("norm"),
    )


class SimilaritySearch:
    @staticmethod
    def topk_cosine(
        embeddings: DataFrame,
        queries: DataFrame | None = None,
        k: int = 10,
        query_filter: str | None = None,
    ) -> DataFrame:
        """Exact top-k cosine neighbors for each query vector.

        (query_id, neighbor_id, cosine, rank); rank by rounded cosine
        desc then neighbor_id asc (deterministic, oracle-stable).
        """
        base = _normed(embeddings)
        q = queries if queries is not None else embeddings
        if query_filter:
            q = q.where(query_filter)
        qn = _normed(q).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("e1"),
            F.col("norm").alias("n1"),
        )
        cn = base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("e2"),
            F.col("norm").alias("n2"),
        )
        pairs = qn.crossJoin(cn).where(F.col("query_id") != F.col("neighbor_id"))
        scored = pairs.select(
            "query_id",
            "neighbor_id",
            rnd(F.expr(DOT) / (F.col("n1") * F.col("n2")), 6).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(int(k)))
            .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
        )

    @staticmethod
    def topk_cosine_ivf(
        embeddings: DataFrame,
        k: int = 10,
        num_cells: int = 16,
        n_probe: int = 4,
        query_filter: str | None = None,
        seed: int = 1234,
    ) -> DataFrame:
        """IVF-flat approximate top-k: deterministic pseudo-random
        hyperplane sketch assigns each vector a coarse cell (sign bits
        of log2(num_cells) projections); probes search the n_probe
        cells nearest the query cell by Hamming distance.

        Approximate — no SQL oracle; validated in tests by recall vs
        topk_cosine. The cell join keeps candidate volume ~n·n_probe/
        cells: the shape that survives a 100× scale-up.
        """
        import math
        import random

        bits = int(math.log2(num_cells))
        assert 2**bits == num_cells, "num_cells must be a power of two"
        dim_probe = embeddings.select(F.size("embedding").alias("d")).first()["d"]
        rng = random.Random(seed)
        planes = [
            [rng.gauss(0.0, 1.0) for _ in range(dim_probe)] for _ in range(bits)
        ]

        def cell_expr(emb_col: str):
            cell = F.lit(0)
            for j, plane in enumerate(planes):
                arr = F.array(*[F.lit(x) for x in plane])
                proj = F.expr(
                    f"aggregate(zip_with({emb_col}, array({','.join(str(x) for x in plane)}),"
                    " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
                )
                cell = cell + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
            return cell

        base = _normed(embeddings).withColumn("cell", cell_expr("emb"))
        q = base
        if query_filter:
            q = q.where(query_filter)

        # probe cells: all cells within the hamming radius that yields
        # >= n_probe cells (small driver-side expansion over 2^bits)
        cells = list(range(num_cells))
        probe_map = []
        for c in cells:
            ranked = sorted(cells, key=lambda o: (bin(c ^ o).count("1"), o))
            probe_map.extend((c, o) for o in ranked[:n_probe])
        spark = embeddings.sparkSession
        probes = spark.createDataFrame(probe_map, ["cell", "probe_cell"])

        qp = (
            q.select(
                F.col("vec_id").alias("query_id"),
                F.col("emb").alias("e1"),
                F.col("norm").alias("n1"),
                "cell",
            )
            .join(F.broadcast(probes), "cell")
            .drop("cell")
        )
        cand = base.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("emb").alias("e2"),
            F.col("norm").alias("n2"),
            F.col("cell").alias("probe_cell"),
        )
        pairs = qp.join(cand, "probe_cell").where(
            F.col("query_id") != F.col("neighbor_id")
        )
        scored = pairs.select(
            "query_id",
            "neighbor_id",
            rnd(F.expr(DOT) / (F.col("n1") * F.col("n2")), 6).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.lit(int(k)))
            .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long"))
        )
