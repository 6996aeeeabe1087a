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
        num_cells: int | str = "auto",
        n_probe: int = 4,
        query_filter: str | None = None,
        seed: int = 1234,
    ) -> DataFrame:
        """IVF-flat approximate top-k in one call: build the coarse
        index over ``embeddings`` and search it with the same vectors
        as queries. For the production shape (index once, serve many
        query batches, partition-pruned storage) use
        :class:`IVFIndex` directly.

        Approximate — no SQL oracle; validated in tests by recall vs
        topk_cosine. The cell join keeps candidate volume ~n·n_probe/
        cells: the shape that survives a 100× scale-up.
        """
        index = IVFIndex.build(embeddings, num_cells=num_cells, seed=seed)
        return index.search(k=k, n_probe=n_probe, query_filter=query_filter)


class IVFIndex:
    """Persistable IVF-flat coarse index.

    A deterministic pseudo-random hyperplane sketch assigns each vector
    a coarse cell (sign bits of log2(num_cells) Gaussian projections,
    seeded — so the planes are a (dim, num_cells, seed) pure function
    and never need separate serialization). ``write``/``read`` store
    the indexed relation as parquet PARTITIONED BY cell: a query batch
    probing few cells reads only those partitions (partition pruning),
    which is what makes the served index cheap at corpus scale.
    """

    def __init__(self, indexed: DataFrame, num_cells: int, seed: int, dim: int):
        self.indexed = indexed  # (vec_id, emb, norm, cell)
        self.num_cells = int(num_cells)
        self.seed = int(seed)
        self.dim = int(dim)

    # ---- construction ------------------------------------------------
    @staticmethod
    def _planes(dim: int, num_cells: int, seed: int) -> list[list[float]]:
        import math
        import random

        bits = int(math.log2(num_cells))
        assert 2**bits == num_cells, "num_cells must be a power of two"
        rng = random.Random(seed)
        return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]

    @staticmethod
    def _proj_exprs(planes: list[list[float]], emb_col: str) -> list:
        """One dot-product column expression per hyperplane — the raw
        projections behind the cell sign bits (margin-aware callers
        like SemanticDedup's pruned multi-probe need the magnitudes,
        not just the signs)."""
        return [
            F.expr(
                f"aggregate(zip_with({emb_col}, array({','.join(str(x) for x in plane)}),"
                " (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            for plane in planes
        ]

    @staticmethod
    def _cell_expr(planes: list[list[float]], emb_col: str):
        cell = F.lit(0)
        for j, proj in enumerate(IVFIndex._proj_exprs(planes, emb_col)):
            cell = cell + F.when(proj > 0, F.lit(2**j)).otherwise(F.lit(0))
        return cell

    @staticmethod
    def auto_cells(n: int) -> int:
        """The classic IVF sizing rule nlist ~ sqrt(N), rounded to the
        nearest power of two (the hyperplane construction needs one)
        and clamped to [16, 2^20]. Keeps per-query candidate volume
        ~N·n_probe/cells ~ sqrt(N)·n_probe — the sizing that holds at
        a 100x scale-up, where a FIXED cell count would let every
        cell (and so every probe) grow linearly with the corpus."""
        import math

        if n <= 0:
            return 16
        bits = round(math.log2(max(1.0, math.sqrt(float(n)))))
        return min(1 << 20, max(16, 1 << bits))

    @staticmethod
    def cells_for_target(n: int, target_cell_size: int) -> int:
        """Cell count for a BOUNDED expected cell size: cells ≈
        N/target, rounded to the nearest power of two, clamped to
        [16, 2^24]. This is the PRODUCTION sizing for dedup-style
        workloads where EVERY vector is a query (SemDeDup's
        constant-size clusters, Abbas et al. 2023): per-cell pair
        volume is ~target², summed over N/target cells ⇒ total
        candidate volume ≈ N·target — LINEAR in the corpus. The
        sqrt-N rule (:meth:`auto_cells`) is right for SEARCH, where
        per-query probe cost ~sqrt(N) amortizes over few queries,
        but leaves total dedup volume at N^1.5."""
        import math

        if n <= 0:
            return 16
        target = max(1, int(target_cell_size))
        # floor(x + 0.5), not Python round(): half-up matches the SQL
        # oracle's floor formula exactly (banker's rounding doesn't)
        bits = int(math.floor(math.log2(max(1.0, n / float(target))) + 0.5))
        return min(1 << 24, max(16, 1 << bits))

    @staticmethod
    def build(
        embeddings: DataFrame,
        num_cells: int | str = "auto",
        seed: int = 1234,
        target_cell_size: int | None = None,
    ) -> "IVFIndex":
        """``num_cells="auto"`` (the default) sizes the cell count
        from the corpus (one count job, sqrt-N rule —
        :meth:`auto_cells`) — right for SEARCH indexes. Pass
        ``target_cell_size=k`` instead for dedup-style all-vectors-
        are-queries workloads (:meth:`cells_for_target` — cells ≈
        N/k, bounded per-cell work, linear total). An integer
        ``num_cells`` pins the count (the gated queries pin 16 for
        determinism)."""
        dim = embeddings.select(F.size("embedding").alias("d")).first()["d"]
        if target_cell_size is not None:
            num_cells = IVFIndex.cells_for_target(
                embeddings.count(), target_cell_size
            )
        elif num_cells == "auto":
            num_cells = IVFIndex.auto_cells(embeddings.count())
        planes = IVFIndex._planes(dim, int(num_cells), seed)
        indexed = _normed(embeddings).withColumn(
            "cell", IVFIndex._cell_expr(planes, "emb")
        )
        return IVFIndex(indexed, int(num_cells), seed, dim)

    # ---- persistence -------------------------------------------------
    def write(self, path: str) -> None:
        """One parquet directory per cell — probe-time partition
        pruning; (num_cells, seed, dim) ride along as columns so read()
        needs no sidecar metadata file."""
        self.indexed.withColumns(
            {
                "_num_cells": F.lit(self.num_cells),
                "_seed": F.lit(self.seed),
                "_dim": F.lit(self.dim),
            }
        ).write.partitionBy("cell").mode("overwrite").parquet(path)

    @staticmethod
    def read(spark, path: str) -> "IVFIndex":
        df = spark.read.parquet(path)
        meta = df.select("_num_cells", "_seed", "_dim").first()
        return IVFIndex(
            df.select("vec_id", "emb", "norm", "cell"),
            meta["_num_cells"],
            meta["_seed"],
            meta["_dim"],
        )

    # ---- search ------------------------------------------------------
    def search(
        self,
        queries: DataFrame | None = None,
        k: int = 10,
        n_probe: int = 4,
        query_filter: str | None = None,
    ) -> DataFrame:
        """(query_id, neighbor_id, cosine, rank) over the n_probe cells
        Hamming-nearest each query's cell. ``queries`` defaults to the
        indexed vectors themselves (self-join ANN); a fresh relation
        (vec_id, embedding) is sketched with the index's own planes."""
        if queries is None:
            q = self.indexed
        else:
            planes = IVFIndex._planes(self.dim, self.num_cells, self.seed)
            q = _normed(queries).withColumn(
                "cell", IVFIndex._cell_expr(planes, "emb")
            )
        if query_filter:
            q = q.where(query_filter)

        # probe cells: the n_probe cells nearest each cell by Hamming
        # distance (small driver-side expansion over 2^bits)
        cells = list(range(self.num_cells))
        probe_map = []
        for c in cells:
            ranked = sorted(cells, key=lambda o: (bin(c ^ o).count("1"), o))
            probe_map.extend((c, o) for o in ranked[: int(n_probe)])
        spark = self.indexed.sparkSession
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
        cand = self.indexed.select(
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


class Quantization:
    """Symmetric absmax int8 embedding quantization — the memory-scale
    path for corpus-sized vector stores (4x smaller than float32, 8x
    smaller than float64; integer dot products). Cosine over quantized
    vectors needs NO dequantization: the per-vector scales cancel,
    cos_q = dot(q1,q2) / (|q1|·|q2|) — and with |q| <= 127 and dim 64
    every product/sum is an exact small integer, so quantized cosine
    is bit-identical across engines BY CONSTRUCTION (no float-sum
    ordering hazard at all)."""

    @staticmethod
    def int8(
        embeddings: DataFrame,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> DataFrame:
        """(vec_id, scale, qvec: array<int>): q_i = round_half_up(
        x_i / scale) clamped to [-127, 127], scale = max|x| / 127.
        All-zero vectors quantize to zeros with scale 0. Rounding uses
        the engine's floor(x + 0.5) formula (native round() differs
        between engines at .5 boundaries). Pure column expressions —
        one linear pass, no shuffle."""
        emb_d = F.transform(F.col(emb_col), lambda x: x.cast("double"))
        amax = F.array_max(F.transform(emb_d, lambda x: F.abs(x)))
        scale = amax / F.lit(127.0)
        q = F.transform(
            emb_d,
            lambda x: F.when(
                scale > 0,
                F.greatest(
                    F.lit(-127).cast("long"),
                    F.least(
                        F.lit(127).cast("long"),
                        F.floor(x / scale + F.lit(0.5)),
                    ),
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .cast("int"),
        )
        return embeddings.select(
            F.col(id_col).alias("vec_id"),
            scale.alias("scale"),
            q.alias("qvec"),
        )

    @staticmethod
    def ivf_index_int8(
        embeddings: DataFrame,
        num_cells: int = 16,
        seed: int = 1234,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> IVFIndex:
        """IVF index over the QUANTIZED vectors: the qvec (as exact
        small-integer doubles) rides the ordinary IVFIndex machinery —
        cells, probes, search are unchanged; only the arithmetic
        becomes exact-integer. Searching it returns the quantized-
        cosine top-k, the ranking a production int8 store serves.

        All-zero vectors (scale 0) are DROPPED from the index: they
        have no direction, their norm is 0, and a 0/0 cosine would
        rank NaN above every real neighbor."""
        q8 = Quantization.int8(embeddings, id_col=id_col, emb_col=emb_col)
        as_emb = q8.where(F.col("scale") > 0).select(
            "vec_id",
            F.col("qvec").cast("array<double>").alias("embedding"),
        )
        return IVFIndex.build(as_emb, num_cells=num_cells, seed=seed)


class EmbeddingDiagnostics:
    """Embedding-space quality diagnostics over a labeled corpus."""

    @staticmethod
    def srp_bucket_purity(
        embeddings: DataFrame,
        bits: int = 16,
        seed: int = 1234,
        label_col: str = "label",
    ) -> DataFrame:
        """Label purity of full-signature SRP buckets: vectors sharing
        all ``bits`` sign bits sit in one Hamming-0 bucket; per bucket
        report size, distinct labels, the majority label's count and
        its share. High purity = the embedding space separates the
        labels at SRP resolution — the standard cheap health check
        before trusting embeddings for dedup/retrieval at corpus scale.

        One codegen signature pass + two hash aggregates keyed by
        (bucket[, label]) — no joins, no windows; integers + one
        per-row division, so the output is exactly reproducible by any
        engine (DuckDB oracle in entry_r3d). Hyperplanes are the same
        seeded family as Dedup.embedding_srp_pairs.
        """
        from sparker_spark.llm.dedup import Dedup

        head = embeddings.select("embedding").first()
        if head is None:
            return embeddings.sparkSession.createDataFrame(
                [], "bucket string, n_vecs long, n_labels long,"
                " majority_n long, purity double"
            )
        dim = len(head["embedding"])
        planes = Dedup.srp_hyperplanes(dim, bits, seed)

        v = embeddings.select(
            F.col(label_col).alias("label"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )

        def bit(j: int):
            plane = F.array(*[F.lit(x) for x in planes[j]])
            dot = F.aggregate(
                F.zip_with(F.col("emb"), plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

        sig = v.select(
            "label",
            F.concat_ws("_", *[bit(j) for j in range(bits)]).alias("bucket"),
        )
        per_label = sig.groupBy("bucket", "label").agg(F.count("*").alias("n"))
        return per_label.groupBy("bucket").agg(
            F.sum("n").cast("long").alias("n_vecs"),
            F.count("*").cast("long").alias("n_labels"),
            F.max("n").cast("long").alias("majority_n"),
            rnd(F.max("n") / F.sum("n"), 6).alias("purity"),
        )


class LabelKNN:
    @staticmethod
    def predict(
        embeddings: DataFrame,
        k: int = 10,
        query_filter: str | None = None,
        neighbors: DataFrame | None = None,
    ) -> DataFrame:
        """Majority-vote label prediction from cosine top-k neighbors —
        the label-noise / labeling-QA primitive: a vector whose stored
        label disagrees with its neighborhood's vote is a mislabel
        candidate for review before training.

        ``neighbors``: optional precomputed (query_id, neighbor_id,
        rank) relation — pass ``IVFIndex.search`` output at corpus
        scale so candidate volume stays ~n·n_probe/cells; defaults to
        the exact ``topk_cosine`` (bounded by ``query_filter``).
        ``k`` applies on BOTH paths (a rank column is part of the
        neighbors contract, so a wider precomputed relation is
        re-truncated); ``query_filter`` only bounds the default path.
        Vote ties break on the smallest label, and NULL-labeled
        vectors (the unlabeled part of a semi-supervised corpus)
        never vote and never appear as queries — otherwise a NULL
        vote group would win ties under Spark's nulls-first ascending
        sort and poison ``agrees`` to NULL.

        Returns (vec_id, true_label, predicted_label, votes, agrees).
        """
        if neighbors is None:
            neighbors = SimilaritySearch.topk_cosine(
                embeddings, k=k, query_filter=query_filter
            )
        else:
            neighbors = neighbors.where(F.col("rank") <= F.lit(int(k)))
        labels = embeddings.select(
            "vec_id", F.col("label").cast("long").alias("label")
        ).where(F.col("label").isNotNull())
        votes = (
            neighbors.join(
                labels.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("n_label"),
                ),
                "neighbor_id",
            )
            .groupBy("query_id", "n_label")
            .agg(F.count("*").alias("votes"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("votes").desc(), F.col("n_label").asc()
        )
        pred = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "query_id",
                F.col("n_label").alias("predicted_label"),
                F.col("votes").cast("long").alias("votes"),
            )
        )
        return (
            pred.join(
                labels.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("true_label"),
                ),
                "query_id",
            )
            .select(
                F.col("query_id").alias("vec_id"),
                "true_label",
                "predicted_label",
                "votes",
                (F.col("predicted_label") == F.col("true_label")).alias(
                    "agrees"
                ),
            )
        )
