"""The separated-clusters fixture behind the gated n_probe=1 queries
(entry_r8): assert the PRECONDITIONS that make partial-probe IVF
provably exact there, and the exactness itself.

1. cell co-location: every cluster member's SRP cell equals its
   centroid's (checked against the actual seed-1234 planes);
2. margin: min intra-cluster cosine > max inter-cluster cosine, and
   every cluster has > k members;
3. therefore IVFIndex.search(n_probe=1) == the exact brute-force
   top-k, row for row.
"""

import math

from pyspark.sql import functions as F

from sparker_spark.entry_r8 import (
    IVF_CELLS,
    IVF_K,
    IVF_SEED,
    _separated_clusters,
)
from sparker_spark.llm.similarity import IVFIndex, SimilaritySearch

SF_DIR = "/root/testdata/sf0.001"


def test_cluster_cell_colocation_and_margin():
    """Driver-side re-derivation of the fixture's two provability
    conditions against the REAL planes (no Spark needed: the planes
    are a pure (dim, cells, seed) function)."""
    planes = IVFIndex._planes(8, IVF_CELLS, IVF_SEED)
    for c in range(8):
        cp = (c + 1) % 8
        for j, pl in enumerate(planes):
            signs = {pl[c] + pl[cp] * (k / 1024.0) > 0 for k in range(1, 8)}
            assert len(signs) == 1, (
                f"cluster {c} splits across cells on plane {j} — the "
                "fixture's provable-exactness precondition is broken"
            )
    # margin: worst intra pair (d=1/1024 vs d=7/1024) still beats the
    # best inter pair (adjacent clusters, dot = d <= 7/1024)
    worst_intra = (1 + (1 / 1024) * (7 / 1024)) / (
        math.sqrt(1 + (1 / 1024) ** 2) * math.sqrt(1 + (7 / 1024) ** 2)
    )
    best_inter = (7 / 1024) / 1.0
    assert worst_intra > 0.99 > 0.1 > best_inter


def test_probe1_equals_exact_topk(spark):
    """The gated claim itself: n_probe=1 search output is bit-equal to
    the exact brute-force top-k on this fixture."""
    fix = _separated_clusters(spark, SF_DIR)
    # every cluster must out-populate k for top-k to stay in-cluster
    sizes = fix.groupBy("label").count().collect()
    assert all(r["count"] > IVF_K for r in sizes)
    index = IVFIndex.build(fix, num_cells=IVF_CELLS, seed=IVF_SEED)
    approx = index.search(k=IVF_K, n_probe=1)
    exact = SimilaritySearch.topk_cosine(fix, k=IVF_K)
    key = ["query_id", "neighbor_id", "cosine", "rank"]
    diff = approx.select(key).exceptAll(exact.select(key)).count()
    diff += exact.select(key).exceptAll(approx.select(key)).count()
    assert diff == 0
    # and the probed candidate volume really is partial: one cell of
    # sixteen, not the full relation
    cells = index.indexed.groupBy("cell").count().collect()
    assert 1 < len(cells) <= IVF_CELLS
    total = sum(r["count"] for r in cells)
    assert max(r["count"] for r in cells) < total


def test_fixture_vectors_are_dyadic(spark):
    """Cross-engine bit-identity rides on every coordinate being a
    dyadic rational exactly representable in a double — which k/1024
    and 1.0 are by construction. Spot-check the generated arrays."""
    rows = _separated_clusters(spark, SF_DIR).limit(32).collect()
    for r in rows:
        emb = list(r["embedding"])
        c = r["vec_id"] % 8
        d = ((r["vec_id"] // 8) % 7 + 1) / 1024.0
        expect = [0.0] * 8
        expect[c] = 1.0
        expect[(c + 1) % 8] = d
        assert emb == expect
        assert (emb[(c + 1) % 8] * 1024.0) == int(emb[(c + 1) % 8] * 1024.0)


def test_auto_cells_sqrt_rule():
    from sparker_spark.llm.similarity import IVFIndex

    assert IVFIndex.auto_cells(0) == 16
    assert IVFIndex.auto_cells(2_000) == 32  # log2(44.7)=5.48 -> 2^5
    assert IVFIndex.auto_cells(1_000_000) == 1024
    assert IVFIndex.auto_cells(10**9) == 32768
    assert IVFIndex.auto_cells(10**15) == 1 << 20  # clamped


def test_auto_build_scales_cells_and_searches(spark):
    """num_cells="auto" sizes the index from the corpus and the
    search still returns well-formed top-k (recall is covered by the
    probe1 exactness fixture; this pins the auto path end-to-end)."""
    import random

    from pyspark.sql import functions as F

    from sparker_spark.llm.similarity import IVFIndex

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    index = IVFIndex.build(df, num_cells="auto")
    assert index.num_cells == 64  # sqrt(3000) ~ 54.8 -> 2^6
    out = index.search(k=3, n_probe=2)
    got = out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 3 for r in got)
    assert len(got) > 2500  # nearly every query finds neighbors
