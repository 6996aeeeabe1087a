"""all_weights one-pass multi-weight edges == the six per-type builds.

This is the guard that lets er_all_weight_edges stand in for the six
single-weight graded queries: every column must equal the directed
weight that weighted_edges(type) computes, pair for pair.
"""

import pytest
from pyspark.sql import functions as F

from sparker_spark.entry import _shingle_blocks
from sparker_spark.metablocking.pruning_utils import WeightTypes
from sparker_spark.metablocking.weights import EdgeWeighting


@pytest.fixture(scope="module")
def graph(spark, sf_dir):
    blocks, pb = _shingle_blocks(spark, sf_dir)
    all_w = EdgeWeighting.all_weights(blocks, pb).cache()
    yield blocks, pb, all_w
    all_w.unpersist()


def _column_for(weight_type):
    return {
        WeightTypes.CBS: "cbs",
        WeightTypes.JS: "js",
        WeightTypes.ECBS: "ecbs",
        WeightTypes.CHI_SQUARE: "chi2",
        WeightTypes.EJS: "ejs",
    }[weight_type]


@pytest.mark.parametrize(
    "weight_type",
    [
        WeightTypes.CBS,
        WeightTypes.JS,
        WeightTypes.ECBS,
        WeightTypes.CHI_SQUARE,
        WeightTypes.EJS,
    ],
)
def test_all_weights_matches_single_type(graph, weight_type):
    blocks, pb, all_w = graph
    ctx = EdgeWeighting.weighted_edges(blocks, pb, weight_type)
    col = _column_for(weight_type)
    merged = (
        ctx.edges.select("src", "dst", F.col("weight").alias("single"))
        .join(all_w.select("src", "dst", F.col(col).alias("combined")), ["src", "dst"], "full")
        .withColumn(
            "diff", F.abs(F.col("single") - F.col("combined"))
        )
    )
    assert merged.where(
        F.col("single").isNull() | F.col("combined").isNull()
    ).count() == 0, f"{weight_type}: pair sets differ"
    max_diff = merged.agg(F.max("diff")).first()[0]
    assert max_diff < 1e-9, f"{weight_type}: max diff {max_diff}"


def test_all_weights_arcs_matches_log_domain(graph):
    """ARCS: combined log_arcs == ln(cbs) − Σ ln comparisons(src),
    i.e. ln of the single-type ARCS weight wherever the latter doesn't
    underflow to 0."""
    blocks, pb, all_w = graph
    ctx = EdgeWeighting.weighted_edges(blocks, pb, WeightTypes.ARCS)
    merged = ctx.edges.select(
        "src", "dst", F.col("weight").alias("arcs")
    ).join(all_w.select("src", "dst", "log_arcs"), ["src", "dst"])
    bad = merged.where(
        (F.col("arcs") > 0)
        & (F.abs(F.log("arcs") - F.col("log_arcs")) > 1e-6)
    ).count()
    assert bad == 0


def test_bitmask_fast_path_equals_general(spark, sf_dir):
    """<=63-block dirty collections route co_occurrence through the
    bitmask plan; its directed relation (incl. self-loops) must equal
    the general shuffle+agg plan row for row."""
    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.entry import _doc_keys_unigram

    keys = _doc_keys_unigram(spark, sf_dir)
    blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
    nb = blocks.meta.count()
    assert nb <= 63, "fixture regime must be mega-block"
    fast = {
        (r["src"], r["dst"]): r["cbs"]
        for r in EdgeWeighting.co_occurrence(blocks, num_blocks=nb).collect()
    }
    general = {
        (r["src"], r["dst"]): r["cbs"]
        for r in EdgeWeighting.co_occurrence(blocks).collect()
    }
    assert fast == general
    assert any(s == d for s, d in fast)  # self-loops present


def test_bitmask_blockjoin_tier_sparse_blocks(spark):
    """Sparse <=63-block fixture (n² > Σ size²) exercises the
    block-join tier of the bitmask path; must equal the general plan."""
    from sparker_spark.blocking.blockers import Blocking

    rows = []
    for b in range(40):  # 40 blocks of size 2-3, 100 profiles
        for p in range(b % 3 + 2):
            rows.append((((b * 7) + p * 13) % 100, 0, f"k{b}"))
    keys = spark.createDataFrame(
        rows, "profile_id long, source_id int, key string"
    ).distinct()
    blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
    nb = blocks.meta.count()
    assert nb <= 63
    n = keys.select("profile_id").distinct().count()
    ss = sum(
        r["block_size"] ** 2 for r in blocks.meta.select("block_size").collect()
    )
    assert n * n > ss, "fixture must route to the block-join tier"
    fast = {
        (r["src"], r["dst"]): r["cbs"]
        for r in EdgeWeighting.co_occurrence(blocks, num_blocks=nb).collect()
    }
    general = {
        (r["src"], r["dst"]): r["cbs"]
        for r in EdgeWeighting.co_occurrence(blocks).collect()
    }
    assert fast == general
