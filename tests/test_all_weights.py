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
