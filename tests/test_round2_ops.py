"""Round-2 operator tests: Scala exact-truncation block filtering
(divergence from the tie-inclusive Python rule on a hand fixture),
stop-word key cleaning, the per-block entropy estimator, and the
broadcast-set PC/PQ cross-check."""

import math

import pytest
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import Blocking
from sparker_spark.blocking.strategies import (
    ENGLISH_STOPWORDS,
    BlockingKeysStrategies,
)
from sparker_spark.evaluation import Evaluation, StatisticsEstimator
from sparker_spark.filters import BlockFiltering


@pytest.fixture(scope="module")
def profile_blocks(spark):
    """One profile in 4 blocks with a tie at the cut.

    comparisons ascending: b1=2, b2=6, b3=6, b4=12.
    r=0.5 -> n·r = 2.
      * Python tie-inclusive (filters.py:75-89): cutoff = comparisons at
        index round_half_even(2)-1 = 1 -> 6; keep everything <= 6:
        {b1, b2, b3} (the tie at 6 survives).
      * Scala truncation (BlockFiltering.scala:28-39): keep exactly
        Math.round(2) = 2 blocks: {b1, b2} (tie truncated).
    """
    rows = [
        (0, 0, 1, 2),
        (0, 0, 2, 6),
        (0, 0, 3, 6),
        (0, 0, 4, 12),
    ]
    return spark.createDataFrame(
        rows, "profile_id LONG, source_id INT, block_id LONG, comparisons LONG"
    )


def test_block_filtering_tie_modes_diverge(profile_blocks):
    keep_py = BlockFiltering.block_filtering(profile_blocks, 0.5)
    keep_scala = BlockFiltering.block_filtering(
        profile_blocks, 0.5, tie_inclusive=False
    )
    py_ids = {r["block_id"] for r in keep_py.collect()}
    scala_ids = {r["block_id"] for r in keep_scala.collect()}
    assert py_ids == {1, 2, 3}  # tie at the cutoff included
    assert scala_ids == {1, 2}  # take(round(n*r)) truncates the tie


def test_block_filtering_truncation_rounds_half_up(spark):
    # 3 blocks, r=0.5 -> n·r = 1.5; Math.round -> 2 kept (half-up),
    # while round-half-even index logic keeps comparisons <= level@1
    rows = [(0, 0, 1, 2), (0, 0, 2, 4), (0, 0, 3, 8)]
    pb = spark.createDataFrame(
        rows, "profile_id LONG, source_id INT, block_id LONG, comparisons LONG"
    )
    kept = BlockFiltering.block_filtering(pb, 0.5, tie_inclusive=False)
    assert {r["block_id"] for r in kept.collect()} == {1, 2}


def test_block_filtering_truncation_zero_keep(spark):
    # n=1, r=0.3 -> Math.round(0.3) = 0: the Scala path keeps NOTHING
    # for that profile (faithful quirk), the Python path clamps to 1
    rows = [(0, 0, 1, 2)]
    pb = spark.createDataFrame(
        rows, "profile_id LONG, source_id INT, block_id LONG, comparisons LONG"
    )
    assert (
        BlockFiltering.block_filtering(pb, 0.3, tie_inclusive=False).count() == 0
    )
    assert BlockFiltering.block_filtering(pb, 0.3).count() == 1


def test_clean_keys(spark):
    rows = [
        (0, 0, "alpha"),   # kept: alphabetic
        (0, 0, "1234"),    # kept: numeric
        (0, 0, "ab12"),    # dropped: mixed
        (0, 0, "the"),     # dropped: stopword
        (0, 0, "a_b"),     # dropped: underscore is neither class
    ]
    keys = spark.createDataFrame(rows, "profile_id LONG, source_id INT, key STRING")
    kept = BlockingKeysStrategies.clean_keys(keys, stopwords=ENGLISH_STOPWORDS)
    assert {r["key"] for r in kept.collect()} == {"alpha", "1234"}


def test_block_entropy_hand_fixture(spark):
    """Two blocks over three profiles:
      b1 = {p0, p1}, b2 = {p1, p2}.
    For b1 the member profiles contribute blocks [b1] (p0) and
    [b1, b2] (p1) -> multiset {b1: 2, b2: 1}, N = 3.
    Shannon part: -(2/3·ln(2/3) + 1/3·ln(1/3)) = ln 3 − (2/3)·ln 2;
    reference entropy divides by N again. b2 is symmetric.
    """
    keys = spark.createDataFrame(
        [(0, 0, "b1"), (1, 0, "b1"), (1, 0, "b2"), (2, 0, "b2")],
        "profile_id LONG, source_id INT, key STRING",
    )
    blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
    ent = StatisticsEstimator.block_entropy(blocks, normalized=True)
    out = {
        r["block_id"]: (r["entropy"], r["norm_entropy"]) for r in ent.collect()
    }
    shannon = math.log(3) - (2.0 / 3.0) * math.log(2)
    expected = shannon / 3.0
    assert len(out) == 2
    for e, ne in out.values():
        assert e == pytest.approx(expected, rel=1e-12)
        assert ne == pytest.approx(expected / 2.0, rel=1e-12)  # block_size 2


def test_pcpq_broadcast_crosscheck(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 4), (5, 6)], "p1 LONG, p2 LONG"
    )
    gt = spark.createDataFrame([(0, 1), (2, 4), (7, 8)], "p1 LONG, p2 LONG")
    a = Evaluation.get_stats(edges, gt)
    b = Evaluation.get_stats_broadcast(edges, gt)
    assert (a.num_edges, a.num_matches, a.num_gt) == (5, 2, 3)
    assert (b.num_edges, b.num_matches, b.num_gt) == (
        a.num_edges,
        a.num_matches,
        a.num_gt,
    )
    assert b.pc == pytest.approx(a.pc) and b.pq == pytest.approx(a.pq)
    assert b.f1 == pytest.approx(a.f1)


def test_pcpq_crosscheck_on_pipeline(spark, sf_dir):
    """The two PC/PQ implementations must agree on a real pruned edge
    set — cheap insurance on the metric everything is graded by."""
    from sparker_spark.entry import QUERIES
    from sparker_spark.llm.dedup import Dedup

    edges = QUERIES["er_wnp_cbs_avg_or"](spark, sf_dir).select("p1", "p2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    groups = Dedup.exact_groups(docs).select("doc_id", "text_hash")
    gt = (
        groups.alias("a")
        .join(groups.alias("b"), F.col("a.text_hash") == F.col("b.text_hash"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("p1"), F.col("b.doc_id").alias("p2")
        )
    )
    a = Evaluation.get_stats(edges, gt)
    b = Evaluation.get_stats_broadcast(edges, gt)
    assert (a.num_edges, a.num_matches, a.num_gt) == (
        b.num_edges,
        b.num_matches,
        b.num_gt,
    )


def test_pcpq_adjacency_estimator(spark):
    """Grouped-adjacency estimator agrees with the join + broadcast-set
    paths on clean input, and keeps the reference's raw-denominator /
    distinct-match quirks on duplicated input."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 4), (5, 6)], "p1 LONG, p2 LONG"
    )
    gt = spark.createDataFrame([(0, 1), (2, 4), (7, 8)], "p1 LONG, p2 LONG")
    a = Evaluation.get_stats(edges, gt)
    c = StatisticsEstimator.estimate_pc_pq_adjacency(edges, gt)
    assert (c.num_edges, c.num_matches, c.num_gt) == (
        a.num_edges,
        a.num_matches,
        a.num_gt,
    )
    assert c.pc == pytest.approx(a.pc) and c.pq == pytest.approx(a.pq)

    # duplicated candidate + duplicated gt row: matches stay DISTINCT
    # (2), denominators count RAW rows (6 candidates, 4 gt) — exactly
    # StatisticsEstimator.scala:117,:123
    edges_dup = edges.unionAll(
        spark.createDataFrame([(0, 1)], "p1 LONG, p2 LONG")
    )
    gt_dup = gt.unionAll(spark.createDataFrame([(2, 4)], "p1 LONG, p2 LONG"))
    d = StatisticsEstimator.estimate_pc_pq_adjacency(edges_dup, gt_dup)
    assert (d.num_edges, d.num_matches, d.num_gt) == (6, 2, 4)
    assert d.pc == pytest.approx(2 / 4) and d.pq == pytest.approx(2 / 6)


def test_pcpq_real_id_estimator(spark):
    """Real-ID-space estimator agrees with the dense-id join path, and
    applies the clean-clean orientation swap."""
    from sparker_spark.evaluation import StatisticsEstimator

    # dense ids 0,1 = dataset 1 (max id 1); 2,3 = dataset 2
    id_map = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "x"), (3, "y")],
        "profile_id LONG, original_id STRING",
    )
    # one edge stored dataset-2-first: must be flipped before mapping
    edges = spark.createDataFrame([(2, 0), (1, 3)], "p1 LONG, p2 LONG")
    gt = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("b", "z")],
        "first_entity_id STRING, second_entity_id STRING",
    )
    s = StatisticsEstimator.estimate_pc_pq_real_ids(
        edges, id_map, gt, first_dataset_max_id=1
    )
    # (2,0)->flip->(0,2)->(a,x) hit; (1,3)->(b,y) hit; gt has 3 rows
    assert (s.num_matches, s.num_edges, s.num_gt) == (2, 2, 3)
    assert s.pc == pytest.approx(2 / 3) and s.pq == pytest.approx(1.0)


def test_cluster_blocking_debug_provenance(spark):
    from sparker_spark.wrappers import DataFrameWrapper

    a = spark.createDataFrame([("1", "alpha beta")], ["id", "fullname"])
    b = spark.createDataFrame([("x", "alpha")], ["id", "name"])
    pa = DataFrameWrapper.load_profiles(a, real_id_field="id", source_id=0)
    pb = DataFrameWrapper.load_profiles(
        b, real_id_field="id", source_id=1, start_id_from=1
    )
    profiles = pa.unionByName(pb)
    clusters = [{"cluster_id": 0, "keys": ["0_fullname", "1_name"], "entropy": 2.0}]
    coll, debug = Blocking.create_blocks_clusters_debug(
        profiles, clusters, clean=True
    )
    rows = {(r["key"], r["profile_id"]): list(r["attrs"]) for r in debug.collect()}
    # token 'alpha' came from 0_fullname for p0 and 1_name for p1
    assert rows[("alpha_0", 0)] == ["0_fullname"]
    assert rows[("alpha_0", 1)] == ["1_name"]
    # singleton token 'beta' still present in debug (pre-filter), but
    # its block is filtered from the collection (clean-clean needs 2
    # sources)
    assert ("beta_0", 0) in rows
    assert {r["key"] for r in coll.meta.collect()} == {"alpha_0"}


def test_lsh_blocking(spark):
    """Profile-level MinHash-LSH blocking (LSHTwitter.scala:30-71):
    identical token sets share every bucket; bucket count per profile =
    #bands; clean-clean source rule applies; duplicate profiles always
    co-block."""
    from sparker_spark.attribute_clustering import band_chunks
    from sparker_spark.blocking.lsh import LSHBlocking

    rows = [
        (0, 0, "alpha"), (0, 0, "beta"), (0, 0, "gamma"),
        (1, 1, "alpha"), (1, 1, "beta"), (1, 1, "gamma"),  # exact dup of p0
        (2, 1, "zeta"), (2, 1, "eta"),                     # disjoint tokens
    ]
    keys = spark.createDataFrame(
        rows, "profile_id LONG, source_id INT, key STRING"
    )
    n_bands = len(band_chunks(16, 0.4))
    sigs = LSHBlocking.profile_signatures(keys, 16)
    buckets = LSHBlocking.bucket_keys(sigs, 16, 0.4)
    per_profile = {
        r["profile_id"]: r["n"]
        for r in buckets.groupBy("profile_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_profile == {0: n_bands, 1: n_bands, 2: n_bands}
    b0 = {r["key"] for r in buckets.where("profile_id = 0").collect()}
    b1 = {r["key"] for r in buckets.where("profile_id = 1").collect()}
    assert b0 == b1  # identical token set -> identical signature

    coll = LSHBlocking.create_blocks_lsh(keys, 16, 0.4, clean=True)
    members = {
        r["block_id"]: set(r["members"])
        for r in coll.assignments.groupBy("block_id")
        .agg(F.collect_set("profile_id").alias("members"))
        .collect()
    }
    # clean-clean: every surviving block must span both sources, and the
    # duplicate pair must co-occur in every one of its blocks
    assert members and all({0, 1} <= m or {0, 1}.isdisjoint(m) for m in members.values())
    assert any({0, 1} <= m for m in members.values())
