"""Mega-block skew handling past the ≤63-block bitmask path (round-10
ask #6): the W1 co-occurrence self-join shuffles on block_id, so one
surviving mega-block lands its entire assignment set in one join
partition. The engine's posture is purging-first (the algorithm's own
skew killer) + AQE skew-join splitting for whatever survives; this
test DEMONSTRATES the AQE half on a fixture the bitmask path cannot
take (>63 blocks, one block holding ~50% of assignments), and shows
the discriminator: with skew-join disabled the same plan runs the
mega-block in a single unsplit partition.
"""

import pytest
from pyspark.sql import functions as F


def _mega_fixture(spark):
    from sparker_spark.blocking.blockers import BlockCollection

    # 100 blocks (> 63 -> general self-join path, not the bitmask).
    # block 0: 1200 profiles (~50 % of assignments); others: 12 each.
    rows = [(0, "k0", p, 0) for p in range(1200)] + [
        (b, f"k{b}", 100_000 + b * 12 + i, 0)
        for b in range(1, 100)
        for i in range(12)
    ]
    assignments = spark.createDataFrame(
        rows, "block_id long, key string, profile_id long, source_id int"
    )
    return BlockCollection(assignments=assignments, meta=None, clean=False)


_SKEW_CONFS = {
    # force a sort-merge join (broadcast would hide the shuffle skew)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # test-scale thresholds: the mega-block's join-input partition is
    # ~tens of KB; production defaults (256 MB) express the same rule
    # at cluster scale
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8192",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4096",
}


@pytest.fixture
def skew_confs(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _run_cooc(spark, blocks):
    from sparker_spark.metablocking.weights import EdgeWeighting

    out = EdgeWeighting.co_occurrence(blocks, num_blocks=100)
    # the executed (final adaptive) plan lives on the DataFrame the
    # action ran on — aggregate THEN read its plan
    agg = out.agg(F.count("*").alias("n"), F.sum("cbs").alias("s"))
    total = agg.collect()[0]
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return total, plan


def test_aqe_splits_the_megablock_join(spark, skew_confs):
    blocks = _mega_fixture(spark)
    (n, s), plan = _run_cooc(spark, blocks)
    # the mega-block pair enumeration ran: 1200 profiles co-occur
    # (plus self-loops from the dirty-ER convention)
    assert s >= 1200 * 1199  # directed pairs from block 0 alone
    # AQE marked and split the skewed join partition
    assert "skewed" in plan, plan[:4000]


def test_disabled_skew_join_is_the_counterfactual(spark, skew_confs):
    """Same fixture, skew splitting off: the executed plan contains no
    skew-split read — the unsplit mega-block partition is exactly what
    the shipped path exists to prevent. Results are identical either
    way (splitting is a physical rewrite)."""
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    blocks = _mega_fixture(spark)
    (n_off, s_off), plan_off = _run_cooc(spark, blocks)
    assert "skewed" not in plan_off
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    (n_on, s_on), _ = _run_cooc(spark, blocks)
    assert (n_off, s_off) == (n_on, s_on)
