"""Tests for progressive ER (PPS, GSPSN)."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import Blocking
from sparker_spark.blocking.converters import Converters
from sparker_spark.progressive import GSPSN, PPS
from sparker_spark.wrappers import DataFrameWrapper


@pytest.fixture(scope="module")
def profiles(spark):
    rows = [
        ("p0", "t1 t2 t5"),
        ("p1", "t1 t2"),
        ("p2", "t1 t3"),
        ("p3", "t3 t4"),
        ("p4", "t4 t5"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    return DataFrameWrapper.load_profiles(df, real_id_field="id")


def test_pps_emits_best_first(spark, profiles):
    blocks = Blocking.create_blocks(profiles)
    pb = Converters.blocks_to_profile_blocks(blocks)
    pps = PPS(blocks, pb, k=5, mini_batch=2)
    pps.initialize()
    emitted = list(pps)
    # best comparison overall is (0,1) with cbs=2 — must come first
    assert emitted[0][0] == 0 and emitted[0][1] == 1
    assert emitted[0][2] == 2.0
    # weights are non-increasing
    ws = [e[2] for e in emitted]
    assert ws == sorted(ws, reverse=True)
    # all six true co-occurrence pairs eventually emitted, no dups
    pairs = {(e[0], e[1]) for e in emitted}
    assert pairs == {(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (0, 4)}
    assert len(emitted) == len(pairs)


def test_gspsn(spark, profiles):
    from sparker_spark.blocking.strategies import BlockingKeysStrategies

    keys = BlockingKeysStrategies.token_blocking(profiles)
    g = GSPSN(keys, max_window_size=2)
    g.initialize()
    first = g.get_next()
    assert first != (-1, -1, -1)
    # weights non-increasing, pairs ordered p1 < p2
    prev = first[2]
    while True:
        nxt = g.get_next()
        if nxt == (-1, -1, -1):
            break
        assert nxt[2] <= prev + 1e-12
        assert nxt[0] < nxt[1]
        prev = nxt[2]


def test_gspsn_banded_join_equals_naive_range_join(spark, profiles):
    """The bucketed equi-join rewrite of the ±w positional window must
    produce exactly the naive range-join result."""
    from pyspark.sql import Window

    from sparker_spark.blocking.strategies import BlockingKeysStrategies

    keys = BlockingKeysStrategies.token_blocking(profiles)
    for w in (1, 2, 3):
        got = {
            (r["p1"], r["p2"], round(r["weight"], 9))
            for r in GSPSN(keys, max_window_size=w)
            .compute_comparisons()
            .collect()
        }
        pos = keys.select("profile_id", "key").withColumn(
            "pos", F.row_number().over(Window.orderBy("key", "profile_id")) - 1
        )
        rows = pos.collect()
        n = {}
        from collections import Counter

        cnt = Counter()
        for r in rows:
            n[r["pos"]] = r["profile_id"]
            cnt[r["profile_id"]] += 1
        naive = Counter()
        for pa, a in n.items():
            for pb, b in n.items():
                if pb != pa and abs(pb - pa) <= w and b < a:
                    naive[(b, a)] += 1
        want = {
            (p1, p2, round(c / (cnt[p1] + cnt[p2] - c), 9))
            for (p1, p2), c in naive.items()
        }
        assert got == want


@pytest.mark.parametrize("mini_batch", [1, 7, 1000])
def test_gspsn_page_size_invariance_under_ties(spark, mini_batch):
    """Keyset-cursor emission must be identical for any page size on a
    fixture where many weights TIE across page boundaries — guards the
    cursor's (weight, p1, p2) tie handling: a cursor comparing weight
    alone would drop or duplicate tied pairs that straddle a page."""
    from sparker_spark.blocking.strategies import BlockingKeysStrategies

    # chain of 24 profiles, profile i holds tokens t{i}, t{i+1}: every
    # adjacent pair shares exactly one token and has identical weight,
    # so pages of any size split runs of tied pairs
    rows = [(f"p{i:02d}", f"t{i:02d} t{i + 1:02d}") for i in range(24)]
    df = spark.createDataFrame(rows, ["id", "text"])
    profs = DataFrameWrapper.load_profiles(df, real_id_field="id")
    keys = BlockingKeysStrategies.token_blocking(profs)

    g = GSPSN(keys, max_window_size=2, mini_batch=mini_batch)
    expected = sorted(
        (-r["weight"], r["p1"], r["p2"])
        for r in g.compute_comparisons().collect()
    )
    # the fixture must actually produce cross-page ties for small pages
    from collections import Counter

    tie_sizes = Counter(w for w, _, _ in expected)
    assert max(tie_sizes.values()) > 7

    g.initialize()
    emitted = []
    while True:
        nxt = g.get_next()
        if nxt == (-1, -1, -1):
            break
        emitted.append((-nxt[2], nxt[0], nxt[1]))
    assert emitted == expected


def test_gspsn_minibatch_emission_order_unchanged(spark, profiles):
    """Paged (keyset-cursor) emission must reproduce exactly the
    collect-everything order: (weight desc, p1, p2)."""
    from sparker_spark.blocking.strategies import BlockingKeysStrategies

    keys = BlockingKeysStrategies.token_blocking(profiles)
    g = GSPSN(keys, max_window_size=2, mini_batch=3)  # force many pages
    expected = sorted(
        ((-r["weight"], r["p1"], r["p2"])
         for r in g.compute_comparisons().collect())
    )
    g.initialize()
    emitted = []
    while True:
        nxt = g.get_next()
        if nxt == (-1, -1, -1):
            break
        emitted.append((-nxt[2], nxt[0], nxt[1]))
    assert emitted == expected


def test_pps_early_emissions_concentrate_matches_on_cora(spark):
    """Progressive ER's whole point: the first emissions must contain
    matches at a far higher rate than random pairs. On cora, compare
    the GT-hit rate of the first 1000 PPS emissions against the
    collection's overall match density."""
    import os

    cora = "/root/reference/python/datasets/dirty/cora/cora.csv"
    gt_path = "/root/reference/python/datasets/dirty/cora/groundtruth.csv"
    if not os.path.exists(cora):
        pytest.skip("reference datasets not present")

    from sparker_spark.blocking.converters import Converters
    from sparker_spark.blocking.strategies import BlockingKeysStrategies
    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.filters import BlockFiltering, BlockPurging
    from sparker_spark.wrappers import CSVWrapper

    profiles = CSVWrapper.load_profiles(
        spark, cora, header=True, real_id_field="id"
    ).cache()
    keys = BlockingKeysStrategies.token_blocking(profiles)
    blocks = Blocking.blocks_from_keys(keys, clean=False)
    purged = BlockPurging.block_purging(blocks, 1.025)
    pb, pbf, rebuilt = BlockFiltering.block_filtering_quick(purged, 0.8)
    rebuilt.meta.cache(); rebuilt.assignments.cache()

    gt_raw = spark.read.option("header", True).csv(gt_path)
    gt = Converters.convert_groundtruth(
        gt_raw.withColumnRenamed("id1", "first_entity_id")
        .withColumnRenamed("id2", "second_entity_id"),
        profiles,
    )
    gt_set = {(r["p1"], r["p2"]) for r in gt.collect()}

    pps = PPS(rebuilt, pbf, k=20, mini_batch=200)
    pps.initialize()
    emitted = []
    for _ in range(1000):
        nxt = pps.get_next()
        if nxt == (-1, -1, -1):
            break
        emitted.append(nxt)
    hits = sum(
        1
        for p1, p2, _ in emitted
        if (min(p1, p2), max(p1, p2)) in gt_set
    )
    # overall density: |GT| / total retained comparisons
    from pyspark.sql import functions as F

    total = rebuilt.meta.agg(F.sum("comparisons")).first()[0]
    density = len(gt_set) / float(total)
    early_rate = hits / max(len(emitted), 1)
    # the progressive schedule must beat random order by a wide margin
    assert early_rate > 5 * density, (early_rate, density)
    assert hits > 100


def test_gspsn_early_emissions_concentrate_matches_on_cora(spark):
    """Same progressive-quality property for the sorted-neighborhood
    scheduler: early GSPSN emissions beat random-order density."""
    import os

    cora = "/root/reference/python/datasets/dirty/cora/cora.csv"
    gt_path = "/root/reference/python/datasets/dirty/cora/groundtruth.csv"
    if not os.path.exists(cora):
        pytest.skip("reference datasets not present")

    from sparker_spark.blocking.converters import Converters
    from sparker_spark.blocking.strategies import BlockingKeysStrategies
    from sparker_spark.wrappers import CSVWrapper

    profiles = CSVWrapper.load_profiles(
        spark, cora, header=True, real_id_field="id"
    ).cache()
    keys = BlockingKeysStrategies.token_blocking(profiles)
    gt_raw = spark.read.option("header", True).csv(gt_path)
    gt = Converters.convert_groundtruth(
        gt_raw.withColumnRenamed("id1", "first_entity_id")
        .withColumnRenamed("id2", "second_entity_id"),
        profiles,
    )
    gt_set = {(r["p1"], r["p2"]) for r in gt.collect()}

    g = GSPSN(keys.select("profile_id", "key"), max_window_size=2,
              mini_batch=500)
    g.initialize()
    emitted = []
    for _ in range(1000):
        nxt = g.get_next()
        if nxt == (-1, -1, -1):
            break
        emitted.append(nxt)
    hits = sum(
        1 for p1, p2, _ in emitted if (min(p1, p2), max(p1, p2)) in gt_set
    )
    n_profiles = profiles.select("profile_id").distinct().count()
    density = len(gt_set) / (n_profiles * (n_profiles - 1) / 2.0)
    early_rate = hits / max(len(emitted), 1)
    assert early_rate > 20 * density, (early_rate, density)


def test_pps_driver_rows_bounded_by_page(spark):
    """The paged initialize() keeps driver-resident comparison rows
    O(page), not O(#profiles): with 60 profiles and mini_batch=4 the
    comparison queue never holds more than a page of phase-0 rows or
    one mini-batch's top-k rows, and the old O(#profiles) structures
    (profile_queue / emitted / visited) no longer exist."""
    rows = [(f"p{i}", f"tok{i % 12} common{i % 6}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "text"])
    profs = DataFrameWrapper.load_profiles(df, real_id_field="id")
    blocks = Blocking.create_blocks(profs)
    pb = Converters.blocks_to_profile_blocks(blocks)
    k, mb = 3, 4
    pps = PPS(blocks, pb, k=k, mini_batch=mb)
    pps.initialize()
    page_bound = mb * (k + 1)  # one refill batch's worst-case rows
    assert pps.comparison_queue.qsize() <= page_bound
    for attr in ("profile_queue", "emitted", "visited"):
        assert not hasattr(pps, attr)
    n, max_q = 0, 0
    while pps.get_next() != (-1, -1, -1):
        n += 1
        max_q = max(max_q, pps.comparison_queue.qsize())
    assert n > page_bound  # emission really crossed multiple pages
    assert max_q <= page_bound
