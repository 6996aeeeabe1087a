"""Unit tests for blocking-key generation and block building against
hand-computed micro-fixtures (SURVEY §5 strategy (a))."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import Blocking
from sparker_spark.blocking.strategies import BlockingKeysStrategies
from sparker_spark.wrappers import DataFrameWrapper, separator_ids


@pytest.fixture(scope="module")
def profiles(spark):
    # 4 profiles, one source (dirty)
    rows = [
        ("a", "title", "Data Cleaning systems"),
        ("a", "year", "2020"),
        ("b", "title", "data cleaning SYSTEMS!"),
        ("c", "title", "query optimization"),
        ("c", "note", "cleaning"),
        ("d", "title", "spark"),
    ]
    df = spark.createDataFrame(rows, ["id", "attr_name", "val"])
    wide = df.groupBy("id").pivot("attr_name").agg(F.first("val"))
    return DataFrameWrapper.load_profiles(wide, real_id_field="id")


def token_set(keys_df, profiles_df, original_id):
    pid = (
        profiles_df.where(F.col("original_id") == original_id)
        .select("profile_id")
        .first()["profile_id"]
    )
    return {
        r["key"] for r in keys_df.where(F.col("profile_id") == pid).collect()
    }


def test_profile_ids_dense_and_deterministic(profiles):
    ids = sorted(
        r["profile_id"]
        for r in profiles.select("profile_id").distinct().collect()
    )
    assert ids == [0, 1, 2, 3]
    # ordered by original_id: a->0, b->1, c->2, d->3
    m = {
        r["original_id"]: r["profile_id"]
        for r in profiles.select("original_id", "profile_id").distinct().collect()
    }
    assert m == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_token_blocking_keys(profiles):
    keys = BlockingKeysStrategies.token_blocking(profiles)
    assert token_set(keys, profiles, "a") == {"data", "cleaning", "systems", "2020"}
    assert token_set(keys, profiles, "b") == {"data", "cleaning", "systems"}
    assert token_set(keys, profiles, "c") == {"query", "optimization", "cleaning"}


def test_token_blocking_excludes(profiles):
    keys = BlockingKeysStrategies.token_blocking(
        profiles, attributes_to_exclude=["year"], keys_to_exclude=["data"]
    )
    assert token_set(keys, profiles, "a") == {"cleaning", "systems"}


def test_token_blocking_w_attr(profiles):
    keys = BlockingKeysStrategies.token_blocking_w_attr(profiles)
    assert "title_data" in token_set(keys, profiles, "a")
    assert "year_2020" in token_set(keys, profiles, "a")


def test_ngrams_blocking(profiles):
    keys = BlockingKeysStrategies.ngrams_blocking(profiles, ngram_size=3)
    toks = token_set(keys, profiles, "d")  # token "spark", padded __spark__
    assert toks == {"__s", "_sp", "spa", "par", "ark", "rk_", "k__"}


def test_create_blocks_dirty(profiles):
    blocks = Blocking.create_blocks(profiles)
    meta = {r["key"]: r for r in blocks.meta.collect()}
    # singleton tokens dropped: query, optimization, spark, 2020
    assert set(meta) == {"data", "cleaning", "systems"}
    # cleaning: profiles a,b,c -> size 3, dirty comparisons n(n-1)=6
    assert meta["cleaning"]["block_size"] == 3
    assert meta["cleaning"]["comparisons"] == 6
    assert meta["data"]["comparisons"] == 2
    # block ids dense, ordered by key: cleaning=1, data=2, systems=3
    assert meta["cleaning"]["block_id"] == 1
    assert meta["data"]["block_id"] == 2
    assert meta["systems"]["block_id"] == 3


def test_create_blocks_clean(spark):
    a = spark.createDataFrame(
        [("1", "data cleaning"), ("2", "spark engine")], ["id", "title"]
    )
    b = spark.createDataFrame(
        [("x", "data cleaning"), ("y", "flink engine")], ["id", "title"]
    )
    pa = DataFrameWrapper.load_profiles(a, real_id_field="id", source_id=0)
    pb = DataFrameWrapper.load_profiles(
        b, real_id_field="id", source_id=1, start_id_from=2
    )
    profiles = pa.unionByName(pb)
    assert separator_ids(profiles) == [1]
    blocks = Blocking.create_blocks(profiles, clean=True)
    meta = {r["key"]: r for r in blocks.meta.collect()}
    # "data", "cleaning", "engine" span both sources; each 1x1 -> 1 comparison
    assert set(meta) == {"data", "cleaning", "engine"}
    for k in meta:
        assert meta[k]["comparisons"] == 1
        assert meta[k]["num_sources"] == 2


def test_create_blocks_three_sources(spark):
    """Multi-(>2)-source clean-clean (SURVEY §1.2): comparisons =
    Σ_{i<j} n_i·n_j, and the co-occurrence graph only crosses sources."""
    from sparker_spark.metablocking.weights import EdgeWeighting

    dfs = [
        spark.createDataFrame([(f"s{s}a", "alpha common"), (f"s{s}b", "common")],
                              ["id", "t"])
        for s in range(3)
    ]
    profiles = None
    start = 0
    for s, df in enumerate(dfs):
        p = DataFrameWrapper.load_profiles(
            df, real_id_field="id", source_id=s, start_id_from=start
        )
        profiles = p if profiles is None else profiles.unionByName(p)
        start += 2
    assert separator_ids(profiles) == [1, 3]
    blocks = Blocking.create_blocks(profiles, clean=True)
    meta = {r["key"]: r for r in blocks.meta.collect()}
    # "common": 2 profiles per source, 3 sources -> 3 pairs of sources
    # x 2x2 = 12 comparisons; "alpha": 1 per source -> 3
    assert meta["common"]["comparisons"] == 12
    assert meta["common"]["num_sources"] == 3
    assert meta["alpha"]["comparisons"] == 3
    # cross-source only: no same-source pairs in the co-occurrence graph
    co = EdgeWeighting.co_occurrence(blocks)
    ids = {
        r["profile_id"]: r["source_id"]
        for r in profiles.select("profile_id", "source_id").distinct().collect()
    }
    for r in co.collect():
        assert ids[r["src"]] != ids[r["dst"]]
