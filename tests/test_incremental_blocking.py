"""Batch-incremental blocking: the delta must equal the full
re-block restricted to pairs touching the new batch."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.blocking.incremental import IncrementalBlocking


def _keys(spark, docs):
    return (
        docs.select(
            F.col("doc_id").alias("profile_id"),
            F.explode(F.split(F.lower("text"), "[^0-9a-z_]+")).alias("key"),
        )
        .where(F.length("key") > 0)
        .distinct()
    )


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = docs.where("doc_id % 10 != 0")
    new = docs.where("doc_id % 10 = 0")
    return (
        _keys(spark, old).cache(),
        _keys(spark, new).cache(),
        _keys(spark, docs).cache(),
    )


def _full_pairs(all_keys):
    a = all_keys.select("key", F.col("profile_id").alias("pa"))
    b = all_keys.select("key", F.col("profile_id").alias("pb"))
    return (
        a.join(b, "key")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("p1"), F.col("pb").alias("p2"), "key")
    )


def test_delta_pairs_equal_full_restricted(spark, corpus):
    old, new, allk = corpus
    new_ids = {r["profile_id"] for r in new.select("profile_id").distinct().collect()}
    got = {(r["p1"], r["p2"]) for r in IncrementalBlocking.delta_pairs(old, new).collect()}
    want = {
        (r["p1"], r["p2"])
        for r in _full_pairs(allk).select("p1", "p2").distinct().collect()
        if r["p1"] in new_ids or r["p2"] in new_ids
    }
    assert got == want
    assert got  # fixture produces a real delta
    # no old×old pair leaks in
    assert all(p1 in new_ids or p2 in new_ids for p1, p2 in got)


def test_delta_cbs_matches_full_cbs(spark, corpus):
    old, new, allk = corpus
    new_ids = {r["profile_id"] for r in new.select("profile_id").distinct().collect()}
    got = {
        (r["p1"], r["p2"]): r["cbs"]
        for r in IncrementalBlocking.delta_cbs_edges(old, new).collect()
    }
    full = {
        (r["p1"], r["p2"]): r["cbs"]
        for r in _full_pairs(allk)
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("double").alias("cbs"))
        .collect()
        if r["p1"] in new_ids or r["p2"] in new_ids
    }
    assert got == full


def test_delta_respects_block_size_cap(spark, corpus):
    old, new, allk = corpus
    cap = 50
    sizes = {
        r["key"]: r["n"]
        for r in allk.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r["p1"], r["p2"])
        for r in IncrementalBlocking.delta_pairs(old, new, max_block_size=cap).collect()
    }
    # every surviving pair shares at least one under-cap key
    keyed = _full_pairs(allk).collect()
    ok_pairs = {
        (r["p1"], r["p2"]) for r in keyed if sizes[r["key"]] <= cap
    }
    assert got <= ok_pairs
    # capping strictly shrinks the delta on this fixture (near-universal
    # tokens exist)
    full_delta = IncrementalBlocking.delta_pairs(old, new).count()
    assert len(got) < full_delta
