"""Tests for the distributed count-min sketch."""

import random

from pyspark.sql import functions as F

from sparker_spark.sketches import CountMinSketch as CMS


def _freqs(rows):
    out = {}
    for v in rows:
        out[v] = out.get(v, 0) + 1
    return out


def test_cms_one_sided_and_tight_on_heavy_hitters(spark):
    rng = random.Random(3)
    # zipf-ish: a few heavy keys + a long tail
    rows = ["hot_a"] * 500 + ["hot_b"] * 200 + [
        f"tail_{rng.randrange(400)}" for _ in range(800)
    ]
    df = spark.createDataFrame([(v,) for v in rows], ["k"])
    sketch = CMS.build(df, "k", width=512, depth=4)
    true = _freqs(rows)
    values = spark.createDataFrame([(k,) for k in true], ["k"])
    est = {
        r["k"]: r["estimate"]
        for r in CMS.estimate(sketch, values, "k", width=512, depth=4).collect()
    }
    for k, t in true.items():
        assert est[k] >= t  # CM never underestimates
        assert est[k] <= t + len(rows) * (2.72 / 512) * 3  # loose bound
    # heavy hitters essentially exact at this load factor
    assert est["hot_a"] <= 520 and est["hot_b"] <= 220


def test_cms_merge_equals_single_pass(spark):
    rows = [f"v{i % 17}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in rows], ["k"])
    a = df.where(F.hash("k") % 2 == 0)
    b = df.where(F.hash("k") % 2 != 0)
    merged = CMS.merge(CMS.build(a, "k"), CMS.build(b, "k"))
    single = CMS.build(df, "k")
    got = {(r["j"], r["bucket"]): r["n"] for r in merged.collect()}
    want = {(r["j"], r["bucket"]): r["n"] for r in single.collect()}
    assert got == want  # cell-wise merge is exact


def test_cms_absent_value_estimates_small(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], ["k"])
    sketch = CMS.build(df, "k", width=1024, depth=4)
    values = spark.createDataFrame([("never_seen",)], ["k"])
    est = CMS.estimate(sketch, values, "k", width=1024, depth=4).first()
    assert est["estimate"] <= 2  # collisions only
