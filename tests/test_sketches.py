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


def test_cms_portable_hash_family_exact_when_wide(spark):
    """portable=True (md5-affine family): same CM semantics — with a
    width far above the key count every estimate is the exact
    frequency, and the family is reproducible in plain SQL (the
    engine-portability contract the countmin_users oracle relies on)."""
    rows = ["a"] * 7 + ["b"] * 3 + ["c"] * 1
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    sk = CMS.build(df, "v", width=4096, depth=4, seed=99, portable=True)
    vals = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], "v string")
    est = {
        r["v"]: r["estimate"]
        for r in CMS.estimate(
            sk, vals, "v", width=4096, depth=4, seed=99, portable=True
        ).collect()
    }
    assert est == {"a": 7, "b": 3, "c": 1, "zz": 0}


def test_cms_portable_one_sided_under_collisions(spark):
    """Narrow width forces collisions; the one-sided guarantee
    (estimate >= true) must hold for every key in both hash families."""
    rng = random.Random(11)
    rows = [f"k{rng.randint(0, 40)}" for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    truth = _freqs(rows)
    vals = spark.createDataFrame([(k,) for k in truth], "v string")
    for portable in (False, True):
        sk = CMS.build(df, "v", width=16, depth=3, seed=5, portable=portable)
        est = {
            r["v"]: r["estimate"]
            for r in CMS.estimate(
                sk, vals, "v", width=16, depth=3, seed=5, portable=portable
            ).collect()
        }
        for k, n in truth.items():
            assert est[k] >= n, (portable, k)


def test_cms_portable_matches_duckdb_replay(spark):
    """The portable family's counter table is bit-identical when
    DuckDB replays the same hash SQL — the cross-engine merge/grading
    contract."""
    import duckdb

    from sparker_spark.llm.hashing import minhash_coefficients
    from sparker_spark.sketches import _portable_h31, portable_bucket_sql

    rows = [f"u{i % 13}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in rows], "v string")
    sk = sorted(
        (r["j"], r["bucket"], r["n"])
        for r in CMS.build(df, "v", width=32, depth=3, seed=7, portable=True).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in rows])
    coeffs = minhash_coefficients(3, 7)
    h31 = _portable_h31("v", "duck")
    union = " UNION ALL ".join(
        f"SELECT {j} AS j, {portable_bucket_sql(coeffs[j], 32, 'h31')} AS bucket FROM vals"
        for j in range(3)
    )
    duck = sorted(
        tuple(r)
        for r in con.execute(
            f"WITH vals AS (SELECT {h31} AS h31 FROM t) "
            f"SELECT j, bucket, count(*) AS n FROM ({union}) GROUP BY 1, 2"
        ).fetchall()
    )
    assert sk == duck


def test_bloom_no_false_negatives(spark):
    from sparker_spark.sketches import BloomFilter

    members = spark.range(500).selectExpr("CAST(id AS STRING) AS v")
    bloom = BloomFilter.build(members, "v", m=8192, k=4)
    out = {
        r["v"]: r["maybe_present"]
        for r in BloomFilter.contains(bloom, members, "v", m=8192, k=4).collect()
    }
    assert all(out.values()) and len(out) == 500


def test_bloom_no_false_negatives_with_duplicate_probe_rows(spark):
    """Duplicate rows for the same value must not break the
    all-k-bits-set test (dup_count*k hits used to read as
    maybe_present=False — a contract-violating false negative)."""
    from pyspark.sql import functions as F

    from sparker_spark.sketches import BloomFilter

    members = spark.range(200).selectExpr("CAST(id AS STRING) AS v")
    bloom = BloomFilter.build(members, "v", m=8192, k=4)
    dup = members.unionByName(members).unionByName(members.limit(50))
    out = BloomFilter.contains(bloom, dup, "v", m=8192, k=4)
    assert out.count() == 450  # one result row per input row
    assert out.where(~F.col("maybe_present")).count() == 0


def test_bloom_false_positive_rate(spark):
    from sparker_spark.sketches import BloomFilter

    members = spark.range(500).selectExpr("CAST(id AS STRING) AS v")
    bloom = BloomFilter.build(members, "v", m=8192, k=4)
    others = spark.range(10_000, 12_000).selectExpr("CAST(id AS STRING) AS v")
    fp = sum(
        1
        for r in BloomFilter.contains(bloom, others, "v", m=8192, k=4).collect()
        if r["maybe_present"]
    )
    # theoretical FP ~ (1 - e^(-4*500/8192))^4 ~ 0.06% ; allow 10x
    assert fp / 2000 < 0.01


def test_bloom_merge_equals_single_pass(spark):
    from sparker_spark.sketches import BloomFilter

    a = spark.range(0, 300).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(200, 600).selectExpr("CAST(id AS STRING) AS v")
    merged = BloomFilter.merge(
        BloomFilter.build(a, "v"), BloomFilter.build(b, "v")
    )
    single = BloomFilter.build(a.union(b), "v")
    assert {r["bit"] for r in merged.collect()} == {
        r["bit"] for r in single.collect()
    }


def test_bloom_matches_duckdb_replay(spark):
    import duckdb

    from sparker_spark.sketches import BloomFilter

    df = spark.range(400).selectExpr("CAST(id AS STRING) AS v")
    got = {r["bit"] for r in BloomFilter.build(df, "v", m=2048, k=3).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CAST(range AS VARCHAR) AS v FROM range(400)"
    )
    want = {
        r[0]
        for r in con.execute(
            BloomFilter.duck_bits_sql("t", "v", m=2048, k=3)
        ).fetchall()
    }
    assert got == want


def test_cm_inner_product_join_size(spark):
    from sparker_spark.sketches import CountMinSketch, cm_inner_product

    # left: keys 0..99 with freq 1; right: keys 50..149 freq 2
    left = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    right = (
        spark.range(50, 150)
        .selectExpr("CAST(id AS STRING) AS k")
        .union(spark.range(50, 150).selectExpr("CAST(id AS STRING) AS k"))
    )
    true_size = left.join(right, "k").count()  # 50 keys x 1 x 2 = 100
    assert true_size == 100
    sa = CountMinSketch.build(left, "k", width=2048, depth=4)
    sb = CountMinSketch.build(right, "k", width=2048, depth=4)
    est = cm_inner_product(sa, sb).collect()[0]["estimate"]
    # one-sided with small overestimate at this width
    assert est >= true_size
    assert est <= true_size * 1.5


def test_cm_inner_product_disjoint(spark):
    from sparker_spark.sketches import CountMinSketch, cm_inner_product

    a = spark.range(0, 200).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(10_000, 10_200).selectExpr("CAST(id AS STRING) AS k")
    sa = CountMinSketch.build(a, "k", width=4096, depth=4)
    sb = CountMinSketch.build(b, "k", width=4096, depth=4)
    est = cm_inner_product(sa, sb).collect()[0]["estimate"]
    assert est < 40  # disjoint keys: only hash-collision noise
