"""Randomized cross-engine determinism for the portable primitives.

Every oracle-graded query rests on three primitives producing
bit-identical values in Spark and DuckDB: the floor-formula rounding
(rounding.py), the md5-derived 60-bit hash (llm/hashing.py), and the
affine mod-2^31−1 permutations over it. This drives a seeded random
sample of each through BOTH engines and compares exactly — the
cheapest early-warning if either engine changes behavior.
"""

import math
import random

import duckdb
from pyspark.sql import functions as F

from sparker_spark.llm.hashing import (
    DUCK_HASH60,
    MERSENNE_31,
    SPARK_HASH60,
    minhash_coefficients,
    minhash_expr,
)
from sparker_spark.rounding import rnd, sql_rnd

N = 5_000


def test_rounding_floor_formula_matches(spark):
    rng = random.Random(42)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(N)] + [
        rng.uniform(-1.0, 1.0) for _ in range(N)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["y"] for r in df.select(rnd("x", 6).alias("y")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [r[0] for r in con.execute(f"SELECT {sql_rnd('x', 6)} FROM t").fetchall()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (math.isnan(g) and math.isnan(w)) or g == w


def test_hash60_and_affine_permutations_match(spark):
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-"
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(N)
    ]
    a, b = minhash_coefficients(1, seed=99)[0]
    perm = minhash_expr(a, b)
    spark_sql = (
        f"SELECT x, {SPARK_HASH60.format(x='x')} AS h, "
        f"({SPARK_HASH60.format(x='x')} % {MERSENNE_31}) AS h31"
    )
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    df.createOrReplaceTempView("hash_vals")
    srows = spark.sql(
        spark_sql.replace("SELECT x", "SELECT x", 1) + " FROM hash_vals"
    ).collect()
    got = {r["x"]: (r["h"], r["h31"]) for r in srows}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    drows = con.execute(
        f"SELECT x, {DUCK_HASH60.format(x='x')} AS h, "
        f"({DUCK_HASH60.format(x='x')} % {MERSENNE_31}) AS h31, "
        f"{perm} AS p FROM (SELECT x, ({DUCK_HASH60.format(x='x')} % {MERSENNE_31}) AS h31 FROM t)"
    ).fetchall()
    # affine permutation on the Spark side over the same h31
    sperm = {
        r["x"]: r["p"]
        for r in spark.sql(
            f"SELECT x, {perm} AS p FROM (SELECT x, "
            f"({SPARK_HASH60.format(x='x')} % {MERSENNE_31}) AS h31 FROM hash_vals)"
        ).collect()
    }
    for x, h, h31, p in drows:
        assert got[x] == (h, h31), x
        assert sperm[x] == p, x


def test_hll_rho_and_bucket_match(spark):
    """The HLL primitives — bucket = h60 % m and rho via length(bin())
    — must agree bit-for-bit across engines on random strings."""
    from sparker_spark.sketches import HyperLogLog, _portable_h60

    rnd_ = random.Random(99)
    vals = [f"v{rnd_.randrange(10**9)}" for _ in range(300)]
    m = 1024
    h_s = _portable_h60("v", "spark")
    h_d = _portable_h60("v", "duck")
    df = spark.createDataFrame([(v,) for v in vals], "v string").selectExpr(
        "v",
        f"({h_s} % {m}) AS bucket",
        f"{HyperLogLog._rho_sql(f'({h_s} div {m})')} AS rho",
    )
    got = {r["v"]: (r["bucket"], r["rho"]) for r in df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT v, ({h_d} % {m}),"
            f" {HyperLogLog._rho_sql(f'({h_d} // {m})')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_weighted_rank_key_matches(spark):
    """The Efraimidis-Spirakis rank key pow(coord, 1/w) rounded to 12
    decimals must agree across engines on random (key, weight)."""
    from sparker_spark.llm.sampling import _coord_sql

    rnd_ = random.Random(7)
    rows = [(rnd_.randrange(10**6), rnd_.randrange(1, 500)) for _ in range(300)]
    cs = _coord_sql("k", 3, "spark")
    cd = _coord_sql("k", 3, "duck")
    scale = 1e12
    df = spark.createDataFrame(rows, "k long, w long").selectExpr(
        "k",
        # CAST the scale: a bare 1e12-style literal parses as DECIMAL in
        # Spark SQL (the library path uses typed double lits)
        f"floor(pow({cs}, 1.0 / CAST(w AS DOUBLE))"
        f" * CAST({scale!r} AS DOUBLE) + 0.5)"
        f" / CAST({scale!r} AS DOUBLE) AS r",
    )
    got = {r["k"]: r["r"] for r in df.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    # duckdb surfaces the division as DECIMAL; compare as floats
    want = {
        r[0]: float(r[1])
        for r in con.execute(
            f"SELECT k, floor(pow({cd}, 1.0 / CAST(w AS DOUBLE)) * {scale!r}"
            f" + 0.5) / {scale!r} FROM t"
        ).fetchall()
    }
    assert got == want
