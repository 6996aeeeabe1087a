"""Unit + randomized coverage for rounding.rewrite_rounds — the
rewriter every oracle SQL string passes through. A silent mis-rewrite
would corrupt all 100 oracles at once, so this guards paren matching,
quote handling, nesting, and numeric equivalence directly."""

import math
import random

import duckdb
import pytest

from sparker_spark.rounding import rewrite_rounds, sql_rnd


def test_basic_and_nested():
    assert rewrite_rounds("SELECT round(x, 2) FROM t") == (
        f"SELECT {sql_rnd('x', 2)} FROM t"
    )
    # nested: inner round rewritten too
    out = rewrite_rounds("round(round(x, 4) + y, 2)")
    assert "round(" not in out
    assert out.count("floor(") == 2


def test_quoted_literals_untouched():
    sql = "SELECT 'round(x, 2)' AS s, round(y, 3) FROM t"
    out = rewrite_rounds(sql)
    assert "'round(x, 2)'" in out  # literal preserved
    assert out.count("floor(") == 1


def test_escaped_quotes():
    sql = "SELECT 'it''s round(a,1)' , round(b, 1) FROM t"
    out = rewrite_rounds(sql)
    assert "it''s round(a,1)" in out
    assert out.count("floor(") == 1


def test_identifier_suffix_not_matched():
    # wround(... is not a round() call
    sql = "SELECT wround(x, 2), my_round(y, 1) FROM t"
    assert rewrite_rounds(sql) == sql


def test_zero_digit_default():
    out = rewrite_rounds("round(x)")
    assert out == sql_rnd("x", 0)


def test_unbalanced_raises():
    with pytest.raises(ValueError):
        rewrite_rounds("SELECT round(x, 2 FROM t")


def test_numeric_equivalence_in_duckdb():
    """The rewritten form must produce floor-formula values; spot-check
    against Python's floor formula on random doubles."""
    rng = random.Random(12)
    vals = [round(rng.uniform(-1000, 1000), 8) for _ in range(200)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got = [r[0] for r in con.execute(
        rewrite_rounds("SELECT round(x, 3) FROM t ORDER BY rowid")).fetchall()]
    want = [math.floor(v * 1000.0 + 0.5) / 1000.0 for v in vals]
    assert got == want
