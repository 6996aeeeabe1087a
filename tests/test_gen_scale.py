"""tools/gen_scale.py invariants: the measured decade (SCALING.md)
is only meaningful if tiling preserves per-unit structure exactly —
join fan-out, duplication rates, token frequencies — while scaling
volume. These tests pin that on a K=2 tiling of sf0.001.
"""

import os
import subprocess
import sys

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scale") / "k2")
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "gen_scale.py"),
         SRC, dst, "2"],
        check=True,
        capture_output=True,
    )
    return dst


def test_row_counts_scale_except_dimensions(tiled):
    con = duckdb.connect()
    for t, k in [("customer", 2), ("orders", 2), ("lineitem", 2),
                 ("events", 2), ("documents", 2), ("embeddings", 2),
                 ("nation", 1), ("region", 1)]:
        n_src = con.execute(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM '{tiled}/{t}.parquet'"
        ).fetchone()[0]
        assert n_dst == k * n_src, t


def test_join_fanout_preserved(tiled):
    """Every order resolves to exactly one customer, every lineitem to
    one order — replicas are disjoint universes, so intra-replica
    joins are preserved and cross-replica joins are impossible."""
    con = duckdb.connect()
    bad = con.execute(f"""
      SELECT count(*) FROM '{tiled}/orders.parquet' o
      LEFT JOIN '{tiled}/customer.parquet' c
        ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL""").fetchone()[0]
    assert bad == 0
    fan_src = con.execute(f"""
      SELECT max(n) FROM (SELECT o_custkey, count(*) AS n
      FROM '{SRC}/orders.parquet' GROUP BY 1)""").fetchone()[0]
    fan_dst = con.execute(f"""
      SELECT max(n) FROM (SELECT o_custkey, count(*) AS n
      FROM '{tiled}/orders.parquet' GROUP BY 1)""").fetchone()[0]
    assert fan_dst == fan_src  # fan-out per key unchanged


def test_token_bijection_disjoint_and_frequency_preserving(tiled):
    con = duckdb.connect()
    # replica 0 text byte-identical to source
    diff = con.execute(f"""
      SELECT count(*) FROM '{SRC}/documents.parquet' s
      JOIN '{tiled}/documents.parquet' d ON s.doc_id = d.doc_id
      WHERE s.text IS DISTINCT FROM d.text""").fetchone()[0]
    assert diff == 0
    # zero token overlap between replicas
    overlap = con.execute(f"""
      WITH t AS (SELECT doc_id // 10000000 AS r,
                 unnest(string_split(text, ' ')) AS tok
                 FROM '{tiled}/documents.parquet')
      SELECT count(*) FROM
        (SELECT DISTINCT tok FROM t WHERE r = 0) a
      JOIN (SELECT DISTINCT tok FROM t WHERE r = 1) b USING (tok)
      """).fetchone()[0]
    assert overlap == 0
    # per-replica exact-duplicate counts identical (duplication rate
    # is per-unit structure)
    dups = con.execute(f"""
      SELECT doc_id // 10000000 AS r,
             count(*) - count(DISTINCT md5(text)) AS d
      FROM '{tiled}/documents.parquet' GROUP BY 1 ORDER BY 1
      """).fetchall()
    assert dups[0][1] == dups[1][1]


def test_embeddings_jittered_not_identical(tiled):
    con = duckdb.connect()
    same = con.execute(f"""
      SELECT count(*) FROM '{tiled}/embeddings.parquet' a
      JOIN '{tiled}/embeddings.parquet' b
        ON a.vec_id + 10000000 = b.vec_id
      WHERE a.embedding = b.embedding""").fetchone()[0]
    assert same == 0  # no exact-tie inflation across replicas
