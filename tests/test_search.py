"""Tests for BM25 ranked retrieval (sparker_spark/llm/search.py)."""

import math

import pytest

from sparker_spark.llm.search import TextSearch


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark engine"),
        (1, "spark engine"),
        (2, "distributed data engine"),
        (3, "cats and dogs"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25_hand(tf, df, n, dlen, avgdl, k1=1.2, b=0.75):
    idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dlen / avgdl))


def test_bm25_values_and_order(spark, corpus):
    out = {r["doc_id"]: r for r in TextSearch.bm25(corpus, "spark", k=10).collect()}
    # docs 0 and 1 contain 'spark'; df=2, N=4, avgdl=(4+2+3+3)/4=3
    want0 = _bm25_hand(tf=3, df=2, n=4, dlen=4, avgdl=3.0)
    want1 = _bm25_hand(tf=1, df=2, n=4, dlen=2, avgdl=3.0)
    assert set(out) == {0, 1}
    assert out[0]["score"] == pytest.approx(want0, abs=1e-6)
    assert out[1]["score"] == pytest.approx(want1, abs=1e-6)
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2


def test_bm25_multi_term_and_k(spark, corpus):
    out = TextSearch.bm25(corpus, "spark engine", k=2).collect()
    assert len(out) == 2
    assert [r["rank"] for r in out] == [1, 2] or {r["rank"] for r in out} == {1, 2}
    # every returned doc contains at least one query term
    assert {r["doc_id"] for r in out} <= {0, 1, 2}


def test_bm25_unknown_terms_and_empty_query(spark, corpus):
    assert TextSearch.bm25(corpus, "zzz qqq", k=5).count() == 0
    assert TextSearch.bm25(corpus, "   ", k=5).count() == 0


def test_bm25_rare_term_outranks_common(spark, corpus):
    # 'distributed' (df=1) must outrank docs matching only 'engine' (df=3)
    out = TextSearch.bm25(corpus, "distributed engine", k=3).collect()
    assert out[0]["doc_id"] == 2


def test_int8_quantization_and_ivf(spark):
    """Symmetric absmax int8: scale/clamp/zero-vector semantics, and
    the quantized IVF ranking agrees with exact cosine on separated
    vectors (scales cancel -> integer-exact cosine)."""
    from pyspark.sql import functions as F
    from sparker_spark.llm.similarity import Quantization

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (4, [-2.0, 2.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    q8 = {r["vec_id"]: r for r in Quantization.int8(df).collect()}
    assert list(q8[0]["qvec"]) == [127, 0, 0, 0]
    assert q8[3]["scale"] == 0.0 and list(q8[3]["qvec"]) == [0, 0, 0, 0]
    assert list(q8[4]["qvec"]) == [-127, 127, 0, 64]  # round(0.5*127)=64
    assert abs(q8[4]["scale"] - 2.0 / 127.0) < 1e-12
    # quantized IVF ranking: vec 1 is vec 0's nearest neighbor; the
    # all-zero vector is DROPPED by the index (norm 0 -> NaN cosine
    # would otherwise rank first), no pre-filtering needed
    idx = Quantization.ivf_index_int8(df, num_cells=2, seed=7)
    assert idx.indexed.where("vec_id = 3").count() == 0
    top = idx.search(k=1, n_probe=2).where("query_id = 0").collect()
    assert top and top[0]["neighbor_id"] == 1
