"""Tests for the LLM-pipeline extension operators (dedup, similarity,
text analysis) on hand-checkable micro-fixtures."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.dedup import Dedup
from sparker_spark.llm.similarity import SimilaritySearch
from sparker_spark.llm.text import TextAnalysis


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely different text about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "one two"),  # shorter than a shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_groups(docs):
    out = {r["doc_id"]: r for r in Dedup.exact_groups(docs).collect()}
    assert out[0]["group_size"] == 2
    assert out[3]["group_size"] == 2
    assert out[0]["text_hash"] == out[3]["text_hash"]
    assert out[0]["is_canonical"] and not out[3]["is_canonical"]
    assert out[2]["group_size"] == 1


def test_ngram_jaccard(docs):
    pairs = {
        (r["p1"], r["p2"]): r["jaccard"]
        for r in Dedup.ngram_jaccard_pairs(docs, 3, 0.2).collect()
    }
    # doc0 vs doc3 identical -> jaccard 1.0
    assert pairs[(0, 3)] == pytest.approx(1.0)
    # doc0 vs doc1: 7 shingles each, 6 shared -> 6/8 = 0.75
    assert pairs[(0, 1)] == pytest.approx(0.75)
    assert (0, 2) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    # bands=16 (rows=2): detection probability for jaccard 0.75 is
    # 1 - (1 - 0.75^2)^16 ~ 1 - 2e-6 — deterministic with the fixed seed
    pairs = {
        (r["p1"], r["p2"]): r["jaccard"]
        for r in Dedup.minhash_lsh_pairs(docs, 32, 16, 3, 0.2).collect()
    }
    assert (0, 3) in pairs  # identical docs always collide
    assert pairs[(0, 3)] == pytest.approx(1.0)
    assert (0, 1) in pairs


def test_minhash_lsh_cross_source(spark, sf_dir):
    """source_col restricts to cross-source pairs — exactly the
    all-pairs result minus within-source pairs (new-crawl-vs-old-crawl
    dedup)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "crawl", (F.col("doc_id") % 2).cast("int")
    )
    all_pairs = {
        (r["p1"], r["p2"])
        for r in Dedup.minhash_lsh_pairs(docs).collect()
    }
    cross = {
        (r["p1"], r["p2"])
        for r in Dedup.minhash_lsh_pairs(docs, source_col="crawl").collect()
    }
    want = {(p1, p2) for p1, p2 in all_pairs if p1 % 2 != p2 % 2}
    assert cross == want
    assert len(cross) > 0 and cross < all_pairs


def test_minhash_lsh_subset_of_exact(docs):
    lsh = {
        (r["p1"], r["p2"])
        for r in Dedup.minhash_lsh_pairs(docs, 32, 8, 3, 0.2).collect()
    }
    exact = {
        (r["p1"], r["p2"])
        for r in Dedup.ngram_jaccard_pairs(docs, 3, 0.2).collect()
    }
    assert lsh <= exact


def test_simhash(docs):
    fps = {
        r["doc_id"]: r["simhash"]
        for r in Dedup.simhash_fingerprints(docs).collect()
    }
    assert fps[0] == fps[3]  # identical text, identical fingerprint
    pairs = {
        (r["p1"], r["p2"]): r["hamming"]
        for r in Dedup.simhash_pairs(docs, 32, 3).collect()
    }
    assert pairs[(0, 3)] == 0


def test_embedding_cosine_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    pairs = {
        (r["p1"], r["p2"]): r["cosine"]
        for r in Dedup.embedding_cosine_pairs(emb, 0.9).collect()
    }
    assert pairs[(0, 3)] == pytest.approx(1.0)
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_ann_topk(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (100, [0.95, 0.05]),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = SimilaritySearch.topk_cosine(
        emb, k=2, query_filter="vec_id % 100 = 0"
    ).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"])
        )
    # query 0: nearest is 100 then 1
    assert sorted(by_query[0]) == [(1, 100), (2, 1)]
    assert len(by_query[100]) == 2


def test_ann_ivf_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = SimilaritySearch.topk_cosine(
        emb, k=5, query_filter="vec_id % 100 = 0"
    )
    approx = SimilaritySearch.topk_cosine_ivf(
        emb, k=5, num_cells=8, n_probe=4, query_filter="vec_id % 100 = 0"
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_index_roundtrip_and_fresh_queries(spark, sf_dir, tmp_path):
    """IVFIndex build -> write (partitioned by cell) -> read -> search
    must equal the one-shot topk_cosine_ivf; a FRESH query relation
    sketched against the persisted index must match self-join results
    for the same ids."""
    from sparker_spark.llm.similarity import IVFIndex

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    one_shot = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in SimilaritySearch.topk_cosine_ivf(
            emb, k=5, num_cells=8, n_probe=4, query_filter="vec_id % 100 = 0"
        ).collect()
    }

    index = IVFIndex.build(emb, num_cells=8)
    path = str(tmp_path / "ivf_index")
    index.write(path)
    loaded = IVFIndex.read(spark, path)
    assert (loaded.num_cells, loaded.seed, loaded.dim) == (
        index.num_cells,
        index.seed,
        index.dim,
    )
    served = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in loaded.search(
            k=5, n_probe=4, query_filter="vec_id % 100 = 0"
        ).collect()
    }
    assert served == one_shot

    # fresh query batch (not pre-sketched): same vectors as a new
    # relation must produce the same neighbors
    fresh = emb.where("vec_id % 100 = 0")
    fresh_out = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in loaded.search(queries=fresh, k=5, n_probe=4).collect()
    }
    assert fresh_out == one_shot


def test_text_stats(docs):
    out = {r["doc_id"]: r for r in TextAnalysis.token_stats(docs).collect()}
    assert out[4]["n_tokens_ws"] == 2
    assert out[0]["n_tokens_ws"] == 9
    assert out[0]["n_distinct_tokens"] == 8  # 'the' twice


def test_lang_id(spark):
    rows = [
        (0, "the cat is in the house and it is big", "en"),
        (1, "der hund ist nicht mit der katze auf dem dach", "de"),
        (2, "xyzzy plugh qwerty", "zz"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["doc_id"]: r["predicted_lang"] for r in TextAnalysis.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"


def test_quality_monotone(docs):
    out = {r["doc_id"]: r for r in TextAnalysis.quality_score(docs).collect()}
    for r in out.values():
        assert 0.0 <= r["quality_score"] <= 1.0
    # doc with stopwords + alpha tokens scores above the 2-word fragment
    assert out[0]["quality_score"] > out[4]["quality_score"]


def test_srp_bucket_purity(spark):
    from sparker_spark.llm.similarity import EmbeddingDiagnostics

    # two orthogonal directions -> with 2 SRP bits the +x/-x and +y/-y
    # groups land in distinct sign buckets; purity is exact per fixture
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, -0.1], 1),  # minority label in the +x bucket region
        (3, [-1.0, 0.0], 1),
        (4, [-0.9, -0.2], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = EmbeddingDiagnostics.srp_bucket_purity(emb, bits=2, seed=1234)
    rows_out = out.collect()
    assert sum(r["n_vecs"] for r in rows_out) == 5
    for r in rows_out:
        assert r["majority_n"] <= r["n_vecs"]
        assert abs(r["purity"] - round(r["majority_n"] / r["n_vecs"], 6)) < 1e-9
        assert r["n_labels"] >= 1


def test_srp_bucket_purity_empty(spark):
    from sparker_spark.llm.similarity import EmbeddingDiagnostics

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>, label int")
    assert EmbeddingDiagnostics.srp_bucket_purity(emb).count() == 0


def test_chunker_windows_and_overlap(spark):
    from sparker_spark.llm.text import Chunker

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g"),   # 7 tokens
            (1, "  "),              # whitespace only -> no rows
            (2, "x"),               # single short window
        ],
        ["doc_id", "text"],
    )
    # chunk=3, overlap=1 -> stride 2: starts 1,3,5 (a start at 7 would
    # be the pure-overlap window "g", a strict subset of "e f g" —
    # suppressed so training text is never duplicated verbatim)
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in Chunker.chunk(docs, 3, 1).collect()
    }
    assert out[(0, 0)] == ("a b c", 3)
    assert out[(0, 1)] == ("c d e", 3)
    assert out[(0, 2)] == ("e f g", 3)
    assert (0, 3) not in out
    assert out[(2, 0)] == ("x", 1)
    assert not [k for k in out if k[0] == 1]

    import pytest as _pt

    with _pt.raises(ValueError):
        Chunker.chunk(docs, 0)
    with _pt.raises(ValueError):
        Chunker.chunk(docs, 4, 4)


def test_unigram_logprob_empty_and_values(spark):
    from sparker_spark.llm.text import LanguageModelScore

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert LanguageModelScore.unigram_logprob(empty).count() == 0

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b"), (2, "   ")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in LanguageModelScore.unigram_logprob(docs).collect()
    }
    # corpus: a=2, b=2, total=4 -> every token has lp = ln(0.5)
    import math

    lp = math.floor(math.log(0.5) * 1e6) / 1e6
    assert out[0]["n_tokens"] == 3
    assert out[0]["avg_logprob"] == pytest.approx(lp, abs=2e-6)
    assert out[1]["n_tokens"] == 1
    assert 2 not in out  # whitespace-only doc: no row


def test_chunker_reconstruction_property(spark):
    """Property: with overlap=0 the chunks partition the token list
    exactly (concatenation round-trips, token counts sum); with
    overlap o, consecutive chunks share exactly o tokens until the
    final short window."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sparker_spark.llm.text import Chunker

    corpus = st.lists(
        st.lists(st.sampled_from([f"w{i}" for i in range(12)]),
                 min_size=0, max_size=40),
        min_size=1, max_size=8,
    )

    @given(docs=corpus, c=st.sampled_from([3, 5, 8]), o=st.sampled_from([0, 1, 2]))
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def check(docs, c, o):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = Chunker.chunk(df, c, o).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            )
        for i, toks in enumerate(docs):
            chunks = sorted(by_doc.get(i, []))
            if not toks:
                assert chunks == []
                continue
            # chunk_idx is dense from 0
            assert [c_[0] for c_ in chunks] == list(range(len(chunks)))
            stride = c - o
            rebuilt = []
            for idx, (ci, text, n) in enumerate(chunks):
                ts = text.split(" ") if text else []
                assert len(ts) == n
                assert ts == toks[idx * stride : idx * stride + c]
                rebuilt.extend(ts if idx == 0 else ts[o:] if len(ts) > o else [])
            if o == 0:
                assert rebuilt == toks

    check()


def test_bigram_logprob_hand_checked(spark):
    from sparker_spark.llm.text import LanguageModelScore

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in LanguageModelScore.bigram_logprob(docs).collect()
    }
    import math

    # corpus bigrams: (a,b)x3, (b,a)x1; contexts c(a)=3, c(b)=1; V=3
    def lp(cb, c1):
        return math.floor(math.log((cb + 1) / (c1 + 3)) * 1e6) / 1e6

    ab, ba = lp(3, 3), lp(1, 1)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_logprob"] == pytest.approx(
        math.floor((2 * ab + ba) / 3 * 1e6 + 0.5) / 1e6, abs=2e-6
    )
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_logprob"] == pytest.approx(ab, abs=2e-6)
    assert 2 not in out  # single-token doc: no bigrams, no row

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert LanguageModelScore.bigram_logprob(empty).count() == 0


def test_bigram_logprob_zero_token_docs_no_crash(spark):
    """Regression (r8 review): a doc whose text tokenizes to zero
    tokens ('!!!', '') must be silently skipped, not crash the slice
    with length -1."""
    from sparker_spark.llm.text import LanguageModelScore

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "!!!"), (2, ""), (3, "??? !!!")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"] for r in LanguageModelScore.bigram_logprob(docs).collect()}
    assert out == {0}
