"""The one-call dedup_corpus() facade (round-12 ask #6): a documents
DataFrame in, the keep-set with per-method attribution out — the
LLM-pipeline counterpart of dedupe()."""

import pytest

from sparker_spark.dedupe import dedup_corpus

BASE = "the quick brown fox jumps over the lazy dog near the river bank"
ALT = (
    "completely different content about spark dataframes and shuffle "
    "partitions in a distributed cluster environment"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1 (same bytes)
        (3, "  " + BASE.upper() + "  "),  # normalized-exact dup of 1
        (4, BASE + " today"),  # near dup of 1 (high shingle overlap)
        (5, ALT),
        (6, "tiny"),
        (7, ALT + " with one extra tail clause appended here"),  # near 5
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def emb(spark):
    # 1/2/3/4 share a direction, 5/7 share another, 6 is orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0]),
        (3, [0.98, 0.0, 0.02]),
        (4, [0.97, 0.02, 0.01]),
        (5, [0.0, 1.0, 0.0]),
        (6, [0.0, 0.0, 1.0]),
        (7, [0.01, 0.99, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def as_map(out):
    return {r["doc_id"]: (r["kept"], r["dropped_by"]) for r in out.collect()}


def test_exact_only(corpus):
    got = as_map(dedup_corpus(corpus, methods=["exact"]))
    assert len(got) == 7
    assert got[1] == (True, None)
    assert got[2] == (False, "exact")
    assert got[3] == (False, "exact")  # normalization folds case/space
    # near-dup but not byte-equal: survives exact-only
    assert got[4] == (True, None)
    assert got[5] == (True, None)


def test_exact_unnormalized_keeps_case_variant(corpus):
    got = as_map(dedup_corpus(corpus, methods=["exact"], normalize=False))
    assert got[2] == (False, "exact")
    assert got[3] == (True, None)  # upper-case copy no longer byte-equal


def test_ladder_attribution_is_first_method(corpus):
    got = as_map(dedup_corpus(corpus, methods=["exact", "minhash"]))
    # 2/3 fall to exact FIRST; 4 survives exact, falls to minhash
    assert got[2] == (False, "exact")
    assert got[3] == (False, "exact")
    assert got[4] == (False, "minhash")
    assert got[1] == (True, None)
    assert got[6] == (True, None)


def test_semantic_stage_and_missing_embeddings_kept(corpus, emb, spark):
    got = as_map(
        dedup_corpus(
            corpus,
            methods=["semantic"],
            embeddings=emb,
            semantic_threshold=0.9,
            target_cell_size=8,
        )
    )
    # 1 is min-id canonical of the {1,2,3,4} cosine cluster; 5 of {5,7}
    assert got[1] == (True, None)
    assert {got[2], got[3], got[4]} == {(False, "semantic")}
    assert got[5] == (True, None)
    assert got[7] == (False, "semantic")
    assert got[6] == (True, None)
    # a doc with no embedding row is kept by the semantic stage
    extra = corpus.sparkSession.createDataFrame(
        [(99, "no embedding for this one")], ["doc_id", "text"]
    )
    got2 = as_map(
        dedup_corpus(
            corpus.unionByName(extra),
            methods=["semantic"],
            embeddings=emb,
            target_cell_size=8,
        )
    )
    assert got2[99] == (True, None)


def test_full_ladder_keep_best_quality(corpus, emb):
    out = dedup_corpus(
        corpus,
        methods=["exact", "minhash", "semantic"],
        embeddings=emb,
        target_cell_size=8,
        keep="best_quality",
    )
    got = as_map(out)
    assert len(got) == 7
    # exact stage unaffected by keep policy
    assert got[2] == (False, "exact")
    # exactly one survivor among {1, 4} (the near-dup pair after exact)
    assert sum(got[i][0] for i in (1, 4)) == 1
    # and one among {5, 7}
    assert sum(got[i][0] for i in (5, 7)) == 1
    assert got[6][0]


def test_validation_errors(corpus, emb):
    with pytest.raises(ValueError, match="at least one"):
        dedup_corpus(corpus, methods=[])
    with pytest.raises(ValueError, match="duplicate"):
        dedup_corpus(corpus, methods=["exact", "exact"])
    with pytest.raises(ValueError, match="unknown method"):
        dedup_corpus(corpus, methods=["fuzzy"])
    with pytest.raises(ValueError, match="embeddings"):
        dedup_corpus(corpus, methods=["semantic"])
    with pytest.raises(ValueError, match="keep"):
        dedup_corpus(corpus, methods=["exact"], keep="random")


def test_simhash_stage(corpus):
    got = as_map(
        dedup_corpus(
            corpus, methods=["simhash"], simhash_max_hamming=3
        )
    )
    assert len(got) == 7
    # identical token multisets -> identical fingerprints -> clustered
    assert got[1][0] and not got[2][0] and got[2][1] == "simhash"
