"""Dedup.keep_best — near-dup canonicalization by quality score.

The cluster keeper is the argmax of the caller's score (id breaks
ties), NOT the min id that ConnectedComponents.canonical_groups uses;
docs in no cluster keep themselves."""

from __future__ import annotations

from sparker_spark.llm.dedup import Dedup


def test_keeper_is_best_quality_not_min_id(spark):
    # cluster {1,2,3} chained through 2; doc 3 has the best score
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "p1 long, p2 long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (3, 0.9), (7, 0.1)],
        "doc_id long, quality_score double",
    )
    rows = {r["doc_id"]: r for r in Dedup.keep_best(scores, pairs).collect()}
    assert rows[1]["keeper_id"] == 3 and not rows[1]["kept"]
    assert rows[2]["keeper_id"] == 3 and not rows[2]["kept"]
    assert rows[3]["keeper_id"] == 3 and rows[3]["kept"]
    assert rows[1]["component"] == rows[3]["component"] == 1
    assert rows[1]["cluster_size"] == 3
    # singleton: its own keeper, cluster of one
    assert rows[7]["kept"] and rows[7]["keeper_id"] == 7
    assert rows[7]["cluster_size"] == 1 and rows[7]["component"] == 7


def test_score_tie_breaks_on_lowest_id(spark):
    pairs = spark.createDataFrame([(5, 9)], "p1 long, p2 long")
    scores = spark.createDataFrame(
        [(5, 0.4), (9, 0.4)], "doc_id long, quality_score double"
    )
    rows = {r["doc_id"]: r for r in Dedup.keep_best(scores, pairs).collect()}
    assert rows[5]["kept"] and rows[9]["keeper_id"] == 5


def test_every_scored_doc_gets_exactly_one_row(spark):
    pairs = spark.createDataFrame([(0, 1)], "p1 long, p2 long")
    scores = spark.createDataFrame(
        [(i, float(i) / 10.0) for i in range(6)],
        "doc_id long, quality_score double",
    )
    out = Dedup.keep_best(scores, pairs)
    assert out.count() == 6
    assert out.select("doc_id").distinct().count() == 6
    assert out.where("kept").count() == 5  # one pair collapses


def test_boilerplate_removal_drops_shared_keeps_unique(spark):
    from sparker_spark.llm.curation import BoilerplateRemoval

    docs = spark.createDataFrame(
        [
            (1, "FOOTER\nbody one\nFOOTER"),
            (2, "body two\nFOOTER"),
            (3, "body three\n  FOOTER  "),  # trimmed form matches
            (4, "FOOTER"),                  # all-boilerplate doc
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in BoilerplateRemoval.remove_shared_lines(
            docs, min_docs=3
        ).collect()
    }
    assert out[1]["text"] == "body one"
    assert out[1]["n_lines_kept"] == 1 and out[1]["n_lines_dropped"] == 2
    assert out[2]["text"] == "body two"
    assert out[3]["text"] == "body three"
    assert out[4]["text"] == "" and out[4]["n_lines_kept"] == 0
    assert out[4]["n_lines_dropped"] == 1


def test_boilerplate_removal_preserves_line_order(spark):
    from sparker_spark.llm.curation import BoilerplateRemoval

    docs = spark.createDataFrame(
        [(1, "z\na\nm"), (2, "unrelated")], "doc_id long, text string"
    )
    out = BoilerplateRemoval.remove_shared_lines(docs, min_docs=2).collect()
    assert {r["doc_id"]: r["text"] for r in out}[1] == "z\na\nm"


def test_knn_label_vote_flags_mislabel(spark):
    from sparker_spark.llm.similarity import LabelKNN, SimilaritySearch

    # two tight clusters; vec 5 sits in cluster A but carries label 1
    rows = []
    for i in range(5):
        rows.append((i, [1.0 + i * 0.01, 0.0], 0))
        rows.append((10 + i, [0.0, 1.0 + i * 0.01], 1))
    rows.append((5, [1.0, 0.02], 1))  # mislabeled
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in LabelKNN.predict(emb, k=3).collect()}
    assert out[5]["predicted_label"] == 0 and not out[5]["agrees"]
    assert out[0]["predicted_label"] == 0 and out[0]["agrees"]
    assert out[12]["predicted_label"] == 1 and out[12]["agrees"]

    # precomputed-neighbors path (the IVF scale shape) matches default
    nb = SimilaritySearch.topk_cosine(emb, k=3)
    alt = {
        r["vec_id"]: r["predicted_label"]
        for r in LabelKNN.predict(emb, neighbors=nb).collect()
    }
    assert alt == {v: r["predicted_label"] for v, r in out.items()}


def test_boilerplate_crlf_and_whitespace_only_lines(spark):
    from sparker_spark.llm.curation import BoilerplateRemoval

    docs = spark.createDataFrame(
        [
            (1, "FOOTER\r\nbody one"),       # CRLF doc
            (2, "FOOTER\nbody two"),          # LF doc — same key
            (3, "\t\nbody three\n\t"),        # whitespace-only lines
            (4, "\t\nbody four\n\t"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in BoilerplateRemoval.remove_shared_lines(
            docs, min_docs=2
        ).collect()
    }
    # CRLF and LF footers normalize to one key and both drop
    assert out[1]["text"] == "body one" and out[2]["text"] == "body two"
    # whitespace-only lines never enter the frequency relation: kept
    assert out[3]["n_lines_dropped"] == 0 and out[3]["n_lines_kept"] == 3


def test_knn_null_labels_never_vote_or_query(spark):
    from sparker_spark.llm.similarity import LabelKNN

    rows = [(i, [1.0 + i * 0.01, 0.0], 0) for i in range(4)]
    rows.append((8, [1.0, 0.01], None))  # unlabeled vector
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["vec_id"]: r for r in LabelKNN.predict(emb, k=3).collect()}
    assert 8 not in out  # unlabeled never a query
    for r in out.values():  # and never a vote: all predictions real
        assert r["predicted_label"] == 0 and r["agrees"] is True


def test_knn_precomputed_neighbors_truncated_to_k(spark):
    from sparker_spark.llm.similarity import LabelKNN, SimilaritySearch

    rows = [(i, [1.0, float(i) * 0.1], i % 2) for i in range(8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    wide = SimilaritySearch.topk_cosine(emb, k=7)
    narrow = LabelKNN.predict(emb, k=3, neighbors=wide).collect()
    direct = LabelKNN.predict(emb, k=3).collect()
    key = lambda rs: sorted((r["vec_id"], r["predicted_label"]) for r in rs)  # noqa: E731
    assert key(narrow) == key(direct)
