"""One-call curate() wrapper: each stage must drop exactly its planted
offender while the clean survivor passes end-to-end."""

import pytest

from sparker_spark.curate import curate

GOOD = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew quirky potions beneath a glowing autumn sky tonight"
)
GOOD2 = (
    "mountain rivers carve ancient valleys through granite stone as "
    "eagles circle high above the misty northern ridge line today"
)


def test_curate_stages(spark):
    rows = [
        (0, GOOD),
        (1, GOOD2),
        (2, "spam spam spam spam spam spam spam spam spam spam"),  # repetition
        (3, "#### !!!! ???? %%%% @@@@"),                           # low quality
        (4, GOOD),                                                 # exact dup of 0
        (5, GOOD + " extra"),                                      # near-dup of 0
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate(docs, jaccard_threshold=0.5)
    kept = {r["doc_id"] for r in out.collect()}
    assert 1 in kept
    assert 2 not in kept  # repetition filter
    assert 3 not in kept  # quality floor
    # exactly one canonical survives from the {0, 4, 5} dup cluster
    assert len(kept & {0, 4, 5}) == 1


def test_curate_decontamination_and_toggles(spark):
    docs = spark.createDataFrame([(0, GOOD), (1, GOOD2)], ["doc_id", "text"])
    ev = spark.createDataFrame([(100, GOOD)], ["doc_id", "text"])
    # all filters off except decontamination
    out = curate(
        docs,
        eval_docs=ev,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=False,
        jaccard_threshold=None,
        decon_ngram=5,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1}  # doc 0 shares 5-grams with the eval split

    # everything off -> identity
    out = curate(
        docs,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=False,
        jaccard_threshold=None,
    )
    assert out.count() == 2


def test_curate_custom_column_names(spark):
    docs = spark.createDataFrame(
        [("r1", GOOD), ("r2", GOOD)], ["rid", "body"]
    )
    out = curate(docs, id_col="rid", text_col="body", jaccard_threshold=None)
    assert set(out.columns) == {"rid", "body"}
    assert out.count() == 1  # exact dup collapsed


def test_curate_boilerplate_stage_and_keep_best(spark):
    # shared FOOTER line on every doc; doc 6 is ONLY boilerplate
    rows = [
        (0, GOOD + "\nFOOTER"),
        (1, GOOD2 + "\nFOOTER"),
        (4, GOOD + "\nFOOTER"),            # exact dup of 0 after strip
        (5, GOOD + " extra\nFOOTER"),      # near-dup of 0 (longer body)
        (6, "FOOTER"),                     # drops to empty
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate(
        docs,
        jaccard_threshold=0.5,
        boilerplate_min_docs=3,
        near_dup_keep="best_quality",
    )
    res = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 6 not in res                    # all-boilerplate doc dropped
    assert all("FOOTER" not in t for t in res.values())
    assert 1 in res
    # keep-best: the longer near-dup (higher length score) survives,
    # not the min-id; exact dedup already collapsed {0, 4} to 0
    assert set(res) & {0, 4, 5} == {5}


def test_curate_rejects_bad_keep_mode(spark):
    docs = spark.createDataFrame([(0, GOOD)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="near_dup_keep"):
        curate(docs, near_dup_keep="newest")


def test_min_lm_logprob_filters_word_salad(spark):
    """curate(min_lm_logprob=...): documents scoring below the corpus
    bigram-LM floor drop; docs with <2 tokens (no score) are KEPT."""
    from sparker_spark.curate import curate

    good = "the cat sat on the mat and the cat sat again on the mat"
    rows = [(i, good) for i in range(6)]
    rows.append((6, "zxq plo mat werv cat kjh the qqa"))  # word salad
    rows.append((7, "single"))  # 1 token: unscored -> kept
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # the floor sits between the salad doc's score and the good docs'
    # (absolute logprob levels depend on vocab size under Laplace)
    from sparker_spark.llm.text import LanguageModelScore

    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in LanguageModelScore.bigram_logprob(docs).collect()
    }
    assert scores[6] < min(scores[i] for i in range(6))
    floor = (scores[6] + min(scores[i] for i in range(6))) / 2
    out = curate(
        docs,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=False,
        jaccard_threshold=None,
        min_lm_logprob=floor,
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert 7 in kept  # unscored short doc survives
    assert 6 not in kept  # word salad scores far below the floor
    assert set(range(6)) <= kept


def test_funnel_report_stages(spark):
    from sparker_spark.curate import funnel_report

    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (0, shared),
            (1, shared),
            (2, "x y z totally different words right here"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["stage"]: r
        for r in funnel_report(
            docs,
            min_quality=None,
            exact_dedup=True,
            dup_span_words=5,
        ).collect()
    }
    assert rows["raw"]["docs"] == 3 and rows["raw"]["tokens"] == 28
    # exact dedup: docs 0/1 identical -> canonical 0 survives
    assert rows["exact_dedup"]["docs"] == 2
    assert rows["exact_dedup"]["tokens"] == 18
    # span stage: nothing left duplicated after exact dedup
    assert rows["span_dedup"]["docs"] == 2
    assert rows["span_dedup"]["tokens"] == 18
    # stage order is stable
    assert rows["raw"]["stage_idx"] == 0
    assert rows["span_dedup"]["stage_idx"] == 2


def test_funnel_report_span_tokens(spark):
    from sparker_spark.curate import funnel_report

    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} tail0 one"),
            (1, f"{shared} tail1 two"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["stage"]: r
        for r in funnel_report(
            docs,
            min_quality=None,
            exact_dedup=False,
            dup_span_words=5,
        ).collect()
    }
    # doc 1's copy of the shared block is cut (keep-first): 24 -> 14
    assert rows["raw"]["tokens"] == 24
    assert rows["span_dedup"]["docs"] == 2
    assert rows["span_dedup"]["tokens"] == 14


def test_funnel_report_matches_curate_survivors(spark):
    """Drift guard: the funnel's final stage must count exactly the
    docs curate() emits for the same knobs."""
    from sparker_spark.curate import curate, funnel_report

    shared = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (0, f"{shared} uniq zero"),
            (1, f"pre {shared} post"),
            (2, shared),
            (3, "all fresh words in this document here"),
        ],
        ["doc_id", "text"],
    )
    kwargs = dict(
        min_quality=None,
        exact_dedup=True,
        dup_span_words=5,
    )
    survivors = curate(
        docs,
        redact=False,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        jaccard_threshold=None,
        dup_span_min_occ=2,
        **kwargs,
    )
    rows = {r["stage"]: r for r in funnel_report(docs, **kwargs).collect()}
    agg = survivors.selectExpr(
        "count(*) AS docs",
        "sum(size(filter(split(text, '[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+'), t -> length(t) > 0)))"
        " AS tokens",
    ).first()
    assert rows["span_dedup"]["docs"] == agg["docs"]
    assert rows["span_dedup"]["tokens"] == (agg["tokens"] or 0)
