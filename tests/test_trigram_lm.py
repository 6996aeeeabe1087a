"""Trigram LM scorer: order-3 context catches degenerate documents
that a bigram LM scores as perfectly predictable — the reason the
CCNet-style quality ladder (and the gated ppl partition) moved from
order 2 to order 3 in round 10.
"""

from pyspark.sql import functions as F


def _scores(df):
    return {r["doc_id"]: r["avg_logprob"] for r in df.collect()}


def test_trigram_flips_rank_of_bigram_predictable_doc(spark):
    """Doc E is built ONLY from bigrams that are common in the corpus,
    chained in an order whose trigrams never occur ("sat on the cat").
    A bigram LM cannot see anything wrong with it; the trigram LM
    ranks it strictly below doc G ("on the mat"), whose trigram IS
    corpus-attested — the published motivation for higher-order
    scoring."""
    from sparker_spark.llm.text import LanguageModelScore

    base = [(i, "the cat sat on the mat") for i in range(10)]
    docs = spark.createDataFrame(
        base + [(100, "sat on the cat"), (101, "on the mat")],
        ["doc_id", "text"],
    )
    bi = _scores(LanguageModelScore.bigram_logprob(docs))
    tri = _scores(LanguageModelScore.trigram_logprob(docs))
    # bigram: every pair in E is corpus-frequent -> E ranks at or
    # above G
    assert bi[100] >= bi[101]
    # trigram: E's novel chains are unseen -> strictly below G
    assert tri[100] < tri[101]


def test_trigram_matches_bigram_contract(spark):
    """Same output contract as the gated bigram scorer: <3-token docs
    produce no row; DECIMAL-rounded means; count column n_trigrams."""
    from sparker_spark.llm.text import LanguageModelScore

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b c"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = LanguageModelScore.trigram_logprob(docs)
    assert set(out.columns) == {"doc_id", "n_trigrams", "avg_logprob"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_trigrams"] == 1


def test_ppl_partition_order_param(spark):
    """PerplexityPartition.assign(order=2) reproduces the r9 bigram
    buckets; the default (3) uses the trigram scorer (docs with
    exactly 2 tokens become unscorable and drop out)."""
    from sparker_spark.llm.selection import PerplexityPartition

    docs = spark.createDataFrame(
        [(i, "en", "the cat sat on the mat") for i in range(9)]
        + [(100, "en", "two tokens")],
        ["doc_id", "lang", "text"],
    )
    d2 = PerplexityPartition.assign(docs, order=2)
    d3 = PerplexityPartition.assign(docs)
    ids2 = {r["doc_id"] for r in d2.select("doc_id").collect()}
    ids3 = {r["doc_id"] for r in d3.select("doc_id").collect()}
    assert 100 in ids2 and 100 not in ids3
    assert ids3 == set(range(9))


def test_curate_lm_quantile_floor(spark):
    """curate(lm_floor_quantile=0.5, lm_order=3) drops the scorable
    bottom half and keeps unscorable docs, on any corpus — the
    absolute floor can't do that across vocab scales."""
    from sparker_spark.curate import curate

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(8)]
        + [(50, "zzz qqq xxx vvv www yyy"), (51, "hi")],
        ["doc_id", "text"],
    )
    out = curate(
        docs,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=False,
        jaccard_threshold=None,
        lm_floor_quantile=0.5,
        lm_order=3,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 50 not in kept  # word salad: below the median score
    assert 51 in kept  # unscorable short doc is KEPT
    assert kept & set(range(8))  # common docs survive
