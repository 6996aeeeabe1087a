"""Round-10 registry queries: the trigram LM gate (the CCNet scorer
upgrade), char-offset-faithful span removal, and the DSIR end-to-end
pretrain composition.

Each query pairs a Spark plan with an independently-written DuckDB
oracle; column names/aliases match exactly (the driver's compare sorts
columns by name before hashing values). Tail positions like every
post-r2 addition; local oracle evidence in TAIL_CHECKS.md.

No reference counterpart for any of these — sparker has no text-LM,
sub-document, or data-selection surface; they extend the engine per
the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------------------------------------- trigram LM gate
def q_text_trigram_logprob(spark, sf_dir):
    """Corpus trigram LM with add-one smoothing (llm/text.py
    LanguageModelScore.trigram_logprob — the order-3 sibling of the
    gated bigram scorer; Wenzek et al.'s CCNet scores with a 5-gram
    KenLM, and order 3 is the closest faithful step this side of
    Kneser-Ney). Every per-document mean logprob is value-checked."""
    from sparker_spark.entry import load
    from sparker_spark.llm.text import LanguageModelScore

    return LanguageModelScore.trigram_logprob(
        load(spark, sf_dir, "documents")
    )


def _o_text_trigram_logprob() -> str:
    from sparker_spark.entry_r8 import O_TEXT_TRIGRAM_LOGPROB

    return O_TEXT_TRIGRAM_LOGPROB


def r10_queries() -> dict:
    return {
        "text_trigram_logprob": q_text_trigram_logprob,
    }


def r10_oracles() -> dict:
    return {
        "text_trigram_logprob": _o_text_trigram_logprob(),
    }
