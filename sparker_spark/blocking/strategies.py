"""Blocking-key generation strategies.

Reference parity: python/sparker/blocking_strategies.py:6-80
(token_blocking, token_blocking_w_attr, ngrams_blocking) and the Scala
stop-word/bad-token filter (scala/.../BlockBuildingMethods/
TokenBlocking.scala:18-24).

All strategies are pure column expressions — no Python UDFs — so they
stay inside whole-stage codegen. Each takes the canonical EAV profiles
DataFrame and returns ``keys(profile_id LONG, source_id INT, key STRING)`` with one
row per *distinct* (profile, key) pair, with ``source_id`` carried
along (functionally dependent on profile_id; carrying it avoids a
re-join shuffle downstream) (the reference collects tokens
into a ``set`` per profile: blocking_strategies.py:27,52).

Tokenization regex: the reference Python splits on ``\\W+``
(blocking_strategies.py:26,51 — keeps ``_`` inside tokens) while Scala
splits on ``[\\W_]`` (BlockingUtils.scala:15-18). We standardize on
the Python-3 behaviour: ``[^\\p{L}\\p{N}_]+`` (runs of anything but
Unicode letters/numbers/underscore), on which Spark (Java regex),
DuckDB (RE2) and the reference's ``re.split('\\W+')`` agree
bit-for-bit INCLUDING non-ASCII word characters — abtBuy carries
halfwidth forms like U+FFAE that Python keeps inside tokens; the
earlier ASCII-only class split them and cost exact blocking parity
there.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^\\p{L}\\p{N}_]+"

# Spark MLlib's default English stop-word list (the exact list
# StopWordsRemover.loadDefaultStopWords("english") returns — vendored
# from the spark-mllib jar resource org/apache/spark/ml/feature/
# stopwords/english.txt so oracle generation needs no JVM). The
# reference's removeBadWords (scala/.../TokenBlocking.scala:18-24)
# broadcasts this same list.
ENGLISH_STOPWORDS = (
    "i me my myself we our ours ourselves you your yours yourself yourselves "
    "he him his himself she her hers herself it its itself they them their "
    "theirs themselves what which who whom this that these those am is are "
    "was were be been being have has had having do does did doing a an the "
    "and but if or because as until while of at by for with about against "
    "between into through during before after above below to from up down in "
    "out on off over under again further then once here there when where why "
    "how all any both each few more most other some such no nor not only own "
    "same so than too very s t can will just don should now".split()
    + [
        "i'll", "you'll", "he'll", "she'll", "we'll", "they'll",
        "i'd", "you'd", "he'd", "she'd", "we'd", "they'd",
        "i'm", "you're", "he's", "she's", "it's", "we're", "they're",
        "i've", "we've", "you've", "they've",
        "isn't", "aren't", "wasn't", "weren't", "haven't", "hasn't",
        "hadn't", "don't", "doesn't", "didn't", "won't", "wouldn't",
        "shan't", "shouldn't", "mustn't", "can't", "couldn't",
        "cannot", "could", "here's", "how's", "let's", "ought",
        "that's", "there's", "what's", "when's", "where's", "who's",
        "why's", "would",
    ]
)


def _base_values(
    profiles: DataFrame,
    attributes_to_exclude: Sequence[str] | None = None,
) -> DataFrame:
    values = profiles.select(
        "profile_id", "source_id", "attr", F.lower("value").alias("value")
    )
    if attributes_to_exclude:
        values = values.where(~F.col("attr").isin(list(attributes_to_exclude)))
    return values


def _tokens(values: DataFrame) -> DataFrame:
    return values.select(
        "profile_id",
        "source_id",
        "attr",
        F.explode(F.split(F.col("value"), TOKEN_SPLIT_RE)).alias("token"),
    ).where(F.length("token") > 0)


class BlockingKeysStrategies:
    @staticmethod
    def token_blocking(
        profiles: DataFrame,
        attributes_to_exclude: Sequence[str] | None = None,
        keys_to_exclude: Sequence[str] | None = None,
    ) -> DataFrame:
        """Schema-agnostic token blocking
        (blocking_strategies.py:33-55): lowercase, split on non-word
        runs, drop empties, distinct tokens over all kept attributes.
        """
        toks = _tokens(_base_values(profiles, attributes_to_exclude))
        if keys_to_exclude:
            toks = toks.where(~F.col("token").isin(list(keys_to_exclude)))
        return toks.select(
            "profile_id", "source_id", F.col("token").alias("key")
        ).distinct()

    @staticmethod
    def token_blocking_w_attr(
        profiles: DataFrame,
        attributes_to_exclude: Sequence[str] | None = None,
        keys_to_exclude: Sequence[str] | None = None,
    ) -> DataFrame:
        """Attribute-qualified token blocking
        (blocking_strategies.py:6-31): key = ``{attr}_{token}``.
        ``keys_to_exclude`` filters raw tokens before prefixing
        (blocking_strategies.py:28-29).
        """
        toks = _tokens(_base_values(profiles, attributes_to_exclude))
        if keys_to_exclude:
            toks = toks.where(~F.col("token").isin(list(keys_to_exclude)))
        return toks.select(
            "profile_id",
            "source_id",
            F.concat(F.col("attr"), F.lit("_"), F.col("token")).alias("key"),
        ).distinct()

    @staticmethod
    def ngrams_blocking(
        profiles: DataFrame,
        attributes_to_exclude: Sequence[str] | None = None,
        ngram_size: int = 3,
        keys_to_exclude: Sequence[str] | None = None,
    ) -> DataFrame:
        """Char n-gram blocking (blocking_strategies.py:57-80). Each
        token is padded with ``n-1`` underscores on both sides and
        sliced into n-grams (utils.py:6-17). Pure higher-order-function
        expression — `sequence` + `transform` + `explode`, no UDF.
        """
        n = int(ngram_size)
        toks = _tokens(_base_values(profiles, attributes_to_exclude)).select(
            "profile_id",
            "source_id",
            F.concat(
                F.lit("_" * (n - 1)), F.col("token"), F.lit("_" * (n - 1))
            ).alias("padded"),
        )
        grams = toks.select(
            "profile_id",
            "source_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(padded) - {n - 1}),"
                    f" i -> substring(padded, i, {n}))"
                )
            ).alias("key"),
        )
        if keys_to_exclude:
            grams = grams.where(~F.col("key").isin(list(keys_to_exclude)))
        return grams.distinct()

    @staticmethod
    def clean_keys(
        keys: DataFrame,
        stopwords: Sequence[str] | None = None,
        min_length: int = 1,
    ) -> DataFrame:
        """Scala-style bad-token removal (TokenBlocking.scala:18-24):
        keep alphabetic-only or numeric-only tokens, drop stopwords.
        """
        kept = keys.where(
            (F.col("key").rlike("^[A-Za-z]+$") | F.col("key").rlike("^[0-9]+$"))
            & (F.length("key") >= min_length)
        )
        if stopwords:
            kept = kept.where(~F.col("key").isin(list(stopwords)))
        return kept
