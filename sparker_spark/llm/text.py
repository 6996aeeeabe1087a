"""Text-analysis operators for large-scale training-data pipelines.

Extensions beyond the reference's ER surface (SURVEY §7.1 M8): language
identification, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. All pure
column expressions — JVM-side, whole-stage-codegen friendly; no Python
UDFs — so they run at scan speed on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.rounding import rnd

# small, fixed stopword lists per language for the n-gram/stopword
# language-ID heuristic; deterministic and replicated in the DuckDB
# oracle. (A production system would plug fastText/CLD3 in via
# mapInPandas; the heuristic is the engine-native fallback.)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}

TOKEN_REGEX = "[a-z0-9]+"
# BPE-ish pre-tokenizer: word pieces OR single non-space symbols.
# The whitespace is the EXPLICIT class, not \s: Java regex counts
# \x0B as \s, RE2/DuckDB does not — with \s the two engines would
# disagree on texts containing a vertical tab (the repo's standing
# portability rule, same as bpe.WS_CLASS / BoilerplateRemoval).
# NOTE on escaping: Spark SQL string literals treat backslash as an
# escape character, DuckDB's do not — so the Spark literal needs the
# backslash doubled while the DuckDB oracle uses the raw form.
BPE_ISH_REGEX = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \\t\\r\\n\\f\\x0B]"
BPE_ISH_REGEX_SPARK_SQL = BPE_ISH_REGEX.replace("\\", "\\\\")


class TextAnalysis:
    @staticmethod
    def token_stats(documents: DataFrame) -> DataFrame:
        """Per-document token statistics: whitespace tokens, regex
        (BPE-ish) tokens, distinct tokens, mean token length."""
        toks = F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")
        return documents.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            F.size(toks).cast("long").alias("n_tokens_ws"),
            F.expr(f"CAST(regexp_count(lower(text), '{TOKEN_REGEX}') AS BIGINT)").alias(
                "n_tokens_word"
            ),
            F.expr(
                f"CAST(regexp_count(text, '{BPE_ISH_REGEX_SPARK_SQL}') AS BIGINT)"
            ).alias("n_tokens_bpe"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
            rnd(
                F.length(F.regexp_replace(F.col("text"), "[ \\t\\r\\n\\f\\x0B]+", ""))
                / F.size(toks),
                6,
            ).alias("mean_token_len"),
        )

    @staticmethod
    def quality_score(documents: DataFrame) -> DataFrame:
        """Heuristic quality signals: stopword ratio, alpha ratio,
        punctuation ratio, plus a blended 0-1 score. Deterministic
        formula, oracle-checkable."""
        toks = F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")
        n = F.size(toks).cast("double")
        stop_list = ",".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
        n_stop = F.expr(
            f"CAST(size(filter(split(lower(text), '[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+'),"
            f" t -> t IN ({stop_list}))) AS DOUBLE)"
        )
        n_alpha = F.expr(
            "CAST(size(filter(split(lower(text), '[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+'),"
            " t -> t rlike '^[a-z]+$')) AS DOUBLE)"
        )
        punct = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 \\t\\r\\n\\f\\x0B]", "")).cast(
            "double"
        )
        stop_ratio = n_stop / n
        alpha_ratio = n_alpha / n
        punct_ratio = punct / F.length("text").cast("double")
        len_score = F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
        score = (
            0.3 * alpha_ratio
            + 0.3 * len_score
            + 0.2 * stop_ratio
            + 0.2 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        )
        return documents.select(
            "doc_id",
            rnd(stop_ratio, 6).alias("stopword_ratio"),
            rnd(alpha_ratio, 6).alias("alpha_ratio"),
            rnd(punct_ratio, 6).alias("punct_ratio"),
            rnd(score, 6).alias("quality_score"),
        )

    @staticmethod
    def lang_id(documents: DataFrame) -> DataFrame:
        """Stopword-hit language ID: for each language, count tokens in
        its stopword list; argmax with deterministic tiebreak (language
        code ascending); 'und' when nothing hits."""
        scores = []
        for lang, words in sorted(LANG_STOPWORDS.items()):
            lst = ",".join(f"'{w}'" for w in words)
            scores.append(
                F.expr(
                    f"size(filter(split(lower(text), '[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+'), t -> t IN ({lst})))"
                ).alias(f"hits_{lang}")
            )
        scored = documents.select("doc_id", "lang", *scores)
        langs = sorted(LANG_STOPWORDS)
        best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
        pred = F.lit("und")
        for lang in reversed(langs):  # earliest alphabetical wins ties
            pred = F.when(
                (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
            ).otherwise(pred)
        return scored.select(
            "doc_id",
            F.col("lang").alias("declared_lang"),
            pred.alias("predicted_lang"),
            *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}") for lang in langs],
        )

    @staticmethod
    def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
        """Per-document top-k terms by tf·idf (tf = in-doc count,
        idf = ln(N/df)), rank ties broken by term ascending. The rank
        is computed over the ROUNDED score so both engines order
        identically even when mathematically-equal scores arrive via
        different ln() call trees. Plan: explode -> two hash aggregates
        (term counts per doc; doc frequency per term) -> window top-k
        per doc. N is a driver-collected scalar (one column-pruned
        count job — the repo's documented driver-scalar pattern, fine
        at any scale). The df relation is |vocabulary| rows — orders of
        magnitude smaller than the corpus — and the window partitions
        by doc_id, so nothing concentrates on one key at scale."""
        from pyspark.sql import Window

        toks = documents.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")).alias("term"),
        ).where(F.length("term") > 0)
        tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
        df = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
        n_docs = documents.count()
        scored = tf.join(df, "term").select(
            "doc_id",
            "term",
            "tf",
            "df",
            rnd(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("tfidf"), F.asc("term")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "doc_id",
                F.col("rank").cast("int").alias("rank"),
                "term",
                F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"),
                "tfidf",
            )
        )

    @staticmethod
    def fingerprint(documents: DataFrame, shingle_size: int = 3) -> DataFrame:
        """Document fingerprint: min/max word-shingle hash (a 1-hash
        MinHash) — the cheap container for incremental dedup joins."""
        from sparker_spark.llm.shingles import shingle_hashes

        sh = shingle_hashes(documents, shingle_size)
        return sh.groupBy("doc_id").agg(
            F.min("h").alias("min_shingle_hash"),
            F.max("h").alias("max_shingle_hash"),
            F.count_distinct("h").alias("n_shingles"),
        )


class Collocations:
    @staticmethod
    def pmi_top(
        documents: DataFrame,
        min_pairs: int = 5,
        k: int = 20,
    ) -> DataFrame:
        """Top-k token collocations by document-level PMI:
        pmi(a,b) = ln(N·n_ab / (n_a·n_b)) over distinct-token doc
        co-occurrence, ties broken by (t1, t2). ``min_pairs`` floors
        the support so rare accidental pairs don't dominate.

        The within-doc token self-join is quadratic in DISTINCT tokens
        per document — fine for natural documents (hundreds of distinct
        tokens); for giant documents cap the per-doc token set first
        (e.g. tfidf_top_terms) or switch to windowed co-occurrence.
        N is a driver-scalar count (documented pattern)."""
        from sparker_spark.rounding import rnd

        toks = (
            documents.select(
                "doc_id",
                F.explode(F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")).alias("tok"),
            )
            .where(F.length("tok") > 0)
            .distinct()
        )
        n_docs = documents.count()
        a = toks.select("doc_id", F.col("tok").alias("t1"))
        b = toks.select("doc_id", F.col("tok").alias("t2"))
        pair_counts = (
            a.join(b, "doc_id")
            .where(F.col("t1") < F.col("t2"))
            .groupBy("t1", "t2")
            .agg(F.count("*").alias("n_ab"))
            .where(F.col("n_ab") >= int(min_pairs))
        )
        marg = toks.groupBy("tok").agg(F.count("*").alias("n"))
        scored = (
            pair_counts.join(
                marg.select(F.col("tok").alias("t1"), F.col("n").alias("n_a")), "t1"
            )
            .join(
                marg.select(F.col("tok").alias("t2"), F.col("n").alias("n_b")), "t2"
            )
            .select(
                "t1",
                "t2",
                F.col("n_ab").cast("long").alias("n_ab"),
                F.col("n_a").cast("long").alias("n_a"),
                F.col("n_b").cast("long").alias("n_b"),
                rnd(
                    F.log(
                        F.lit(float(n_docs))
                        * F.col("n_ab")
                        / (F.col("n_a") * F.col("n_b"))
                    ),
                    6,
                ).alias("pmi"),
            )
        )
        return scored.orderBy(
            F.desc("pmi"), F.asc("t1"), F.asc("t2")
        ).limit(int(k))


class Chunker:
    """Token-window document chunking for training-data pipelines:
    split each document into fixed-size whitespace-token windows with
    optional overlap — the preprocessing step between raw documents
    and tokenizer-ready training rows. Pure higher-order-function
    expressions (sequence + transform + slice + explode), no UDFs, so
    chunking parallelizes as a narrow map over document rows at any
    corpus size."""

    @staticmethod
    def chunk(
        documents,
        chunk_tokens: int = 64,
        overlap: int = 0,
        doc_col: str = "doc_id",
        text_col: str = "text",
    ):
        """(doc_id, chunk_idx, chunk_text, n_tokens): windows of
        ``chunk_tokens`` whitespace tokens starting every
        ``chunk_tokens - overlap`` tokens; the final window may be
        short. A window that would contain ONLY overlap tokens (its
        start past ``n - overlap``) is never emitted — the previous
        window already covers the document end, and emitting it would
        duplicate training text verbatim. Empty / whitespace-only
        documents produce no rows. Text is NOT normalized — chunk
        boundaries must not change the training text."""
        c, o = int(chunk_tokens), int(overlap)
        if c <= 0:
            raise ValueError("chunk_tokens must be positive")
        if not 0 <= o < c:
            raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
        stride = c - o
        expr = F.expr(
            f"CASE WHEN size(toks) >= 1 THEN "
            f"transform(sequence(1, greatest(size(toks) - {o}, 1), {stride}), "
            f" i -> struct(CAST((i - 1) DIV {stride} AS INT) AS chunk_idx, "
            f"            concat_ws(' ', slice(toks, i, {c})) AS chunk_text, "
            f"            CAST(size(slice(toks, i, {c})) AS INT) AS n_tokens)) "
            f"ELSE array() END"
        )
        return (
            documents.select(
                F.col(doc_col).alias("doc_id"),
                F.filter(
                    F.split(F.col(text_col), "[ \\t\\r\\n\\f\\x0B]+"), lambda x: x != ""
                ).alias("toks"),
            )
            .select("doc_id", F.explode(expr).alias("c"))
            .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
        )


class LanguageModelScore:
    """Corpus-unigram-LM document scoring — the simplest instance of
    the CCNet-style "score documents by LM log-likelihood, filter the
    tail" quality gate. The LM here is the corpus's own MLE unigram
    distribution (tf / total), so the whole scorer is two aggregates
    and a join — swap the per-token logprob relation for one exported
    by a real LM to keep the identical distributed plumbing."""

    @staticmethod
    def unigram_logprob(
        documents: DataFrame,
        doc_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(doc_id, n_tokens, avg_logprob): mean ln P(token) per
        document under the corpus unigram MLE. Per-token logprobs are
        rounded to 6 places and summed as DECIMAL(18,6) — the repo's
        cross-engine determinism rule for sums of irrational terms —
        then divided by the token count. The corpus total is one
        bounded driver scalar (same class as WEP's global threshold).
        Empty documents produce no row (no tokens, undefined mean)."""
        toks = (
            documents.select(
                F.col(doc_col).alias("doc_id"),
                F.explode(
                    F.split(F.lower(F.col(text_col)), "[^0-9a-z_]+")
                ).alias("tok"),
            )
            .where(F.length("tok") > 0)
        )
        total = toks.count()
        if total == 0:
            return toks.select(
                "doc_id",
                F.lit(0).cast("long").alias("n_tokens"),
                F.lit(0.0).alias("avg_logprob"),
            )
        lp = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("tf"))
            .select(
                "tok",
                rnd(F.log(F.col("tf") / F.lit(float(total))), 6)
                .cast("decimal(18,6)")
                .alias("lp"),
            )
        )
        return (
            toks.join(lp, "tok")
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias("n_tokens"),
                F.sum("lp").alias("sum_lp"),
            )
            .select(
                "doc_id",
                "n_tokens",
                rnd(
                    F.col("sum_lp").cast("double") / F.col("n_tokens"), 6
                ).alias("avg_logprob"),
            )
        )

    @staticmethod
    def _ngram_logprob(
        documents: DataFrame,
        n: int,
        doc_col: str,
        text_col: str,
        count_alias: str,
    ) -> DataFrame:
        """(doc_id, <count_alias>, avg_logprob): mean
        ln P(w_n | w_1..w_{n-1}) per document under the corpus
        order-n LM with add-one (Laplace) smoothing:

            P = (c(w_1..w_n) + 1) / (c(w_1..w_{n-1}) + V)

        with the CONTEXT count c(w_1..w_{n-1}) the sum of n-gram
        counts sharing the prefix and V the corpus vocabulary size
        (one bounded driver scalar, same class as the unigram total).
        Per-gram logprobs are rounded to 6 places and summed as
        DECIMAL(18,6) (the repo's cross-engine determinism rule for
        sums of irrational terms). Documents with fewer than n tokens
        produce no row (no n-grams, undefined mean). Plan: one explode
        + two hash aggregates + one join — keyed shuffles only, the
        SAME shape at every order; only the key width grows."""
        n = int(n)
        keys = [f"w{j + 1}" for j in range(n)]
        toks_arr = F.filter(
            F.split(F.lower(F.col(text_col)), "[^0-9a-z_]+"),
            lambda t: F.length(t) > 0,
        )
        fields = ", ".join(
            f"'{k}', element_at(t, i + {j})" for j, k in enumerate(keys)
        )
        grams = (
            documents.select(
                F.col(doc_col).alias("doc_id"), toks_arr.alias("t")
            )
            .where(F.size("t") >= n)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(t) - {n - 1}), "
                        f"i -> named_struct({fields}))"
                    )
                ).alias("p"),
            )
            .select("doc_id", *[F.col(f"p.{k}").alias(k) for k in keys])
        )
        vocab_size = (
            documents.select(
                F.explode(toks_arr).alias("tok")
            )
            .agg(F.countDistinct("tok"))
            .first()[0]
        )
        if not vocab_size:
            return grams.select(
                "doc_id",
                F.lit(0).cast("long").alias(count_alias),
                F.lit(0.0).alias("avg_logprob"),
            )
        gc_ = grams.groupBy(*keys).agg(F.count("*").alias("cg"))
        cc = gc_.groupBy(*keys[:-1]).agg(F.sum("cg").alias("c1"))
        lp = gc_.join(cc, keys[:-1]).select(
            *keys,
            rnd(
                F.log(
                    (F.col("cg") + F.lit(1.0))
                    / (F.col("c1") + F.lit(float(vocab_size)))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lp"),
        )
        return (
            grams.join(lp, keys)
            .groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias(count_alias),
                F.sum("lp").alias("s"),
            )
            .select(
                "doc_id",
                count_alias,
                rnd(
                    F.col("s").cast("double") / F.col(count_alias), 6
                ).alias("avg_logprob"),
            )
        )

    @staticmethod
    def bigram_logprob(
        documents: DataFrame,
        doc_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(doc_id, n_bigrams, avg_logprob): mean ln P(w2 | w1) per
        document under the corpus bigram LM with add-one smoothing —
        the next step up from :meth:`unigram_logprob` on the
        CCNet-style quality ladder; repetitive or word-salad documents
        separate far more sharply under a context model. See
        :meth:`_ngram_logprob` for the formula and plan."""
        return LanguageModelScore._ngram_logprob(
            documents, 2, doc_col, text_col, "n_bigrams"
        )

    @staticmethod
    def trigram_logprob(
        documents: DataFrame,
        doc_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(doc_id, n_trigrams, avg_logprob): mean ln P(w3 | w1 w2)
        per document under the corpus trigram LM with add-one
        smoothing — the published CCNet pipeline (Wenzek et al. 2020)
        scores with a 5-gram KenLM; order 3 is the closest faithful
        step this side of Kneser-Ney, and the wider context separates
        short degenerate documents (e.g. alternating two-word loops,
        which a bigram LM scores as PERFECTLY predictable) that
        surface stats and bigrams both miss. Documents with fewer
        than three tokens produce no row. Same plan shape and DECIMAL
        rounding discipline as :meth:`bigram_logprob`."""
        return LanguageModelScore._ngram_logprob(
            documents, 3, doc_col, text_col, "n_trigrams"
        )

    # fixed Jelinek-Mercer interpolation weight for the order-5 LM —
    # P_k = LAM * ML_k + (1 - LAM) * P_{k-1}; 0.5 is the classic
    # untuned JM setting (the engine has no held-out tuning loop)
    JM_LAMBDA = 0.5

    @staticmethod
    def interpolated_logprob(
        documents: DataFrame,
        n: int = 5,
        lam: float | None = None,
        doc_col: str = "doc_id",
        text_col: str = "text",
        count_alias: str = "n_grams",
        prune_min_count: int = 1,
        prune_from: int = 3,
    ) -> DataFrame:
        """(doc_id, <count_alias>, avg_logprob): mean ln P per scored
        position under the ORDER-n JELINEK-MERCER interpolated corpus
        LM — the KenLM-faithful step past plain Laplace (the published
        CCNet pipeline scores with a 5-gram KenLM; Wenzek et al. 2020):

            P_1(w)      = (c(w) + 1) / (T + V)          (Laplace base)
            P_k(w|ctx)  = lam * c_k(ctx,w)/c_k(ctx,*)
                          + (1 - lam) * P_{k-1}(w|shorter ctx)

        where c_k(ctx,*) sums k-gram counts over the (k-1)-word
        context — every scored position contributes to its own
        context count, so no denominator is ever zero and P_n > 0
        with no special cases. Positions are those with a FULL n-gram
        context (documents shorter than n tokens produce no row,
        matching :meth:`_ngram_logprob`); lower-order counts are
        taken over ALL their own positions (standard JM), not just
        inside n-gram windows.

        Plan: one index explode into a lag-column position relation
        (no window — the lags are array arithmetic inside the row),
        one count aggregate per order (n keyed aggregates over
        Heaps-bounded gram relations), context sums computed ON the
        count tables (model-sized, not corpus-sized), and n joins of
        the position relation against the per-order ML tables — all
        keyed shuffles, linear in the corpus; the 5-gram count table
        is the state whose growth the decade bounds. Per-position
        logprobs are rounded to 6 places and summed as DECIMAL(18,6)
        (the cross-engine determinism rule).

        ``prune_min_count`` / ``prune_from``: KenLM-style COUNT
        PRUNING, the mechanism real 5-gram pipelines use to bound
        model state (CCNet trains KenLM with singleton pruning at the
        high orders — the ``--prune 0 0 1`` shape). For orders
        ``k >= prune_from``, k-grams with count < ``prune_min_count``
        are REMOVED from the model AFTER estimation (context sums
        c_k(ctx,*) are computed on the unpruned counts, KenLM's rule,
        so surviving probabilities are unchanged); a scored position
        whose k-gram was pruned takes ML_k = 0 and backs off entirely
        to the (1-lam)-weighted lower orders — the stupid-backoff
        treatment (Brants et al. 2007), unnormalized by design, as is
        pruned KenLM itself. ``prune_min_count=1`` (default) keeps
        every gram and is plan-identical to the unpruned scorer;
        ``prune_min_count=2`` drops singletons, which on Heaps-law
        corpora removes the majority of the top-order table — the
        state the decade measurement bounds."""
        n = int(n)
        if n < 2:
            raise ValueError("interpolated_logprob needs n >= 2")
        prune_min_count = int(prune_min_count)
        prune_from = int(prune_from)
        if prune_min_count < 1:
            raise ValueError("prune_min_count must be >= 1")
        lam = float(
            LanguageModelScore.JM_LAMBDA if lam is None else lam
        )
        toks_arr = F.filter(
            F.split(F.lower(F.col(text_col)), "[^0-9a-z_]+"),
            lambda t: F.length(t) > 0,
        )
        # lag columns: w0 = token at position i, wj = token j back
        # (null within the first j positions of the document)
        fields = ", ".join(
            f"'w{j}', IF(i > {j}, element_at(t, i - {j}), NULL)"
            for j in range(n)
        )
        pos = (
            documents.select(
                F.col(doc_col).alias("doc_id"), toks_arr.alias("t")
            )
            .where(F.size("t") >= 1)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t)), "
                        f"i -> named_struct({fields}))"
                    )
                ).alias("p"),
            )
            .select(
                "doc_id",
                *[F.col(f"p.w{j}").alias(f"w{j}") for j in range(n)],
            )
        )
        # materialize the position relation ONCE (r12): every branch
        # below — the T/V scalars, the unigram table, one gram count
        # per order, and the scored-position base — re-derived the
        # split+lower+explode lineage from the source otherwise
        # (Spark has no automatic subplan reuse across shuffle
        # branches), charging ~n+2 corpus tokenization passes to one
        # scorer call. The checkpointed relation is (doc_id, n lag
        # strings) — the same bytes each branch needs anyway — and is
        # freed by GC, the repo's multi-consumer idiom.
        pos = pos.localCheckpoint(eager=True)
        scalars = pos.agg(
            F.count("*").cast("double").alias("T"),
            F.countDistinct("w0").cast("double").alias("V"),
        ).first()
        total, vocab = scalars["T"], scalars["V"]
        if not vocab:
            return pos.select(
                "doc_id",
                F.lit(0).cast("long").alias(count_alias),
                F.lit(0.0).alias("avg_logprob"),
            ).limit(0)
        # unigram Laplace table
        p1 = (
            pos.groupBy("w0")
            .agg(F.count("*").cast("double").alias("c"))
            .select(
                "w0",
                (
                    (F.col("c") + F.lit(1.0))
                    / F.lit(float(total) + float(vocab))
                ).alias("p1"),
            )
        )
        # per-order ML tables: (context..., w0) -> cg / cc where cc is
        # the context sum computed on the COUNT table (model-sized)
        ml_tabs = []
        for k in range(2, n + 1):
            cols = [f"w{j}" for j in range(k - 1, -1, -1)]  # wk-1..w0
            ctx_cols = cols[:-1]
            gk = (
                pos.where(F.col(f"w{k - 1}").isNotNull())
                .groupBy(*cols)
                .agg(F.count("*").cast("double").alias("cg"))
            )
            # context sums on the UNPRUNED counts (KenLM: estimate,
            # then remove — surviving probabilities are unchanged)
            ck = gk.groupBy(*ctx_cols).agg(F.sum("cg").alias("cc"))
            pruned = prune_min_count > 1 and k >= prune_from
            kept = (
                gk.where(F.col("cg") >= F.lit(float(prune_min_count)))
                if pruned
                else gk
            )
            ml_tabs.append(
                (
                    cols,
                    kept.join(ck, ctx_cols).select(
                        *cols,
                        (F.col("cg") / F.col("cc")).alias(f"ml{k}"),
                    ),
                    pruned,
                )
            )
        scored = pos.where(F.col(f"w{n - 1}").isNotNull()).join(
            p1, "w0"
        )
        for cols, tab, pruned in ml_tabs:
            # a pruned order loses rows from its ML table, so the
            # position join must keep the position (left) and read the
            # missing ML as 0 — the unpruned path stays an inner join
            # (every position's gram is in its own count table)
            scored = scored.join(tab, cols, "left" if pruned else "inner")
        p = F.col("p1")
        for k, (_, _, pruned) in zip(range(2, n + 1), ml_tabs):
            mlk = (
                F.coalesce(F.col(f"ml{k}"), F.lit(0.0))
                if pruned
                else F.col(f"ml{k}")
            )
            p = F.lit(lam) * mlk + F.lit(1.0 - lam) * p
        scored = scored.select(
            "doc_id",
            rnd(F.log(p), 6).cast("decimal(18,6)").alias("lp"),
        )
        return (
            scored.groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias(count_alias),
                F.sum("lp").alias("s"),
            )
            .select(
                "doc_id",
                count_alias,
                rnd(
                    F.col("s").cast("double") / F.col(count_alias), 6
                ).alias("avg_logprob"),
            )
        )

    @staticmethod
    def kneser_ney_logprob(
        documents: DataFrame,
        n: int = 5,
        doc_col: str = "doc_id",
        text_col: str = "text",
        count_alias: str = "n_grams",
    ) -> DataFrame:
        """(doc_id, <count_alias>, avg_logprob): mean ln P per scored
        position under the ORDER-n INTERPOLATED KNESER-NEY corpus LM —
        the smoothing KenLM actually estimates (Heafield 2011 trains
        interpolated modified KN; this is the Chen & Goodman 1999
        one-discount-per-order interpolated variant, the last fidelity
        step past the Jelinek-Mercer scorer):

            P_0          = 1 / V                          (uniform)
            P_1(w)       = max(c'(w) - D_1, 0) / T'
                           + (D_1 * N_1 / T') * P_0
            P_k(w|ctx)   = max(a_k(ctx,w) - D_k, 0) / den_k(ctx)
                           + (D_k * nt_k(ctx) / den_k(ctx))
                             * P_{k-1}(w|shorter ctx)

        where a_k is the RAW k-gram count at the top order and the
        CONTINUATION count (distinct preceding-word types, computed
        off the (k+1)-gram type table) at every lower order — the KN
        insight: a word's backoff mass reflects how many contexts it
        continues, not how often it occurs. den_k(ctx) sums a_k over
        the context; nt_k(ctx) counts the distinct continuations the
        discount was taken from, so each P_k sums to 1 over w exactly.
        D_k is the Ney absolute discount n1/(n1 + 2*n2) from the
        counts-of-counts of a_k (0.5 when an order has no mass at
        counts 1-2 — degenerate micro-corpora only). T' = total
        bigram-type count, N_1 = distinct continuing unigrams, V =
        vocabulary size.

        Positions scored are those with a FULL n-gram context
        (documents shorter than n tokens produce no row), matching
        :meth:`interpolated_logprob`; every joined statistic exists
        for a scored position (the position's own grams contribute to
        each table), so all joins stay INNER — no OOV holes, P > 0.

        Plan: the same lag-column position relation, one RAW count
        aggregate per order 2..n (g_k, Heaps-bounded), continuation /
        denominator / type tables derived from g_{k+1} BY AGGREGATING
        THE COUNT TABLE (model-sized, never the corpus), n-1 keyed
        joins of positions against the per-order tables, and 2n
        bounded driver scalars (V, T', counts-of-counts). Per-position
        logprobs rounded to 6 places and summed as DECIMAL(18,6) —
        the cross-engine determinism rule."""
        n = int(n)
        if n < 2:
            raise ValueError("kneser_ney_logprob needs n >= 2")
        toks_arr = F.filter(
            F.split(F.lower(F.col(text_col)), "[^0-9a-z_]+"),
            lambda t: F.length(t) > 0,
        )
        fields = ", ".join(
            f"'w{j}', IF(i > {j}, element_at(t, i - {j}), NULL)"
            for j in range(n)
        )
        pos = (
            documents.select(
                F.col(doc_col).alias("doc_id"), toks_arr.alias("t")
            )
            .where(F.size("t") >= 1)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t)), "
                        f"i -> named_struct({fields}))"
                    )
                ).alias("p"),
            )
            .select(
                "doc_id",
                *[F.col(f"p.w{j}").alias(f"w{j}") for j in range(n)],
            )
        )
        # materialize the position relation ONCE (r12) — the g_k
        # count tables (one per order), the vocab scalar, and the
        # scored-position base each re-derived the tokenize+explode
        # lineage otherwise, and the 2n driver-scalar actions below
        # (discounts, unigram totals) re-ran it per action through
        # the uncached lower-order g_k. See interpolated_logprob.
        pos = pos.localCheckpoint(eager=True)
        # raw k-gram TYPE/count tables g_k (k = 2..n); g_k is both the
        # top-order count source (k = n) and the continuation-type
        # source for order k-1. Cached: each feeds 3-4 model-sized
        # aggregates below.
        g: dict[int, DataFrame] = {}
        for k in range(2, n + 1):
            cols = [f"w{j}" for j in range(k - 1, -1, -1)]
            g[k] = (
                pos.where(F.col(f"w{k - 1}").isNotNull())
                .groupBy(*cols)
                .agg(F.count("*").cast("double").alias("cg"))
            )
            if k == n:
                # g[n] feeds both adj[n] and adj[n-1]; lower g[k]
                # each feed exactly one adj table and need no cache
                g[k].cache()
        # adjusted-count tables per order: (gram cols) -> a (the count
        # the discount applies to), plus per-context den / ntypes
        adj: dict[int, DataFrame] = {}
        for k in range(1, n + 1):
            if k == n:
                adj[k] = g[n].select(
                    *[f"w{j}" for j in range(n - 1, -1, -1)],
                    F.col("cg").alias("a"),
                )
            else:
                # continuation count off the (k+1)-gram TYPE table:
                # group out the leading history word
                cols = [f"w{j}" for j in range(k - 1, -1, -1)]
                adj[k] = (
                    g[k + 1]
                    .groupBy(*cols)
                    .agg(F.count("*").cast("double").alias("a"))
                )
            adj[k].cache()
        # ALL bounded driver scalars in ONE action (r12): the vocab
        # count, the n per-order counts-of-counts behind the Ney
        # discounts, and the unigram totals were n + 2 sequential
        # collect jobs; unioned into a single (n + 1)-row relation
        # they run as one job whose legs execute concurrently (and
        # materialize the adj[k] caches as a side effect). The values
        # collected — and so the discounts and every score — are
        # identical.
        legs = [
            pos.agg(F.countDistinct("w0").cast("double").alias("n1"))
            .select(
                F.lit(0).alias("k"),
                "n1",
                F.lit(0.0).alias("n2"),
                F.lit(0.0).alias("tp"),
                F.lit(0.0).alias("n1t"),
            )
        ]
        for k in range(1, n + 1):
            legs.append(
                adj[k]
                .agg(
                    F.sum((F.col("a") == 1.0).cast("long"))
                    .cast("double")
                    .alias("n1"),
                    F.sum((F.col("a") == 2.0).cast("long"))
                    .cast("double")
                    .alias("n2"),
                    F.sum("a").alias("tp"),
                    F.count("*").cast("double").alias("n1t"),
                )
                .select(F.lit(k).alias("k"), "n1", "n2", "tp", "n1t")
            )
        u = legs[0]
        for leg in legs[1:]:
            u = u.unionByName(leg)
        stats = {r["k"]: r for r in u.collect()}
        vocab = stats[0]["n1"]
        if not vocab:
            return pos.select(
                "doc_id",
                F.lit(0).cast("long").alias(count_alias),
                F.lit(0.0).alias("avg_logprob"),
            ).limit(0)
        D: dict[int, float] = {}
        for k in range(1, n + 1):
            n1 = float(stats[k]["n1"] or 0)
            n2 = float(stats[k]["n2"] or 0)
            D[k] = n1 / (n1 + 2.0 * n2) if (n1 + 2.0 * n2) > 0 else 0.5
        # unigram scalars: T' = total bigram types, N_1 = distinct
        # continuing unigrams (rows of adj[1])
        t_prime = float(stats[1]["tp"] or 0)
        n1_types = float(stats[1]["n1t"] or 0)
        scored = pos.where(F.col(f"w{n - 1}").isNotNull())
        # per-order context tables for k >= 2: den (sum of a) and
        # ntypes (rows) per context, computed ON adj[k] (model-sized).
        # The context stats are PRE-JOINED into the gram table (one
        # model-sized join per order, same keys) so the corpus-sized
        # position relation is joined ONCE per order instead of twice
        # (r13, guide §2.3/§2.4: 2(n-1)+1 = 9 position-relation joins
        # -> n = 5; identical inner-join matching — adj[k] holds
        # exactly one row per gram, ctx one per context — so every
        # a/den/nt value each position reads is unchanged).
        for k in range(2, n + 1):
            cols = [f"w{j}" for j in range(k - 1, -1, -1)]
            ctx_cols = cols[:-1]
            ctx = adj[k].groupBy(*ctx_cols).agg(
                F.sum("a").alias(f"den{k}"),
                F.count("*").cast("double").alias(f"nt{k}"),
            )
            tab = adj[k].select(
                *cols, F.col("a").alias(f"a{k}")
            ).join(ctx, ctx_cols)
            scored = scored.join(tab, cols)
        scored = scored.join(
            adj[1].select("w0", F.col("a").alias("a1")), "w0"
        )
        p = (
            F.greatest(F.col("a1") - F.lit(D[1]), F.lit(0.0))
            / F.lit(t_prime)
            + (F.lit(D[1] * n1_types) / F.lit(t_prime))
            * (F.lit(1.0) / F.lit(float(vocab)))
        )
        for k in range(2, n + 1):
            p = (
                F.greatest(F.col(f"a{k}") - F.lit(D[k]), F.lit(0.0))
                / F.col(f"den{k}")
                + (F.lit(D[k]) * F.col(f"nt{k}") / F.col(f"den{k}")) * p
            )
        scored = scored.select(
            "doc_id",
            rnd(F.log(p), 6).cast("decimal(18,6)").alias("lp"),
        )
        return (
            scored.groupBy("doc_id")
            .agg(
                F.count("*").cast("long").alias(count_alias),
                F.sum("lp").alias("s"),
            )
            .select(
                "doc_id",
                count_alias,
                rnd(
                    F.col("s").cast("double") / F.col(count_alias), 6
                ).alias("avg_logprob"),
            )
        )
