"""Round-3d registry: corpus-curation queries — benchmark
decontamination, repetition quality statistics, vocabulary build —
with their DuckDB oracles.

These extend the training-data-pipeline surface (SURVEY §7.1 M8)
with the document-level checks a pretraining pipeline runs before
tokenization; the reference has no counterpart (its surface stops at
ER), so the oracle SQL below is the ground truth definition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparker_spark.llm.curation import Decontamination, RepetitionStats
from sparker_spark.llm.hashing import DUCK_HASH60
from sparker_spark.llm.sampling import Sampling

DECON_N = 5  # word-n-gram size for the overlap check (13 in prod; 5
# keeps the synthetic docs' near-dup overlaps visible at test SF)
DECON_SEED = 7
DECON_WEIGHTS = {"train": 0.9, "eval": 0.1}
VOCAB_K = 100


# --- decontaminate: train/eval split + n-gram overlap flags ---------


def _load_docs(spark, sf_dir):
    from sparker_spark.entry import load

    return load(spark, sf_dir, "documents")


def q_decontaminate(spark, sf_dir):
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    sp = Sampling.split(docs, "doc_id", DECON_WEIGHTS, seed=DECON_SEED)
    train = sp.where("split = 'train'").drop("split")
    ev = sp.where("split = 'eval'").drop("split")
    return Decontamination.overlap_ngrams(train, ev, DECON_N)


def _duck_ngram_cte(name: str, src_where: str, n: int) -> str:
    """DISTINCT word-n-gram 60-bit hashes per doc from the split CTE
    ``sp`` — mirrors llm/shingles.shingle_hashes for arbitrary n."""
    return f"""{name}_toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+') AS t
  FROM sp WHERE {src_where}),
{name} AS (
  SELECT doc_id, {DUCK_HASH60.format(x='s')} AS h
  FROM (SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(CASE WHEN len(t) >= {n}
                            THEN list_transform(range(1, len(t) - {n - 2}),
                                                i -> array_to_string(t[i:i+{n - 1}], ' '))
                            ELSE []::VARCHAR[] END) AS s
              FROM {name}_toks)))"""


def _o_decontaminate() -> str:
    split_case = Sampling.split_case_sql(
        "doc_id", DECON_WEIGHTS, seed=DECON_SEED, dialect="duck"
    )
    return f"""
WITH sp AS (SELECT doc_id, text, {split_case} AS split FROM documents),
{_duck_ngram_cte("tr_sh", "split = 'train'", DECON_N)},
{_duck_ngram_cte("ev_sh", "split = 'eval'", DECON_N)},
ev AS (SELECT DISTINCT h FROM ev_sh),
agg AS (
  SELECT t.doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN ev.h IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
  FROM tr_sh t LEFT JOIN ev ON t.h = ev.h
  GROUP BY 1)
SELECT d.doc_id,
       CAST(COALESCE(n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap_ngrams,
       COALESCE(n_overlap, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM sp WHERE split = 'train') d
LEFT JOIN agg ON d.doc_id = agg.doc_id"""


# --- text_repetition: Gopher-style repetition quality stats ---------


def q_text_repetition(spark, sf_dir):
    docs = _load_docs(spark, sf_dir).select("doc_id", "text")
    lines = RepetitionStats.line_stats(docs)
    grams = RepetitionStats.ngram_stats(docs, 2).withColumnRenamed(
        "n_ngrams", "n_bigrams"
    )
    return lines.join(grams, "doc_id")


O_TEXT_REPETITION = """
WITH lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
  WHERE trim(l) <> ''),
per_line AS (SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY 1, 2),
lagg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) AS dup_lines,
         CAST(sum(len(line) * cnt) AS DOUBLE) AS line_chars,
         CAST(sum(CASE WHEN cnt > 1 THEN len(line) * cnt ELSE 0 END) AS DOUBLE)
           AS dup_chars
  FROM per_line GROUP BY 1),
toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+') AS t
         FROM documents),
grams AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= 2
                THEN list_transform(range(1, len(t)),
                                    i -> array_to_string(t[i:i+1], ' '))
                ELSE []::VARCHAR[] END) AS gram
  FROM toks),
per_gram AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
gagg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         CAST(max(cnt) AS DOUBLE) AS max_cnt,
         CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) AS dup_cnt
  FROM per_gram GROUP BY 1)
SELECT d.doc_id,
       COALESCE(n_lines, 0) AS n_lines,
       round(CASE WHEN COALESCE(n_lines, 0) > 0
             THEN dup_lines / n_lines ELSE 0e0 END, 6) AS dup_line_frac,
       round(CASE WHEN COALESCE(line_chars, 0e0) > 0
             THEN dup_chars / line_chars ELSE 0e0 END, 6) AS dup_line_char_frac,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       round(CASE WHEN COALESCE(n_bigrams, 0) > 0
             THEN max_cnt / n_bigrams ELSE 0e0 END, 6) AS top_ngram_frac,
       round(CASE WHEN COALESCE(n_bigrams, 0) > 0
             THEN dup_cnt / n_bigrams ELSE 0e0 END, 6) AS dup_ngram_frac
FROM documents d
LEFT JOIN lagg ON d.doc_id = lagg.doc_id
LEFT JOIN gagg ON d.doc_id = gagg.doc_id"""


# --- vocab_topk: corpus-wide token vocabulary ----------------------


def q_vocab_topk(spark, sf_dir):
    """Top-K corpus vocabulary with counts — the tokenizer-training
    precursor. Hash aggregate + TakeOrderedAndProject: the per-token
    partial counts combine map-side, so the shuffle carries one row
    per distinct token per partition regardless of corpus size, and
    the global top-K never materializes the full sorted vocabulary."""
    docs = _load_docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")).alias("tok")
    ).where("tok <> ''")
    return (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_K)
    )


O_VOCAB_TOPK = f"""
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+')) AS tok
      FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT {VOCAB_K}"""


# --- events_json_stats: semi-structured JSON property extraction ---


def q_events_json_stats(spark, sf_dir):
    """Per-event-type stats over a JSON property column: the
    semi-structured path (`props` VARCHAR holding JSON) handled with
    get_json_object — extraction happens inside whole-stage codegen
    during the scan, then one hash aggregate. At scale the JSON parse
    is the per-row cost; nothing here shuffles more than the
    (event_type)-keyed partials."""
    from sparker_spark.entry import _load_events
    from sparker_spark.rounding import rnd

    ev = _load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
    return ev.select("event_type", k.alias("k"), "value").groupBy(
        "event_type"
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        rnd(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
        rnd(dec_sum, 4).alias("sum_value"),
    )


O_EVENTS_JSON_STATS = """
WITH e AS (
  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k, value FROM events)
SELECT event_type,
       count(*) AS n_events,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS avg_k,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value
FROM e GROUP BY 1"""


# --- corpus_mix: per-source data-mixture report ---------------------


def q_corpus_mix(spark, sf_dir):
    """Per-source corpus composition — the data-mixture report a
    pretraining run is configured from: document/char/token volume,
    language spread, and mean quality per source. Mean quality sums
    the (already 6-decimal) per-doc scores in DECIMAL so the
    aggregate is exact and engine/partition-order independent."""
    from sparker_spark.llm.text import TextAnalysis
    from sparker_spark.rounding import rnd

    docs = _load_docs(spark, sf_dir)
    q = TextAnalysis.quality_score(docs).select("doc_id", "quality_score")
    toks = F.size(F.split(F.lower(F.col("text")), "[ \\t\\r\\n\\f\\x0B]+")).cast("long")
    return (
        docs.select("doc_id", "source", "lang", "n_chars", toks.alias("n_toks"))
        .join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_toks").alias("total_tokens_ws"),
            F.count_distinct("lang").alias("n_langs"),
            rnd(
                F.sum(F.col("quality_score").cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_quality"),
        )
    )


def _o_corpus_mix() -> str:
    from sparker_spark.entry import _o_text_quality

    return f"""
WITH q AS ({_o_text_quality()})
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+'))) AS BIGINT)
         AS total_tokens_ws,
       count(DISTINCT lang) AS n_langs,
       round(CAST(sum(CAST(quality_score AS DECIMAL(28,6))) AS DOUBLE)
             / count(*), 6) AS mean_quality
FROM documents d JOIN q USING (doc_id)
GROUP BY source"""


# --- embedding_bucket_purity: SRP-bucket label coherence ------------

PURITY_BITS = 12  # 2^12 cells over ~5000 vectors keeps buckets non-trivial
PURITY_SEED = 1234


def q_embedding_bucket_purity(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.llm.similarity import EmbeddingDiagnostics

    emb = load(spark, sf_dir, "embeddings")
    return EmbeddingDiagnostics.srp_bucket_purity(
        emb, bits=PURITY_BITS, seed=PURITY_SEED
    )


def _o_embedding_bucket_purity(dim: int = 64) -> str:
    from sparker_spark.llm.dedup import Dedup

    planes = Dedup.srp_hyperplanes(dim, PURITY_BITS, PURITY_SEED)
    bit_exprs = ", ".join(
        "CASE WHEN list_dot_product(emb, [%s]::DOUBLE[]) >= 0 THEN 1 ELSE 0 END"
        % ", ".join(repr(x) for x in planes[j])
        for j in range(PURITY_BITS)
    )
    return f"""
WITH v AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
sig AS (SELECT label, concat_ws('_', {bit_exprs}) AS bucket FROM v),
per_label AS (SELECT bucket, label, count(*) AS n FROM sig GROUP BY 1, 2)
SELECT bucket,
       CAST(sum(n) AS BIGINT) AS n_vecs,
       count(*) AS n_labels,
       CAST(max(n) AS BIGINT) AS majority_n,
       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS purity
FROM per_label GROUP BY bucket"""


def r3d_queries() -> dict:
    return {
        "decontaminate": q_decontaminate,
        "text_repetition": q_text_repetition,
        "vocab_topk": q_vocab_topk,
        "events_json_stats": q_events_json_stats,
        "corpus_mix": q_corpus_mix,
        "embedding_bucket_purity": q_embedding_bucket_purity,
    }


def r3d_oracles() -> dict:
    return {
        "decontaminate": _o_decontaminate(),
        "text_repetition": O_TEXT_REPETITION,
        "vocab_topk": O_VOCAB_TOPK,
        "events_json_stats": O_EVENTS_JSON_STATS,
        "corpus_mix": _o_corpus_mix(),
        "embedding_bucket_purity": _o_embedding_bucket_purity(),
    }
