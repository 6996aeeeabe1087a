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
  SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
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
toks AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
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
        F.explode(F.split(F.lower(F.col("text")), "\\s+")).alias("tok")
    ).where("tok <> ''")
    return (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_K)
    )


O_VOCAB_TOPK = f"""
SELECT tok, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents)
WHERE tok <> ''
GROUP BY tok
ORDER BY cnt DESC, tok ASC
LIMIT {VOCAB_K}"""


def r3d_queries() -> dict:
    return {
        "decontaminate": q_decontaminate,
        "text_repetition": q_text_repetition,
        "vocab_topk": q_vocab_topk,
    }


def r3d_oracles() -> dict:
    return {
        "decontaminate": _o_decontaminate(),
        "text_repetition": O_TEXT_REPETITION,
        "vocab_topk": O_VOCAB_TOPK,
    }
