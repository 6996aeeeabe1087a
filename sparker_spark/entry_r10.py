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




# ------------------------------- char-offset-faithful span removal
def q_dedup_span_removal_chars(spark, sf_dir):
    """remove_spans_chars under the VALUE-HASH gate: the detected
    duplicated spans (same SPAN_K/SPAN_MIN_OCC relation the r9b span
    gates pin) cut at CHAR granularity — every byte outside the
    removed intervals preserved verbatim, and the intervals
    themselves value-checked (rendered "start-end,start-end" because
    the driver's hash stringifies arrays engine-dependently). The
    oracle reconstructs clean_text INDEPENDENTLY, by substring
    arithmetic over the original text and the interval set."""
    from sparker_spark.entry import _parallelize_scan, load
    from sparker_spark.entry_r9b import SPAN_K, SPAN_MIN_OCC
    from sparker_spark.llm.spans import duplicated_spans, remove_spans_chars

    docs = _parallelize_scan(load(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    spans = duplicated_spans(
        docs, shingle_size=SPAN_K, min_occurrences=SPAN_MIN_OCC
    )
    out = remove_spans_chars(docs, spans)
    return out.select(
        "doc_id",
        "clean_text",
        F.concat_ws(
            ",",
            F.transform(
                "removed_intervals",
                lambda s: F.concat_ws(
                    "-",
                    s["start"].cast("string"),
                    s["end"].cast("string"),
                ),
            ),
        ).alias("intervals"),
        "n_kept",
        "n_removed",
    )


def _o_dedup_span_removal_chars() -> str:
    from sparker_spark.entry_r9b import O_SPANS_CTE

    ws = "[ \\t\\r\\n\\f\\x0B]+"
    # words + the whitespace run AFTER each word; char offsets from a
    # running sum; islands over consecutive removed positions; then
    # clean_text REBUILT BY SUBSTRING ARITHMETIC over the original
    # text (independent of the engine's emit-string construction)
    return f"""
WITH {O_SPANS_CTE},
rem AS (SELECT DISTINCT doc_id,
               CAST(unnest(range(span_start, span_end + 1)) AS BIGINT) AS pos
        FROM spans),
base AS (SELECT doc_id, text,
                regexp_split_to_array(text, '{ws}') AS w,
                regexp_extract_all(text, '{ws}', 0) AS d
         FROM documents),
wp AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS word,
              coalesce(d[i], '') AS delim
       FROM base, LATERAL unnest(range(1, len(w) + 1)) u(i)),
off AS (SELECT doc_id, pos, word, delim,
               1 + coalesce(sum(len(word) + len(delim)) OVER (
                     PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS char_start
        FROM wp),
mk AS (SELECT o.doc_id, o.pos, o.char_start,
              o.char_start + len(o.word) - 1 AS word_end,
              r.pos IS NOT NULL AS removed
       FROM off o LEFT JOIN rem r
         ON o.doc_id = r.doc_id AND o.pos = r.pos),
cisl AS (SELECT doc_id, pos, char_start, word_end,
               CASE WHEN pos > coalesce(max(pos) OVER (
                      PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1) + 1 THEN 1 ELSE 0 END AS new_island
        FROM mk WHERE removed),
cisl2 AS (SELECT doc_id, char_start, word_end,
                sum(new_island) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS island
         FROM cisl),
iv AS (SELECT doc_id, CAST(min(char_start) AS BIGINT) AS s,
              CAST(max(word_end) AS BIGINT) AS e
       FROM cisl2 GROUP BY doc_id, island),
-- surviving chunks by SUBSTRING arithmetic: the text between the
-- previous interval's end and this interval's start, plus the tail
-- after the last interval
chunks AS (
  SELECT doc_id, s AS ord,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
           AS c_from,
         s - 1 AS c_to
  FROM iv
  UNION ALL
  SELECT b.doc_id,
         CAST(len(b.text) + 1 AS BIGINT) AS ord,
         coalesce((SELECT max(e) FROM iv WHERE iv.doc_id = b.doc_id), 0)
           + 1 AS c_from,
         CAST(len(b.text) AS BIGINT) AS c_to
  FROM base b),
clean AS (
  SELECT c.doc_id,
         string_agg(substr(b.text, CAST(c.c_from AS INTEGER),
                           CAST(greatest(0, c.c_to - c.c_from + 1)
                                AS INTEGER)),
                    '' ORDER BY c.ord) AS clean_text
  FROM chunks c JOIN base b USING (doc_id)
  GROUP BY c.doc_id),
ivstr AS (SELECT doc_id,
                 string_agg(s || '-' || e, ',' ORDER BY s) AS intervals
          FROM iv GROUP BY doc_id),
cnt AS (SELECT doc_id,
               CAST(sum(CASE WHEN removed THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_kept,
               CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_removed
        FROM mk GROUP BY doc_id)
SELECT b.doc_id,
       coalesce(cl.clean_text, b.text) AS clean_text,
       coalesce(iv2.intervals, '') AS intervals,
       cnt.n_kept, cnt.n_removed
FROM base b
JOIN cnt USING (doc_id)
LEFT JOIN clean cl ON b.doc_id = cl.doc_id
LEFT JOIN ivstr iv2 ON b.doc_id = iv2.doc_id"""




# -------------------------------------- DSIR -> mix -> curate -> pack
DSIRP_BUDGET = 20_000
DSIRP_SEED = 13


def q_pipeline_dsir_pretrain_e2e(spark, sf_dir):
    """The full data-SELECTION story end-to-end under one VALUE-HASH
    gate (round-10 ask #7): DSIR per-source affinity (gated
    dsir_source_report) -> softmax bridge weights (gated
    dsir_mix_weights) -> token-budget mix sample (the gated
    sample_to_budget machinery) -> quality floor -> exact dedup ->
    sequence packing — the composition a pretraining run executes
    between "here are 20 raw sources" and "here are the training
    sequences", pinned the way pipeline_pretrain_shards_e2e pins the
    packing tail.

    The bridge weights are quantized to integers (×1e6) before
    entering the mix: the plan normalizes by the weight SUM, and a
    float sum's value depends on accumulation order (Python dict sum
    vs SQL SUM) — integer sums are order-free, so both engines reach
    bit-identical rates."""
    from sparker_spark.entry import _parallelize_scan, load
    from sparker_spark.entry_r8 import PACK8_LEN, PACK8_SEP
    from sparker_spark.entry_r9b import DSIR_B, DSIR_MIX_T, DSIR_TARGET
    from sparker_spark.llm.mixing import MixPlanner
    from sparker_spark.llm.selection import (
        mix_weights_from_affinity,
        source_report,
    )
    from sparker_spark.pretrain import prepare_training_data

    docs = _parallelize_scan(load(spark, sf_dir, "documents"))
    rep = source_report(docs, DSIR_TARGET, buckets=DSIR_B)
    wdf = mix_weights_from_affinity(rep, temperature=DSIR_MIX_T)
    weights = {
        r["source"]: int(round(r["weight"] * 1_000_000))
        for r in wdf.collect()
    }
    sampled = MixPlanner.sample_to_budget(
        docs, weights, DSIRP_BUDGET, seed=DSIRP_SEED
    )
    selected = docs.join(sampled.select("doc_id"), "doc_id").select(
        "doc_id", "text"
    )
    return prepare_training_data(
        selected,
        seq_len=PACK8_LEN,
        sep_tokens=PACK8_SEP,
        redact=False,
        min_quality=0.3,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
    )


def _o_pipeline_dsir_pretrain() -> str:
    from sparker_spark.entry import _o_text_quality
    from sparker_spark.entry_r8 import (
        PACK8_LEN,
        PACK8_SEP,
        _WS_N_SQL,
        _WS_TOKS_SQL,
        _WSX_N_SQL,
        _plan_ctes,
        _texts_select,
    )
    from sparker_spark.entry_r9b import DSIR_MIX_T, O_DSIR_SOURCE_REPORT
    from sparker_spark.llm.sampling import _coord_sql

    coord = _coord_sql("d.doc_id", DSIRP_SEED, "duck")
    b = f"CAST({DSIRP_BUDGET} AS DOUBLE)"
    wn = "(CAST(wi.iw AS DOUBLE) / CAST((SELECT sum(iw) FROM wi) AS DOUBLE))"
    return f"""
WITH rep AS (SELECT * FROM ({O_DSIR_SOURCE_REPORT.strip()})),
terms AS (SELECT source,
          CAST(round(exp(mean_logweight / {DSIR_MIX_T}), 6)
               AS DECIMAL(18,6)) AS w
          FROM rep),
wts AS (SELECT source,
        round(CAST(w AS DOUBLE)
              / CAST((SELECT sum(w) FROM terms) AS DOUBLE), 6) AS weight
        FROM terms),
wi AS (SELECT source, CAST(round(weight * 1000000) AS BIGINT) AS iw
       FROM wts),
nn AS (SELECT doc_id, source, CAST({_WSX_N_SQL} AS BIGINT) AS n
       FROM documents),
tt AS (SELECT source, CAST(sum(n) AS BIGINT) AS available_tokens
       FROM nn GROUP BY source),
rr AS (SELECT tt.source,
         CASE WHEN tt.available_tokens > 0 AND {b} * {wn} > 0
              THEN least(1.0, ({b} * {wn}) / tt.available_tokens)
              ELSE 0.0 END AS rate
       FROM tt JOIN wi USING (source)),
sel AS (SELECT d.doc_id, d.text
        FROM documents d
        JOIN nn ON d.doc_id = nn.doc_id
        JOIN rr ON nn.source = rr.source
        WHERE {coord} < rr.rate),
q AS (SELECT doc_id, quality_score FROM ({_o_text_quality().strip()})),
qs AS (SELECT s.doc_id, s.text
       FROM sel s JOIN q USING (doc_id)
       WHERE q.quality_score >= 0.3),
surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           doc_id = min(doc_id) OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text),
                                    '[ \\t\\r\\n\\f\\x0B]+', ' ', 'g')))
           ) AS canon
    FROM qs)
  WHERE canon),
{_plan_ctes('surv', _WS_N_SQL, PACK8_LEN, PACK8_SEP)},
{_texts_select('surv', _WS_TOKS_SQL, PACK8_LEN, '<|sep|>')}"""




# -------------------------------------------------- semantic dedup
SEM_T = 0.42  # cosine threshold sized to the graded embeddings table
# (max pairwise cosine 0.513 at sf0.01 — the synthetic vectors have no
# true near-dups, so the gate exercises the machinery on the top of
# the similarity distribution: ~34 all-pairs edges at 0.42, of which
# the within-cell subset survives, plus every singleton labeled)


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup-shaped embedding near-dup labeling under the
    VALUE-HASH gate (llm/dedup.SemanticDedup): seeded hyperplane
    cells -> within-cell rounded cosine >= SEM_T -> connected
    components -> min-id canonical, singletons included — every
    vector's (component, cluster_size, is_canonical) value-checked.
    Uses the same (dim=64, cells=16, seed=1234) constants as the
    gated IVF queries so the plane construction is pinned once."""
    from sparker_spark.entry import load
    from sparker_spark.entry_ext import IVF_CELLS, IVF_SEED
    from sparker_spark.llm.dedup import SemanticDedup

    return SemanticDedup.dedup(
        load(spark, sf_dir, "embeddings"),
        SEM_T,
        num_cells=IVF_CELLS,
        seed=IVF_SEED,
    )


def _o_dedup_semantic() -> str:
    import random

    from sparker_spark.entry_ext import IVF_CELLS, IVF_DIM, IVF_SEED

    bits = IVF_CELLS.bit_length() - 1
    rng = random.Random(IVF_SEED)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(IVF_DIM)]
        for _ in range(bits)
    ]
    cell = " + ".join(
        f"CASE WHEN list_dot_product(emb, [{', '.join(repr(x) for x in p)}]) > 0"
        f" THEN {2**j} ELSE 0 END"
        for j, p in enumerate(planes)
    )
    return f"""
WITH RECURSIVE v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS norm
  FROM embeddings),
vc AS MATERIALIZED (SELECT vec_id, emb, norm, ({cell}) AS cell FROM v),
sedges AS (
  SELECT a.vec_id AS p1, b.vec_id AS p2
  FROM vc a JOIN vc b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6)
        >= {SEM_T}),
und AS (SELECT p1 AS u, p2 AS v FROM sedges
        UNION SELECT p2, p1 FROM sedges),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM und
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.u
),
comp AS (SELECT u, min(r) AS component FROM reach GROUP BY u),
allnodes AS (
  SELECT v.vec_id, coalesce(comp.component, v.vec_id) AS component
  FROM v LEFT JOIN comp ON v.vec_id = comp.u),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM allnodes GROUP BY component)
SELECT a.vec_id, a.component, s.cluster_size,
       a.vec_id = a.component AS is_canonical
FROM allnodes a JOIN sizes s USING (component)"""




def q_dedup_semantic_probe1(spark, sf_dir):
    """The multi-probe twin of dedup_semantic: pairs whose cells
    differ in at most ONE hyperplane sign bit also compared — the
    boundary-recall recovery (a near-dup straddling a plane lands in
    adjacent cells). Candidate volume grows by <= (log2 cells + 1)x;
    the oracle enumerates the same pair set with a symmetric
    Hamming<=1 cell condition."""
    from sparker_spark.entry import load
    from sparker_spark.entry_ext import IVF_CELLS, IVF_SEED
    from sparker_spark.llm.dedup import SemanticDedup

    return SemanticDedup.dedup(
        load(spark, sf_dir, "embeddings"),
        SEM_T,
        num_cells=IVF_CELLS,
        seed=IVF_SEED,
        multi_probe=True,
    )


def _o_dedup_semantic_probe1() -> str:
    import random

    from sparker_spark.entry_ext import IVF_CELLS, IVF_DIM, IVF_SEED

    bits = IVF_CELLS.bit_length() - 1
    rng = random.Random(IVF_SEED)
    planes = [
        [rng.gauss(0.0, 1.0) for _ in range(IVF_DIM)]
        for _ in range(bits)
    ]
    cell = " + ".join(
        f"CASE WHEN list_dot_product(emb, [{', '.join(repr(x) for x in p)}]) > 0"
        f" THEN {2**j} ELSE 0 END"
        for j, p in enumerate(planes)
    )
    return f"""
WITH RECURSIVE v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS norm
  FROM embeddings),
vc AS MATERIALIZED (SELECT vec_id, emb, norm, ({cell}) AS cell FROM v),
sedges AS (
  SELECT a.vec_id AS p1, b.vec_id AS p2
  FROM vc a JOIN vc b
    ON a.vec_id < b.vec_id
   AND bit_count(CAST(xor(a.cell, b.cell) AS BIGINT)) <= 1
  WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6)
        >= {SEM_T}),
und AS (SELECT p1 AS u, p2 AS v FROM sedges
        UNION SELECT p2, p1 FROM sedges),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM und
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.u
),
comp AS (SELECT u, min(r) AS component FROM reach GROUP BY u),
allnodes AS (
  SELECT v.vec_id, coalesce(comp.component, v.vec_id) AS component
  FROM v LEFT JOIN comp ON v.vec_id = comp.u),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM allnodes GROUP BY component)
SELECT a.vec_id, a.component, s.cluster_size,
       a.vec_id = a.component AS is_canonical
FROM allnodes a JOIN sizes s USING (component)"""




# ------------------------------------------- quality classifier
QC_B = 512
QC_LABEL = "lang = 'en'"  # weak positive label: the corpus's en docs
# stand in for the wiki-proxy class of the published recipe (GPT-3 /
# CCNet / DataComp filter with a linear classifier on weak labels)


def q_quality_classifier(spark, sf_dir):
    """fastText-architecture quality filter under the VALUE-HASH
    gate (llm/classifier.QualityClassifier): hashed unigram+bigram
    NB log-odds, one-pass deterministic training, map-literal
    scoring — every document's logit and keep/drop decision
    value-checked against an oracle that replays TRAINING AND
    SCORING in SQL."""
    from sparker_spark.entry import _parallelize_scan, load
    from sparker_spark.llm.classifier import QualityClassifier

    return QualityClassifier.train_score(
        _parallelize_scan(load(spark, sf_dir, "documents")),
        QC_LABEL,
        buckets=QC_B,
    )


def _o_quality_classifier() -> str:
    return f"""
WITH dtoks AS (SELECT doc_id,
          list_filter(regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+'),
                      t -> len(t) > 0) AS t
          FROM documents),
grams AS (
  SELECT doc_id, unnest(list_concat(
    list_transform(t, x -> 'u|' || x),
    CASE WHEN len(t) >= 2 THEN
      list_transform(range(1, len(t)), i -> 'b|' || t[i] || ' ' || t[i+1])
    ELSE [] END)) AS g
  FROM dtoks),
counts AS (SELECT doc_id,
           (('0x' || substr(md5(g), 1, 15))::BIGINT) % {QC_B} AS bucket,
           count(*) AS c
           FROM grams GROUP BY 1, 2),
pos AS (SELECT doc_id FROM documents WHERE {QC_LABEL}),
cp AS (SELECT bucket, sum(c) AS cnt1 FROM counts
       JOIN pos USING (doc_id) GROUP BY 1),
cn AS (SELECT bucket, sum(c) AS cnt0 FROM counts
       ANTI JOIN pos USING (doc_id) GROUP BY 1),
scal AS (SELECT
  (SELECT coalesce(sum(cnt1), 0) FROM cp) AS n1,
  (SELECT coalesce(sum(cnt0), 0) FROM cn) AS n0,
  (SELECT count(*) FROM pos) AS d1,
  (SELECT count(*) FROM documents) - (SELECT count(*) FROM pos) AS d0),
w AS (SELECT coalesce(cp.bucket, cn.bucket) AS bucket,
      CAST(round(
        ln((coalesce(cnt1, 0) + 1.0) / (scal.n1 + {QC_B}.0))
      - ln((coalesce(cnt0, 0) + 1.0) / (scal.n0 + {QC_B}.0)), 6)
      AS DECIMAL(18,6)) AS w
      FROM cp FULL JOIN cn USING (bucket), scal),
sc AS (SELECT doc_id, sum(c) AS n_grams, sum(c * w) AS s
       FROM counts JOIN w USING (bucket) GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(sc.n_grams, 0) AS BIGINT) AS n_grams,
       round(CAST(coalesce(sc.s, 0) AS DOUBLE)
             + round(ln(CAST(scal.d1 AS DOUBLE) / scal.d0), 6), 6)
         AS logit,
       round(CAST(coalesce(sc.s, 0) AS DOUBLE)
             + round(ln(CAST(scal.d1 AS DOUBLE) / scal.d0), 6), 6) >= 0
         AS pred
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id, scal"""




def q_curation_classifier_filter(spark, sf_dir):
    """curate(classifier_labels=...) under the VALUE-HASH gate: the
    classifier-filter stage alone (all other stages off) — weak
    positives are the corpus's en docs, and every surviving byte is
    checked against the oracle's replay of training + scoring +
    threshold."""
    from sparker_spark.curate import curate
    from sparker_spark.entry import _parallelize_scan, load

    docs = _parallelize_scan(load(spark, sf_dir, "documents"))
    labels = docs.where(QC_LABEL).select("doc_id")
    return curate(
        docs,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=False,
        jaccard_threshold=None,
        classifier_labels=labels,
        classifier_buckets=QC_B,
    )


def _o_curation_classifier_filter() -> str:
    return f"""
WITH scored AS ({_o_quality_classifier().strip()})
SELECT d.doc_id, d.text
FROM documents d JOIN scored USING (doc_id)
WHERE scored.logit >= 0.0"""


def r10_queries() -> dict:
    return {
        "text_trigram_logprob": q_text_trigram_logprob,
        "dedup_span_removal_chars": q_dedup_span_removal_chars,
        "pipeline_dsir_pretrain_e2e": q_pipeline_dsir_pretrain_e2e,
        "dedup_semantic": q_dedup_semantic,
        "dedup_semantic_probe1": q_dedup_semantic_probe1,
        "quality_classifier": q_quality_classifier,
        "curation_classifier_filter": q_curation_classifier_filter,
    }


def r10_oracles() -> dict:
    return {
        "text_trigram_logprob": _o_text_trigram_logprob(),
        "dedup_span_removal_chars": _o_dedup_span_removal_chars(),
        "pipeline_dsir_pretrain_e2e": _o_pipeline_dsir_pretrain(),
        "dedup_semantic": _o_dedup_semantic(),
        "dedup_semantic_probe1": _o_dedup_semantic_probe1(),
        "quality_classifier": _o_quality_classifier(),
        "curation_classifier_filter": _o_curation_classifier_filter(),
    }
