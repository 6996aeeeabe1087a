"""Round-8 registry queries: tokenizer-pluggable sequence packing
under the value-hash gate, the pretrain composition gated end-to-end,
and the IVF partial-probe (n_probe=1) path gated on a provably-exact
separated-clusters fixture.

Each query pairs a Spark plan with an independently-written DuckDB
oracle; column names/aliases match exactly (the driver's compare sorts
columns by name before hashing values).

No reference counterpart for any of these — sparker has no pretraining
or ANN surface; they extend the engine per the training-data-pipeline
brief (packing: the concat-and-chunk layout every LLM pretraining run
uses; IVF: the served-index probe config users actually run).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparker_spark.llm.text import BPE_ISH_REGEX

# 256 (power of two, smaller than r7's 512) -> more sequence
# boundaries at the graded SFs, so slice/separator edge cases get
# denser coverage
PACK8_LEN = 256
PACK8_SEP = 1

# the engine's standard non-whitespace tokenizer (same regex the gated
# text_token_stats query counts with): letter runs, single digits,
# single punctuation marks — a BPE-ish segmentation both engines can
# evaluate exactly
_BPE_N_SQL = f"coalesce(len(regexp_extract_all(text, '{BPE_ISH_REGEX}')), 0)"
_BPE_TOKS_SQL = f"regexp_extract_all(text, '{BPE_ISH_REGEX}')"
_WS_N_SQL = (
    "coalesce(len(list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),"
    " x -> len(x) > 0)), 0)"
)
_WS_TOKS_SQL = (
    "list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'), x -> len(x) > 0)"
)
# explicit-whitespace-class twin for the operators whose SPARK side
# splits on bpe.WS_CLASS (bpe_*, mix_*). Since the round-10 sweep the
# whole tree uses this class (hashing.WS_CLASS), so _WSX == _WS; both
# names are kept for the existing oracle texts.
_WSX_N_SQL = (
    "coalesce(len(list_filter("
    "regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),"
    " x -> len(x) > 0)), 0)"
)


def _bpe_tokenizer(col):
    return F.regexp_extract_all(col, F.lit(BPE_ISH_REGEX), 0)


# ------------------------------------------------------------------ SQL
# builders: the concat-and-chunk plan and its materializers, source- and
# tokenizer-parameterized so the same arithmetic gates the whitespace,
# BPE, precomputed-counts, and post-curation variants


def _plan_ctes(src: str, n_expr: str, seq_len: int, sep: int) -> str:
    """CTE chain ``toks -> offs -> spans -> plan`` of the packing plan
    over table/CTE ``src`` with per-document token counts ``n_expr``
    (same integer arithmetic as SequencePacking.pack_plan; the offsets
    here come from a windowed sum where Spark runs a distributed
    cumsum — identical integers, very different physical plans)."""
    return f"""toks AS (
  SELECT doc_id, CAST({n_expr} AS BIGINT) AS n FROM {src}),
offs AS (
  SELECT doc_id, n,
         CAST(sum(n + {sep}) OVER (ORDER BY doc_id)
              - (n + {sep}) AS BIGINT) AS off
  FROM toks),
spans AS (
  SELECT doc_id, n, off,
         CAST(unnest(generate_series(off // {seq_len},
                                     (off + n - 1) // {seq_len}))
          AS BIGINT) AS seq_id
  FROM offs WHERE n > 0),
plan AS (
  SELECT seq_id, doc_id,
         greatest(CAST(0 AS BIGINT), seq_id * {seq_len} - off)
           AS tok_start,
         least(n, (seq_id + 1) * {seq_len} - off) AS tok_end,
         least(n, (seq_id + 1) * {seq_len} - off)
           - greatest(CAST(0 AS BIGINT), seq_id * {seq_len} - off)
           AS n_toks,
         greatest(CAST(0 AS BIGINT), off - seq_id * {seq_len})
           AS seq_pos
  FROM spans)"""


def _texts_select(
    src: str,
    toks_expr: str,
    seq_len: int,
    sep_str: str,
    eff_len_expr: str = "len(t)",
) -> str:
    """Materializer tail over a ``plan`` CTE: slices in seq_pos order,
    one separator rendered after each document-ending slice that is
    not flush with the sequence cut (the sep=1 reduction of the
    general rule, as in entry_r7.O_PACK_TEXTS). ``eff_len_expr`` is
    the document's EFFECTIVE stream length — override with
    ``least(len(t), cap)`` for length-capped plans (the r9
    max_doc_tokens twin) so the separator lands at the cap boundary."""
    return f"""tk AS (SELECT doc_id, {toks_expr} AS t FROM {src}),
sliced AS (
  SELECT p.seq_id, p.seq_pos, p.n_toks,
         array_to_string(list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                                    CAST(p.tok_end AS INTEGER)), ' ')
           AS piece,
         p.tok_end = {eff_len_expr}
           AND p.seq_pos + p.n_toks < {seq_len} AS ends_doc
  FROM plan p JOIN tk USING (doc_id))
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       string_agg(CASE WHEN ends_doc THEN piece || ' {sep_str}'
                       ELSE piece END, ' ' ORDER BY seq_pos) AS text
FROM sliced GROUP BY seq_id"""


# ----------------------------------------------- BPE-tokenized packing


def q_pack_sequences_bpe(spark, sf_dir):
    """The packing plan under a NON-whitespace tokenizer (judge ask
    r8#1): the BPE-ish regex segmentation drives the counts through
    pack_plan's pluggable ``tokenizer``, so the offsets and slice
    bounds are those of a real subword-style corpus, value-checked
    against a windowed-sum oracle using the same regex."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    return SequencePacking.pack_plan(
        load(spark, sf_dir, "documents"),
        PACK8_LEN,
        sep_tokens=PACK8_SEP,
        tokenizer=_bpe_tokenizer,
    )


O_PACK_SEQUENCES_BPE = f"""
WITH {_plan_ctes('documents', _BPE_N_SQL, PACK8_LEN, PACK8_SEP)}
SELECT seq_id, doc_id, tok_start, tok_end, n_toks, seq_pos FROM plan"""


def q_pack_texts_pretok(spark, sf_dir):
    """The PRE-TOKENIZED materializer path: an upstream tokenization
    (here the BPE-ish regex, standing in for an external BPE run)
    lands as an array column; the plan is built from its counts via
    ``counts_col`` and the slices come from ``tokens_col`` — the
    engine never tokenizes. Gate checks every byte of every packed
    sequence."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            _bpe_tokenizer(F.col("text")).alias("toks"),
        )
        .withColumn("n_ext", F.size("toks"))
    )
    plan = SequencePacking.pack_plan(
        docs, PACK8_LEN, sep_tokens=PACK8_SEP, counts_col="n_ext"
    )
    return SequencePacking.pack_texts(
        docs, plan, PACK8_LEN, sep_tokens=PACK8_SEP, tokens_col="toks"
    )


O_PACK_TEXTS_PRETOK = f"""
WITH {_plan_ctes('documents', _BPE_N_SQL, PACK8_LEN, PACK8_SEP)},
{_texts_select('documents', _BPE_TOKS_SQL, PACK8_LEN, '<|sep|>')}"""


def q_pack_token_ids_bpe(spark, sf_dir):
    """The INTEGER-sequence materializer (pack_token_ids): token ids
    (deterministically, each token's length — SQL-expressible, so the
    whole id stream is value-checked) packed with sep_id=-1 at the
    in-sequence separator positions; the output ``input_ids`` array is
    rendered to a space-joined string because the driver's value hash
    stringifies arrays engine-dependently."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    docs = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            _bpe_tokenizer(F.col("text")).alias("toks"),
        )
        .withColumn("n_ext", F.size("toks"))
        .withColumn(
            "ids", F.transform("toks", lambda t: F.length(t).cast("long"))
        )
    )
    plan = SequencePacking.pack_plan(
        docs, PACK8_LEN, sep_tokens=PACK8_SEP, counts_col="n_ext"
    )
    out = SequencePacking.pack_token_ids(
        docs, plan, PACK8_LEN, "ids", sep_id=-1, sep_tokens=PACK8_SEP
    )
    return out.select(
        "seq_id",
        "n_docs",
        "n_tokens",
        F.concat_ws(
            " ", F.transform("input_ids", lambda x: x.cast("string"))
        ).alias("ids_str"),
    )


O_PACK_TOKEN_IDS_BPE = f"""
WITH {_plan_ctes('documents', _BPE_N_SQL, PACK8_LEN, PACK8_SEP)},
tk AS (SELECT doc_id,
              list_transform({_BPE_TOKS_SQL},
                             x -> CAST(len(x) AS BIGINT)) AS t
       FROM documents),
sliced AS (
  SELECT p.seq_id, p.seq_pos, p.n_toks,
         CASE WHEN p.tok_end = len(t)
                   AND p.seq_pos + p.n_toks < {PACK8_LEN}
              THEN list_concat(
                     list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                                CAST(p.tok_end AS INTEGER)),
                     [CAST(-1 AS BIGINT)])
              ELSE list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                              CAST(p.tok_end AS INTEGER)) END AS piece
  FROM plan p JOIN tk USING (doc_id))
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(piece ORDER BY seq_pos)), ' ')
         AS ids_str
FROM sliced GROUP BY seq_id"""


# ------------------------------------------ pretrain composition, e2e


def q_pipeline_pretrain_e2e(spark, sf_dir):
    """prepare_training_data() under the VALUE-HASH gate (judge ask
    r8#4): quality floor (0.3) -> exact dedup (canonical = min id per
    content hash) -> concat-and-chunk packing of the survivors, every
    byte of every packed sequence checked against the composed SQL of
    the same gated stages. Text-mutating stages (redaction,
    boilerplate) are off so the oracle composes the already-gated
    text_quality / dedup_exact / pack_texts SQL verbatim; the near-dup
    stage has its own gates (dedup_minhash_lsh, curation pipeline
    tests)."""
    from sparker_spark.entry import load
    from sparker_spark.pretrain import prepare_training_data

    return prepare_training_data(
        load(spark, sf_dir, "documents"),
        seq_len=PACK8_LEN,
        sep_tokens=PACK8_SEP,
        redact=False,
        min_quality=0.3,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
    )


def _o_pipeline_pretrain() -> str:
    from sparker_spark.entry import _o_text_quality

    surv = _SURV_CTES_TMPL.format(quality=_o_text_quality())
    return f"""
WITH {surv},
{_plan_ctes('surv', _WS_N_SQL, PACK8_LEN, PACK8_SEP)},
{_texts_select('surv', _WS_TOKS_SQL, PACK8_LEN, '<|sep|>')}"""


def q_pretrain_plan_external_counts(spark, sf_dir):
    """The ``token_counts=`` pass-through (judge ask r8#1): an
    EXTERNAL tokenization's (doc_id, n) relation — here the BPE-ish
    counts computed as a separate relation, standing in for a
    SentencePiece run's output — drives prepare_training_data's plan
    over the curation survivors (return_plan form, the artifact to
    persist when one corpus feeds several tokenizations)."""
    from sparker_spark.entry import load
    from sparker_spark.pretrain import prepare_training_data

    docs = load(spark, sf_dir, "documents")
    ext_counts = docs.select(
        "doc_id",
        F.size(_bpe_tokenizer(F.col("text"))).cast("long").alias("n"),
    )
    return prepare_training_data(
        docs,
        seq_len=PACK8_LEN,
        sep_tokens=PACK8_SEP,
        redact=False,
        min_quality=0.3,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
        token_counts=ext_counts,
        return_plan=True,
    )


def _o_pretrain_plan_external() -> str:
    from sparker_spark.entry import _o_text_quality

    surv = _SURV_CTES_TMPL.format(quality=_o_text_quality())
    return f"""
WITH {surv},
{_plan_ctes('surv', _BPE_N_SQL, PACK8_LEN, PACK8_SEP)}
SELECT seq_id, doc_id, tok_start, tok_end, n_toks, seq_pos FROM plan"""


# ---------------------------------------- IVF partial-probe, provably
# exact on a separated-clusters fixture (judge ask r8#5)
#
# Fixture: 8 axis-aligned clusters in R^8. Vector i = e_c + d·e_c'
# with c = i % 8, c' = (c+1) % 8, d = ((i//8) % 7 + 1)/1024 — every
# coordinate a dyadic rational, so dot products are EXACT doubles in
# any summation order and both engines compute bit-identical cosines
# (norms/divisions are IEEE correctly-rounded from identical inputs).
#
# Why n_probe=1 is provably exact here (asserted by
# tests/test_ivf_probe1_fixture.py against the actual seed-1234
# planes):
#   1. cell co-location: for every cluster, every member's SRP sign
#      bits equal the centroid's (|plane[c]| >> |plane[c']|·7/1024
#      for all 4 planes), so a query's own cell contains its ENTIRE
#      cluster;
#   2. margin: intra-cluster cosine >= 0.9999 while inter-cluster
#      cosine <= 7/1024 (clusters are axis-orthogonal up to the
#      perturbation), so with >= k+1 members per cluster (62 at the
#      graded SFs) the true top-k is strictly within-cluster;
#   3. therefore the n_probe=1 candidate set (own cell) is a superset
#      of the true top-k, and ranking it yields exactly the exact
#      answer — which the oracle computes independently from the
#      closed-form cosine (one-hot + single-axis perturbation).

IVF_K = 5
IVF_CELLS = 16
IVF_SEED = 1234


def _separated_clusters(spark, sf_dir):
    from sparker_spark.entry import load

    ids = load(spark, sf_dir, "embeddings").select("vec_id")
    c = (F.col("vec_id") % 8).cast("int")
    d = ((F.expr("vec_id div 8") % 7) + 1).cast("double") / F.lit(1024.0)
    vec = F.array(
        *[
            F.when(c == F.lit(j), F.lit(1.0))
            .when((c + 1) % 8 == F.lit(j), d)
            .otherwise(F.lit(0.0))
            for j in range(8)
        ]
    )
    return ids.select(
        "vec_id",
        vec.alias("embedding"),
        (F.col("vec_id") % 8).cast("long").alias("label"),
    )


# closed-form cosine of the fixture: dot is 1 + d_a·d_b (same
# cluster), d_a (b sits on a's perturbation axis), d_b (vice versa),
# else 0 — every case an exact double, divided by the two norms
_O_PROBE1_CTES = """
v AS (
  SELECT vec_id, CAST(vec_id % 8 AS BIGINT) AS c,
         CAST(((vec_id // 8) % 7) + 1 AS DOUBLE) / 1024.0 AS d
  FROM embeddings),
p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         (CASE WHEN a.c = b.c THEN 1.0 + a.d * b.d
               WHEN (a.c + 1) % 8 = b.c THEN a.d
               WHEN (b.c + 1) % 8 = a.c THEN b.d
               ELSE 0.0 END)
         / (sqrt(1.0 + a.d * a.d) * sqrt(1.0 + b.d * b.d)) AS cr
  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
r AS (
  SELECT query_id, neighbor_id, round(cr, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cr, 6) DESC, neighbor_id)
           AS rank
  FROM p)"""


def q_ann_topk_ivf_probe1(spark, sf_dir):
    """IVF-flat ANN at the PRODUCTION probe config — n_probe=1 of 16
    cells — under the value-hash gate against an EXACT brute-force
    oracle. Candidate volume is ~n²/16 instead of n² (the scale
    shape); exactness on this fixture is a proved property, not luck
    (see module comment; preconditions asserted in tests)."""
    from sparker_spark.llm.similarity import IVFIndex

    fix = _separated_clusters(spark, sf_dir)
    index = IVFIndex.build(fix, num_cells=IVF_CELLS, seed=IVF_SEED)
    return index.search(k=IVF_K, n_probe=1)


O_ANN_TOPK_IVF_PROBE1 = f"""
WITH {_O_PROBE1_CTES.strip()}
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {IVF_K}"""


def q_knn_label_vote_ivf_probe1(spark, sf_dir):
    """k-NN label voting routed through the PARTIAL-probe IVF search
    (n_probe=1) — the config a production labeling-QA pass actually
    runs — gated against the exact-kNN vote computed independently in
    SQL. Labels are the fixture's cluster ids."""
    from sparker_spark.llm.similarity import IVFIndex, LabelKNN

    fix = _separated_clusters(spark, sf_dir)
    index = IVFIndex.build(fix, num_cells=IVF_CELLS, seed=IVF_SEED)
    neighbors = index.search(k=IVF_K, n_probe=1)
    return LabelKNN.predict(fix, k=IVF_K, neighbors=neighbors)


O_KNN_LABEL_VOTE_IVF_PROBE1 = f"""
WITH {_O_PROBE1_CTES.strip()},
k AS (SELECT query_id, neighbor_id FROM r WHERE rank <= {IVF_K}),
votes AS (
  SELECT k.query_id, vn.c AS n_label, count(*) AS nv
  FROM k JOIN v vn ON k.neighbor_id = vn.vec_id
  GROUP BY 1, 2),
pred AS (
  SELECT query_id, n_label, nv FROM (
    SELECT query_id, n_label, nv,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY nv DESC, n_label) AS rn
    FROM votes)
  WHERE rn = 1)
SELECT p.query_id AS vec_id,
       vq.c AS true_label,
       p.n_label AS predicted_label,
       CAST(p.nv AS BIGINT) AS votes,
       p.n_label = vq.c AS agrees
FROM pred p JOIN v vq ON p.query_id = vq.vec_id"""


def r8_queries() -> dict:
    return {
        "pack_sequences_bpe": q_pack_sequences_bpe,
        "pack_texts_pretok": q_pack_texts_pretok,
        "pack_token_ids_bpe": q_pack_token_ids_bpe,
        "pipeline_pretrain_e2e": q_pipeline_pretrain_e2e,
        "pretrain_plan_external_counts": q_pretrain_plan_external_counts,
        "ann_topk_ivf_probe1": q_ann_topk_ivf_probe1,
        "knn_label_vote_ivf_probe1": q_knn_label_vote_ivf_probe1,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_first_merge": q_bpe_first_merge,
        "bpe_encode_fixed": q_bpe_encode_fixed,
        "mix_budget_plan": q_mix_budget_plan,
        "mix_sample_to_budget": q_mix_sample_to_budget,
        "text_bigram_logprob": q_text_bigram_logprob,
        "pipeline_pretrain_bpe_e2e": q_pipeline_pretrain_bpe_e2e,
        "bpe_encode_ids_fixed": q_bpe_encode_ids_fixed,
        "pack_training_order": q_pack_training_order,
        "pack_plan_incremental": q_pack_plan_incremental,
        "pipeline_pretrain_bpe_ids_e2e": q_pipeline_pretrain_bpe_ids_e2e,
    }


def r8_oracles() -> dict:
    return {
        "pack_sequences_bpe": O_PACK_SEQUENCES_BPE,
        "pack_texts_pretok": O_PACK_TEXTS_PRETOK,
        "pack_token_ids_bpe": O_PACK_TOKEN_IDS_BPE,
        "pipeline_pretrain_e2e": _o_pipeline_pretrain(),
        "pretrain_plan_external_counts": _o_pretrain_plan_external(),
        "ann_topk_ivf_probe1": O_ANN_TOPK_IVF_PROBE1,
        "knn_label_vote_ivf_probe1": O_KNN_LABEL_VOTE_IVF_PROBE1,
        "bpe_pair_counts": O_BPE_PAIR_COUNTS,
        "bpe_first_merge": _o_bpe_first_merge(),
        "bpe_encode_fixed": _o_bpe_encode_fixed(),
        "mix_budget_plan": O_MIX_BUDGET_PLAN,
        "mix_sample_to_budget": _o_mix_sample(),
        "text_bigram_logprob": O_TEXT_BIGRAM_LOGPROB,
        "pipeline_pretrain_bpe_e2e": _o_pipeline_pretrain_bpe(),
        "bpe_encode_ids_fixed": _o_bpe_encode_ids(),
        "pack_training_order": _o_pack_training_order(),
        "pack_plan_incremental": O_PACK_PLAN_INCREMENTAL,
        "pipeline_pretrain_bpe_ids_e2e": _o_pipeline_pretrain_bpe_ids(),
    }


# ----------------------------------------------------- BPE tokenizer
# Training iteration 0 (pair counts over the corpus word vocabulary)
# and the argmax merge are exactly SQL-expressible, so they carry the
# value-hash gate for the trainer's counting+selection core; the
# k-iteration loop and the priority encoder are pinned against an
# independent pure-Python reference in tests/test_bpe.py.

_VOCAB_SQL = """
w AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                            x -> len(x) > 0)) AS word
  FROM documents),
v AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY word),
ch AS (SELECT word, n, regexp_extract_all(word, '.') AS cs FROM v),
pr AS (
  SELECT cs[i] AS sym_left, cs[i + 1] AS sym_right, n
  FROM (SELECT word, n, cs,
               unnest(generate_series(1, len(cs) - 1)) AS i
        FROM ch)),
pc AS (
  SELECT sym_left, sym_right, CAST(sum(n) AS BIGINT) AS n
  FROM pr GROUP BY 1, 2)"""


def q_bpe_pair_counts(spark, sf_dir):
    """BPE training iteration 0 under the VALUE-HASH gate: adjacent
    single-character symbol-pair counts over the corpus word
    vocabulary (the relation every training iteration aggregates;
    bounded by |charset|² rows at iteration 0). One corpus pass for
    the vocab + one explode + one hash aggregate — keyed shuffles
    only."""
    from sparker_spark.entry import load
    from sparker_spark.llm.bpe import BPE

    state = BPE._init_state(
        BPE.word_vocab(load(spark, sf_dir, "documents"))
    )
    return BPE.pair_counts(state).select(
        F.col("left").alias("sym_left"),
        F.col("right").alias("sym_right"),
        "n",
    )


O_BPE_PAIR_COUNTS = f"""
WITH {_VOCAB_SQL.strip()}
SELECT sym_left, sym_right, n FROM pc"""


def q_bpe_first_merge(spark, sf_dir):
    """The trainer's selection rule under the gate: the single
    highest-count pair with the full deterministic tie-break (count
    desc, left asc, right asc) — i.e. BPE.train(num_merges=1)."""
    from sparker_spark.entry import load
    from sparker_spark.llm.bpe import BPE

    return BPE.train(load(spark, sf_dir, "documents"), 1)


def _o_bpe_first_merge() -> str:
    # mirror BPE.train's min_count early-stop: a best pair below the
    # default threshold records NO merge, so the oracle must emit zero
    # rows there too (latent on corpora with all-distinct words)
    from sparker_spark.llm.bpe import DEFAULT_MIN_COUNT

    return f"""
WITH {_VOCAB_SQL.strip()}
SELECT CAST(1 AS INTEGER) AS rank, sym_left AS "left",
       sym_right AS "right", sym_left || sym_right AS merged
FROM pc
WHERE n >= {DEFAULT_MIN_COUNT}
ORDER BY n DESC, sym_left, sym_right LIMIT 1"""


# Hand-written cascade-free merge table for the ENCODE gate. Two
# provable properties make the SQL oracle exact (reasoning in
# tests/test_bpe_gate_fixture.py):
#   * every pair has left != right, so one merge pass's left-to-right
#     non-overlapping semantics equals a simultaneous string replace
#     on a both-sides-wrapped symbol encoding;
#   * no merge's RESULT equals an EARLIER merge's operand, so a pair
#     can never re-appear after a later-rank merge — priority
#     encoding (what BPE.encode runs) coincides with one pass per
#     rank in rank order (what the replace chain replays).
BPE_FIXED_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
]


def _fixed_merges(spark):
    """The BPE_FIXED_MERGES table as a DataFrame — shared by every
    fixed-merge gate so the three Spark sides can never drift."""
    return spark.createDataFrame(
        [(r + 1, a, b, a + b) for r, (a, b) in enumerate(BPE_FIXED_MERGES)],
        "rank int, left string, right string, merged string",
    )


def q_bpe_encode_fixed(spark, sf_dir):
    """The priority ENCODER under the value-hash gate: every document
    tokenized with the fixed cascade-free merge table, every token of
    every document value-checked (space-joined — BPE tokens contain
    no whitespace by construction)."""
    from sparker_spark.entry import load
    from sparker_spark.llm.bpe import BPE

    enc = BPE.encode(
        load(spark, sf_dir, "documents"), _fixed_merges(spark)
    )
    return enc.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(" ", "tokens").alias("tokens_str"),
    )


def _o_bpe_encode_fixed() -> str:
    # one shared replace-chain builder (see _bpe_tokens_str_expr) so
    # this oracle and the pretrain-BPE oracle can never desynchronize
    word_tokens = _bpe_tokens_str_expr()
    return f"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                     x -> len(x) > 0) AS words
  FROM documents),
t AS (
  SELECT doc_id,
         array_to_string(list_transform(words, x -> {word_tokens}),
                         ' ') AS tokens_str
  FROM d)
SELECT doc_id,
       CAST(CASE WHEN tokens_str = '' THEN 0
                 ELSE len(string_split(tokens_str, ' ')) END AS BIGINT)
         AS n_tokens,
       tokens_str
FROM t"""


# ------------------------------------------- token-budget corpus mix
# (llm/mixing.py) — weights derived deterministically from the source
# name (1 + src_index % 5) so both engines share them without a
# side-channel; budget sized to put most sources' rates strictly
# inside (0, 1) at the graded SFs.

MIX_BUDGET = 20_000
MIX_SEED = 7


def _mix_weights(spark, sf_dir) -> dict[str, float]:
    from sparker_spark.entry import load

    srcs = [
        r["source"]
        for r in load(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .collect()
    ]
    return {s: 1.0 + int(s[3:]) % 5 for s in sorted(srcs)}


def q_mix_budget_plan(spark, sf_dir):
    """The pretraining data-recipe planner under the VALUE-HASH gate:
    per-source available token mass, budget-share targets and capped
    sampling rates — every double checked bit-for-bit (identical IEEE
    expression structure on both engines, rnd6 on output)."""
    from sparker_spark.entry import load
    from sparker_spark.llm.mixing import MixPlanner
    from sparker_spark.rounding import rnd

    plan = MixPlanner.budget_plan(
        load(spark, sf_dir, "documents"),
        _mix_weights(spark, sf_dir),
        MIX_BUDGET,
    )
    return plan.select(
        "source",
        "available_tokens",
        rnd("target_tokens", 6).alias("target_tokens"),
        rnd("rate", 6).alias("rate"),
    )


def _mix_plan_ctes(budget: int) -> str:
    """Budget-parameterized mix-plan CTE chain — shared with the r9
    renormalization gate so the base plan SQL can never drift."""
    return f"""
n AS (
  SELECT doc_id, source, CAST({_WSX_N_SQL} AS BIGINT) AS n
  FROM documents),
t AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS available_tokens
  FROM n GROUP BY source),
wt AS (
  SELECT source,
         CAST(1 + CAST(substr(source, 4) AS INT) % 5 AS DOUBLE) AS w
  FROM t),
ww AS (SELECT source, w / (SELECT sum(w) FROM wt) AS wn FROM wt),
r AS (
  SELECT t.source, t.available_tokens,
         CAST({int(budget)} AS DOUBLE) * ww.wn AS target,
         CASE WHEN t.available_tokens > 0
                   AND CAST({int(budget)} AS DOUBLE) * ww.wn > 0
              THEN least(1.0, (CAST({int(budget)} AS DOUBLE) * ww.wn)
                              / t.available_tokens)
              ELSE 0.0 END AS rate
  FROM t JOIN ww ON t.source = ww.source)"""


_MIX_PLAN_CTES = _mix_plan_ctes(MIX_BUDGET)


O_MIX_BUDGET_PLAN = f"""
WITH {_MIX_PLAN_CTES.strip()}
SELECT source, available_tokens,
       round(target, 6) AS target_tokens,
       round(rate, 6) AS rate
FROM r"""


def q_mix_sample_to_budget(spark, sf_dir):
    """The realized deterministic sample: documents kept iff their
    md5 hash coordinate (pure function of seed + doc_id) is below
    their source's plan rate — replayed bit-for-bit by the oracle.
    Gate checks the exact membership set with per-doc token counts."""
    from sparker_spark.entry import load
    from sparker_spark.llm.mixing import MixPlanner

    return MixPlanner.sample_to_budget(
        load(spark, sf_dir, "documents"),
        _mix_weights(spark, sf_dir),
        MIX_BUDGET,
        seed=MIX_SEED,
    )


def _o_mix_sample() -> str:
    from sparker_spark.llm.sampling import _coord_sql

    coord = _coord_sql("doc_id", MIX_SEED, "duck")
    return f"""
WITH {_MIX_PLAN_CTES.strip()}
SELECT n.doc_id, n.source, n.n
FROM n JOIN r ON n.source = r.source
WHERE {coord} < r.rate"""


# ------------------------------------------------ bigram LM scoring


def q_text_bigram_logprob(spark, sf_dir):
    """Corpus bigram LM with Laplace smoothing (llm/text.py
    LanguageModelScore.bigram_logprob) — the context-model step of the
    CCNet-style quality ladder; per-bigram logprobs rounded then
    DECIMAL-summed for cross-engine determinism."""
    from sparker_spark.entry import load
    from sparker_spark.llm.text import LanguageModelScore

    return LanguageModelScore.bigram_logprob(
        load(spark, sf_dir, "documents")
    )


O_TEXT_BIGRAM_LOGPROB = """WITH
d AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         x -> len(x) > 0) AS t
      FROM documents),
big AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM d)),
v AS (
  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vs
  FROM (SELECT unnest(t) AS tok FROM d)),
bc AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY 1, 2),
cc AS (SELECT w1, sum(cb) AS c1 FROM bc GROUP BY 1),
lp AS (
  SELECT bc.w1, bc.w2,
         CAST(round(ln((cb + 1.0) / (c1 + (SELECT vs FROM v))), 6)
              AS DECIMAL(18,6)) AS lp
  FROM bc JOIN cc ON bc.w1 = cc.w1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM big JOIN lp USING (w1, w2)
GROUP BY doc_id"""

# order-3 twin of O_TEXT_BIGRAM_LOGPROB — same add-one smoothing,
# context count, vocabulary scalar, and DECIMAL(18,6) rounding
# discipline; the prefix key is (w1, w2) instead of (w1)
O_TEXT_TRIGRAM_LOGPROB = """WITH
d AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         x -> len(x) > 0) AS t
      FROM documents),
tri AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM d)),
v AS (
  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS vs
  FROM (SELECT unnest(t) AS tok FROM d)),
tc AS (SELECT w1, w2, w3, count(*) AS cg FROM tri GROUP BY 1, 2, 3),
cc AS (SELECT w1, w2, sum(cg) AS c1 FROM tc GROUP BY 1, 2),
lp AS (
  SELECT tc.w1, tc.w2, tc.w3,
         CAST(round(ln((cg + 1.0) / (c1 + (SELECT vs FROM v))), 6)
              AS DECIMAL(18,6)) AS lp
  FROM tc JOIN cc ON tc.w1 = cc.w1 AND tc.w2 = cc.w2)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM tri JOIN lp USING (w1, w2, w3)
GROUP BY doc_id"""


# -------------------------------------- BPE ids + BPE pretrain e2e

_SURV_CTES_TMPL = """q AS (SELECT doc_id, quality_score FROM ({quality})),
qs AS (
  SELECT d.doc_id, d.text
  FROM documents d JOIN q USING (doc_id)
  WHERE q.quality_score >= 0.3),
surv AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           doc_id = min(doc_id) OVER (
             PARTITION BY md5(trim(regexp_replace(lower(text),
                                                  '[ \\t\\r\\n\\f\\x0B]+', ' ', 'g')))
           ) AS canon
    FROM qs)
  WHERE canon)"""


def _bpe_tokens_str_expr() -> str:
    """Per-word replace-chain of BPE_FIXED_MERGES (see
    _o_bpe_encode_fixed) as an expression over word ``x``."""

    def w(sym: str) -> str:
        return f"chr(31) || '{sym}' || chr(30)"

    expr = (
        "chr(31) || array_to_string(regexp_extract_all(x, '.'),"
        " chr(30) || chr(31)) || chr(30)"
    )
    for a, b in BPE_FIXED_MERGES:
        expr = f"replace({expr}, {w(a)} || {w(b)}, {w(a + b)})"
    return (
        f"rtrim(ltrim(replace({expr}, chr(30) || chr(31), ' '),"
        " chr(31)), chr(30))"
    )


def _bpe_toks_list_sql(src: str) -> str:
    """CTE ``enc`` = (doc_id, t: BPE token list) over ``src`` using
    the fixed merge table."""
    word_tokens = _bpe_tokens_str_expr()
    return f"""enc AS (
  SELECT doc_id,
         list_filter(
           string_split(
             array_to_string(
               list_transform(
                 list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                             x -> len(x) > 0),
                 x -> {word_tokens}),
               ' '),
             ' '),
           x -> len(x) > 0) AS t
  FROM {src})"""


def q_pipeline_pretrain_bpe_e2e(spark, sf_dir):
    """The FULL tokenizer-aware pretrain composition under the gate:
    quality floor -> exact dedup -> BPE ENCODE (priority encoder,
    fixed cascade-free merge table) -> packed BPE-token sequences,
    through prepare_training_data(bpe_merges=...). Every byte of
    every packed sequence checked against the composed SQL of the
    gated stages (survivors + replace-chain encode + plan + texts)."""
    from sparker_spark.entry import load
    from sparker_spark.pretrain import prepare_training_data

    merges = _fixed_merges(spark)
    return prepare_training_data(
        load(spark, sf_dir, "documents"),
        seq_len=PACK8_LEN,
        sep_tokens=PACK8_SEP,
        redact=False,
        min_quality=0.3,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
        bpe_merges=merges,
    )


def _o_pipeline_pretrain_bpe() -> str:
    from sparker_spark.entry import _o_text_quality

    surv = _SURV_CTES_TMPL.format(quality=_o_text_quality())
    return f"""
WITH {surv},
{_bpe_toks_list_sql('surv')},
{_plan_ctes('enc', 'len(t)', PACK8_LEN, PACK8_SEP)},
{_texts_select('enc', 't', PACK8_LEN, '<|sep|>')}"""


def q_bpe_encode_ids_fixed(spark, sf_dir):
    """Token-ID materialization under the gate: BPE encode with the
    fixed merge table, ids from the deterministic vocabulary layout
    (sorted base characters 0..C-1, merges C..C+k-1, unseen -> -1).
    The whole id stream of every document is value-checked (space-
    joined rendering)."""
    from sparker_spark.entry import load
    from sparker_spark.llm.bpe import BPE, BPEVocab

    docs = load(spark, sf_dir, "documents")
    merges = _fixed_merges(spark)
    vocab = BPEVocab.build(docs, merges)
    ids = BPEVocab.encode_ids(BPE.encode(docs, merges), vocab)
    return ids.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(
            " ", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("ids_str"),
    )


def _o_bpe_encode_ids() -> str:
    n_merges = len(BPE_FIXED_MERGES)
    merge_rows = ", ".join(
        f"('{a + b}', {r})" for r, (a, b) in enumerate(BPE_FIXED_MERGES)
    )
    return f"""
WITH {_bpe_toks_list_sql('documents')},
chars AS (
  SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS token
  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                                  x -> len(x) > 0)) AS word
        FROM documents)),
cv AS (SELECT token,
              CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
                AS token_id
       FROM chars),
nm AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM cv),
mv AS (SELECT token, CAST(r + (SELECT nc FROM nm) AS BIGINT) AS token_id
       FROM (VALUES {merge_rows}) AS m(token, r)),
v AS (SELECT * FROM cv UNION ALL SELECT * FROM mv),
pos AS (
  SELECT doc_id, i, t[i] AS token
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM enc)),
m2 AS (
  SELECT pos.doc_id, pos.i,
         coalesce(v.token_id, CAST(-1 AS BIGINT)) AS tid
  FROM pos LEFT JOIN v ON pos.token = v.token),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         array_to_string(list(tid ORDER BY i), ' ') AS ids_str
  FROM m2 GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(agg.n_tokens, 0) AS n_tokens,
       coalesce(agg.ids_str, '') AS ids_str
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id"""


# ------------------------------------------- training-order shuffle

SHUF_SEED = 11


def q_pack_training_order(spark, sf_dir):
    """The deterministic training-order permutation under the gate:
    every packed sequence's shuffle position = rank of its md5 hash
    coordinate (pure function of seed + seq_id, replayed exactly by
    the oracle's windowed row_number). Spark computes the rank with
    the distributed two-phase global_rank — no single-partition
    window."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking, training_order

    plan = SequencePacking.pack_plan(
        load(spark, sf_dir, "documents"), PACK8_LEN, sep_tokens=PACK8_SEP
    )
    seqs = SequencePacking.pack_stats(plan, PACK8_LEN).select("seq_id")
    return training_order(seqs, seed=SHUF_SEED).select(
        "seq_id", "shuffle_pos"
    )


def _o_pack_training_order() -> str:
    from sparker_spark.llm.sampling import _coord_sql

    coord = _coord_sql("seq_id", SHUF_SEED, "duck")
    return f"""
WITH {_plan_ctes('documents', _WS_N_SQL, PACK8_LEN, PACK8_SEP)},
s AS (SELECT DISTINCT seq_id FROM plan)
SELECT seq_id,
       CAST(row_number() OVER (ORDER BY {coord}, seq_id) - 1 AS BIGINT)
         AS shuffle_pos
FROM s"""


# --------------------------------------------- incremental packing

PACK_INCR_CUTOFF = 250  # docs 0..499 at both graded SFs


def q_pack_plan_incremental(spark, sf_dir):
    """INCREMENTAL corpus append under the gate: the new batch
    (doc_id >= cutoff) packed with base_offset = stream_end(old batch)
    must equal, row for row, what the FULL-corpus plan assigns those
    documents — the property that lets daily appends never repack
    history. The oracle computes the full plan and restricts it; the
    Spark side never sees the old documents' plan at all."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    docs = load(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") < PACK_INCR_CUTOFF)
    new = docs.where(F.col("doc_id") >= PACK_INCR_CUTOFF)
    base = SequencePacking.stream_end(old, sep_tokens=PACK8_SEP)
    return SequencePacking.pack_plan(
        new, PACK8_LEN, sep_tokens=PACK8_SEP, base_offset=base
    )


O_PACK_PLAN_INCREMENTAL = f"""
WITH {_plan_ctes('documents', _WS_N_SQL, PACK8_LEN, PACK8_SEP)}
SELECT seq_id, doc_id, tok_start, tok_end, n_toks, seq_pos
FROM plan WHERE doc_id >= {PACK_INCR_CUTOFF}"""


# ----------------------------- pretrain-to-input_ids, end-to-end gate


def q_pipeline_pretrain_bpe_ids_e2e(spark, sf_dir):
    """The TRAINABLE output of the whole stack under one gate:
    quality floor -> exact dedup -> BPE encode (fixed merges) ->
    BPEVocab ids -> packed integer sequences, via
    prepare_training_data(bpe_merges=..., return_ids=True). Every id
    of every packed sequence value-checked (space-joined rendering)."""
    from sparker_spark.entry import load
    from sparker_spark.pretrain import prepare_training_data

    out = prepare_training_data(
        load(spark, sf_dir, "documents"),
        seq_len=PACK8_LEN,
        sep_tokens=PACK8_SEP,
        redact=False,
        min_quality=0.3,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
        bpe_merges=_fixed_merges(spark),
        return_ids=True,
        sep_id=-1,
    )
    return out.select(
        "seq_id",
        "n_docs",
        "n_tokens",
        F.concat_ws(
            " ", F.transform("input_ids", lambda x: x.cast("string"))
        ).alias("ids_str"),
    )


def _o_pipeline_pretrain_bpe_ids() -> str:
    from sparker_spark.entry import _o_text_quality

    surv = _SURV_CTES_TMPL.format(quality=_o_text_quality())
    merge_rows = ", ".join(
        f"('{a + b}', {r})" for r, (a, b) in enumerate(BPE_FIXED_MERGES)
    )
    return f"""
WITH {surv},
{_bpe_toks_list_sql('surv')},
chars AS (
  SELECT DISTINCT unnest(regexp_extract_all(word, '.')) AS token
  FROM (SELECT unnest(list_filter(
                 regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                 x -> len(x) > 0)) AS word
        FROM surv)),
cv AS (SELECT token,
              CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT)
                AS token_id
       FROM chars),
nm AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM cv),
mv AS (SELECT token, CAST(r + (SELECT nc FROM nm) AS BIGINT) AS token_id
       FROM (VALUES {merge_rows}) AS m(token, r)),
v AS (SELECT * FROM cv UNION ALL SELECT * FROM mv),
pos AS (
  SELECT doc_id, i, t[i] AS token
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM enc)),
idl AS (
  SELECT pos.doc_id,
         list(coalesce(v.token_id, CAST(-1 AS BIGINT)) ORDER BY pos.i)
           AS ids
  FROM pos LEFT JOIN v ON pos.token = v.token
  GROUP BY pos.doc_id),
enc2 AS (
  SELECT e.doc_id, coalesce(idl.ids, CAST([] AS BIGINT[])) AS ids
  FROM enc e LEFT JOIN idl ON e.doc_id = idl.doc_id),
{_plan_ctes('enc2', 'len(ids)', PACK8_LEN, PACK8_SEP)},
tk AS (SELECT doc_id, ids AS t FROM enc2),
sliced AS (
  SELECT p.seq_id, p.seq_pos, p.n_toks,
         CASE WHEN p.tok_end = len(t)
                   AND p.seq_pos + p.n_toks < {PACK8_LEN}
              THEN list_concat(
                     list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                                CAST(p.tok_end AS INTEGER)),
                     [CAST(-1 AS BIGINT)])
              ELSE list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                              CAST(p.tok_end AS INTEGER)) END AS piece
  FROM plan p JOIN tk USING (doc_id))
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       array_to_string(flatten(list(piece ORDER BY seq_pos)), ' ')
         AS ids_str
FROM sliced GROUP BY seq_id"""
