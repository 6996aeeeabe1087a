"""Round-11 registry additions — the PRODUCTION semantic-dedup scale
mode under the value-hash gate.

Two new gated queries close the round-10 verdict's one weak scale
posture (SemanticDedup's N^1.5 candidate volume at sqrt-N cells):

* ``dedup_semantic_prod`` — bounded-cell-size sizing
  (``target_cell_size=k`` ⇒ cells ≈ N/k ⇒ candidate volume ≈ N·k,
  LINEAR — SemDeDup's constant-size clusters, Abbas et al. 2023). The
  cell count is DATA-DEPENDENT, so the oracle recomputes it from
  count(*) in SQL with the same floor(log2(N/k)+0.5) rule and selects
  the matching PREFIX of the seeded hyperplanes (plane j is a pure
  function of (dim, seed, j) — more cells only APPEND planes, so one
  12-plane literal table serves every corpus size the gates see).
* ``dedup_semantic_margin`` — the margin-pruned multi-probe sibling:
  a vector fans out to its upward Hamming-1 neighbor cell on plane j
  only when it actually sits NEAR plane j (rounded |proj_j|/norm <
  probe_margin); only boundary vectors can gain recall from probing,
  so the pruned variant keeps the recall at a fraction of the
  candidate volume (measured in bench_semdedup_prod.json).

Both reuse SEM_T and the (dim=64, seed=1234) constants of the round-10
semantic gates, so the plane construction stays pinned in one place.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity w/ peers)

from sparker_spark.entry_r10 import SEM_T

# production target cell size for the gated query: small enough that
# the DRIVER's grading SF (sf0.01, 500 vectors) exercises a
# DIFFERENT, data-derived cell count (500/8 -> 64 cells) than the
# pinned-16 round-10 gates — the sizing rule itself is under the gate
SEM_PROD_TARGET = 8
# margin for the pruned multi-probe gate: wide enough that boundary
# expansions actually occur at the gate SFs (verified: the pair set
# differs from both the home-only and the full Hamming-1 variants)
SEM_MARGIN = 0.2
# the oracle embeds this many plane literals; prefix-selected by the
# data-dependent bit count (covers corpora up to ~8 * 2^12 vectors —
# far past every gate SF)
_MAX_BITS = 12


def _planes_sql(bits: int) -> list[str]:
    """DuckDB list literals for the first ``bits`` seeded hyperplanes
    (identical construction to IVFIndex._planes — one rng stream, so
    plane j is the same for every cell count)."""
    import random

    from sparker_spark.entry_ext import IVF_DIM, IVF_SEED

    rng = random.Random(IVF_SEED)
    return [
        "[" + ", ".join(repr(rng.gauss(0.0, 1.0)) for _ in range(IVF_DIM)) + "]"
        for _ in range(bits)
    ]


def _cc_tail_sql() -> str:
    """The shared recursive-CTE connected-components tail over a
    ``sedges(p1, p2)`` relation and the ``v(vec_id, ...)`` node set —
    identical to the round-10 semantic oracles."""
    return """
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


# ------------------------------------- bounded-cell-size (production)
def q_dedup_semantic_prod(spark, sf_dir):
    """SemanticDedup in its PRODUCTION sizing: target_cell_size ⇒
    cells ≈ N/k ⇒ linear total candidate volume (the scale mode the
    round-10 verdict asked for). The cell count is derived from the
    corpus by cells_for_target (floor(log2(N/k)+0.5), power of two,
    clamped) — value-hash-gated against an oracle that recomputes the
    SAME count from count(*) in SQL and replays the matching plane
    prefix."""
    from sparker_spark.entry import load
    from sparker_spark.entry_ext import IVF_SEED
    from sparker_spark.llm.dedup import SemanticDedup

    return SemanticDedup.dedup(
        load(spark, sf_dir, "embeddings"),
        SEM_T,
        seed=IVF_SEED,
        target_cell_size=SEM_PROD_TARGET,
    )


def _o_dedup_semantic_prod() -> str:
    planes = _planes_sql(_MAX_BITS)
    projs = ",\n         ".join(
        f"list_dot_product(emb, {p}) AS pj{j}" for j, p in enumerate(planes)
    )
    cell = " + ".join(
        f"CASE WHEN {j} < bits AND pj{j} > 0 THEN {2**j} ELSE 0 END"
        for j in range(_MAX_BITS)
    )
    return f"""
WITH RECURSIVE v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS norm
  FROM embeddings),
bsel AS (
  SELECT LEAST({_MAX_BITS}, GREATEST(4,
           CAST(floor(log2(GREATEST(1.0,
                  CAST(count(*) AS DOUBLE) / {float(SEM_PROD_TARGET)}))
                + 0.5) AS INT))) AS bits
  FROM v),
vp AS MATERIALIZED (
  SELECT vec_id, emb, norm,
         {projs}
  FROM v),
vc AS MATERIALIZED (
  SELECT vec_id, emb, norm, ({cell}) AS cell FROM vp, bsel),
sedges AS (
  SELECT a.vec_id AS p1, b.vec_id AS p2
  FROM vc a JOIN vc b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6)
        >= {SEM_T}),
{_cc_tail_sql().strip()}"""


# ------------------------------------------ margin-pruned multi-probe
def q_dedup_semantic_margin(spark, sf_dir):
    """The margin-pruned multi-probe sibling of dedup_semantic_probe1
    (pinned 16 cells so the two are directly comparable): expansion
    along plane j only for vectors within SEM_MARGIN of plane j
    (rounded |proj_j|/norm). Recall concentrates on boundary vectors,
    so the pruned fan-out keeps the cross-cell pairs that matter at a
    fraction of the candidates."""
    from sparker_spark.entry import load
    from sparker_spark.entry_ext import IVF_CELLS, IVF_SEED
    from sparker_spark.llm.dedup import SemanticDedup

    return SemanticDedup.dedup(
        load(spark, sf_dir, "embeddings"),
        SEM_T,
        num_cells=IVF_CELLS,
        seed=IVF_SEED,
        multi_probe="margin",
        probe_margin=SEM_MARGIN,
    )


def _o_dedup_semantic_margin() -> str:
    from sparker_spark.entry_ext import IVF_CELLS

    bits = IVF_CELLS.bit_length() - 1
    planes = _planes_sql(bits)
    projs = ",\n         ".join(
        f"list_dot_product(emb, {p}) AS pj{j}" for j, p in enumerate(planes)
    )
    cell = " + ".join(
        f"CASE WHEN pj{j} > 0 THEN {2**j} ELSE 0 END" for j in range(bits)
    )
    # engine semantics: vector u expands UPWARD along bit j (its bit
    # is 0) iff rounded |proj_j|/norm < margin; a Hamming-1 pair is
    # therefore compared iff the LOWER vector on the differing bit
    # passes the margin test
    cross = "\n   OR ".join(
        f"(xor(a.cell, b.cell) = {1 << j} AND "
        f"CASE WHEN (a.cell & {1 << j}) = 0 "
        f"THEN round(abs(a.pj{j}) / a.norm, 6) "
        f"ELSE round(abs(b.pj{j}) / b.norm, 6) END < {SEM_MARGIN})"
        for j in range(bits)
    )
    return f"""
WITH RECURSIVE v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x))) AS norm
  FROM embeddings),
vc AS MATERIALIZED (
  SELECT vec_id, emb, norm,
         {projs}
  FROM v),
vcc AS MATERIALIZED (
  SELECT *, ({cell}) AS cell FROM vc),
sedges AS (
  SELECT a.vec_id AS p1, b.vec_id AS p2
  FROM vcc a JOIN vcc b
    ON a.vec_id < b.vec_id
   AND (a.cell = b.cell
   OR {cross})
  WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6)
        >= {SEM_T}),
{_cc_tail_sql().strip()}"""


# ----------------------------------- order-5 interpolated LM (KenLM)
def _o_text_lm5_logprob() -> str:
    """DuckDB replay of LanguageModelScore.interpolated_logprob(n=5):
    the same lag-column position relation, one count CTE per order
    with context sums on the COUNT tables, and the identical nested
    JM combination — arithmetic shapes match the Spark expression
    tree exactly so doubles agree bit-for-bit before the 6-dp
    round."""
    lam = 0.5  # LanguageModelScore.JM_LAMBDA
    lags = ",\n         ".join(
        ["t[i] AS w0"]
        + [
            f"CASE WHEN i > {j} THEN t[i - {j}] END AS w{j}"
            for j in range(1, 5)
        ]
    )
    parts = []
    for k in range(2, 6):
        cols = ", ".join(f"w{j}" for j in range(k - 1, -1, -1))
        ctx = ", ".join(f"w{j}" for j in range(k - 1, 0, -1))
        parts.append(
            f"g{k} AS (SELECT {cols}, CAST(count(*) AS DOUBLE) AS cg\n"
            f"      FROM pos WHERE w{k - 1} IS NOT NULL GROUP BY {cols}),\n"
            f"x{k} AS (SELECT {ctx}, sum(cg) AS cc FROM g{k} GROUP BY {ctx}),\n"
            f"m{k} AS (SELECT {', '.join('g' + str(k) + '.w' + str(j) for j in range(k - 1, -1, -1))},"
            f" cg / cc AS ml{k}\n"
            f"      FROM g{k} JOIN x{k} USING ({ctx}))"
        )
        # JM nesting, innermost first
    comb = "p1.p1"
    for k in range(2, 6):
        comb = f"{lam} * m{k}.ml{k} + {1.0 - lam} * ({comb})"
    joins = "\n  ".join(
        f"JOIN m{k} USING ({', '.join('w' + str(j) for j in range(k - 1, -1, -1))})"
        for k in range(2, 6)
    )
    return f"""
WITH d AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         x -> len(x) > 0) AS t
      FROM documents),
sc AS (SELECT CAST(count(*) AS DOUBLE) AS tt,
              CAST(count(DISTINCT tok) AS DOUBLE) AS vs
       FROM (SELECT unnest(t) AS tok FROM d)),
pos AS (
  SELECT doc_id,
         {lags}
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM d WHERE len(t) >= 1)),
p1 AS (SELECT w0,
              (CAST(count(*) AS DOUBLE) + 1.0)
              / ((SELECT tt FROM sc) + (SELECT vs FROM sc)) AS p1
       FROM pos GROUP BY w0),
{",".join(parts)},
lp AS (
  SELECT pos.doc_id,
         CAST(round(ln({comb}), 6) AS DECIMAL(18,6)) AS lp
  FROM pos
  JOIN p1 USING (w0)
  {joins}
  WHERE pos.w4 IS NOT NULL)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM lp GROUP BY doc_id"""


# pruning constants for the gated pruned scorer: drop grams seen once
# at orders >= 3 (the CCNet/KenLM `--prune 0 0 1...` shape)
LM5_PRUNE_MIN = 2
LM5_PRUNE_FROM = 3


def _o_text_lm5_pruned_logprob() -> str:
    """DuckDB replay of interpolated_logprob(n=5, prune_min_count=2,
    prune_from=3): same pyramid as :func:`_o_text_lm5_logprob`, with
    KenLM's estimate-then-remove rule — per-order context sums on the
    UNPRUNED counts, ML tables filtered to cg >= 2 at orders >= 3,
    LEFT joins for the pruned orders and COALESCE(ml_k, 0) in the JM
    nest (stupid-backoff treatment of a pruned gram)."""
    lam = 0.5  # LanguageModelScore.JM_LAMBDA
    lags = ",\n         ".join(
        ["t[i] AS w0"]
        + [
            f"CASE WHEN i > {j} THEN t[i - {j}] END AS w{j}"
            for j in range(1, 5)
        ]
    )
    parts = []
    for k in range(2, 6):
        cols = ", ".join(f"w{j}" for j in range(k - 1, -1, -1))
        ctx = ", ".join(f"w{j}" for j in range(k - 1, 0, -1))
        pruned = k >= LM5_PRUNE_FROM
        keep = (
            f" WHERE cg >= {float(LM5_PRUNE_MIN)}" if pruned else ""
        )
        parts.append(
            f"g{k} AS (SELECT {cols}, CAST(count(*) AS DOUBLE) AS cg\n"
            f"      FROM pos WHERE w{k - 1} IS NOT NULL GROUP BY {cols}),\n"
            f"x{k} AS (SELECT {ctx}, sum(cg) AS cc FROM g{k} GROUP BY {ctx}),\n"
            f"m{k} AS (SELECT {', '.join('g' + str(k) + '.w' + str(j) for j in range(k - 1, -1, -1))},"
            f" cg / cc AS ml{k}\n"
            f"      FROM (SELECT * FROM g{k}{keep}) AS g{k} "
            f"JOIN x{k} USING ({ctx}))"
        )
    comb = "p1.p1"
    for k in range(2, 6):
        term = (
            f"COALESCE(m{k}.ml{k}, 0.0)"
            if k >= LM5_PRUNE_FROM
            else f"m{k}.ml{k}"
        )
        comb = f"{lam} * {term} + {1.0 - lam} * ({comb})"
    joins = "\n  ".join(
        ("LEFT JOIN" if k >= LM5_PRUNE_FROM else "JOIN")
        + f" m{k} USING ({', '.join('w' + str(j) for j in range(k - 1, -1, -1))})"
        for k in range(2, 6)
    )
    return f"""
WITH d AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                         x -> len(x) > 0) AS t
      FROM documents),
sc AS (SELECT CAST(count(*) AS DOUBLE) AS tt,
              CAST(count(DISTINCT tok) AS DOUBLE) AS vs
       FROM (SELECT unnest(t) AS tok FROM d)),
pos AS (
  SELECT doc_id,
         {lags}
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
        FROM d WHERE len(t) >= 1)),
p1 AS (SELECT w0,
              (CAST(count(*) AS DOUBLE) + 1.0)
              / ((SELECT tt FROM sc) + (SELECT vs FROM sc)) AS p1
       FROM pos GROUP BY w0),
{",".join(parts)},
lp AS (
  SELECT pos.doc_id,
         CAST(round(ln({comb}), 6) AS DECIMAL(18,6)) AS lp
  FROM pos
  JOIN p1 USING (w0)
  {joins}
  WHERE pos.w4 IS NOT NULL)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM lp GROUP BY doc_id"""


def q_text_lm5_pruned_logprob(spark, sf_dir):
    """The order-5 JM LM with KenLM-style COUNT PRUNING under the
    value-hash gate (llm/text.LanguageModelScore.interpolated_logprob
    prune_min_count=2, prune_from=3 — the CCNet `--prune 0 0 1` shape;
    Wenzek et al. 2020 / Heafield 2011). Pruning is what bounds 5-gram
    model state at corpus scale: singletons at orders 3..5 are removed
    after estimation, and a scored position whose gram was pruned
    backs off with ML_k = 0 (Brants et al. 2007). The oracle replays
    the whole pruned pyramid — filtered count tables, unpruned context
    sums, LEFT joins + COALESCE — in SQL."""
    from sparker_spark.entry import load
    from sparker_spark.llm.text import LanguageModelScore

    return LanguageModelScore.interpolated_logprob(
        load(spark, sf_dir, "documents"),
        5,
        prune_min_count=LM5_PRUNE_MIN,
        prune_from=LM5_PRUNE_FROM,
    )


def q_text_lm5_logprob(spark, sf_dir):
    """The order-5 Jelinek-Mercer interpolated corpus LM under the
    VALUE-HASH gate (llm/text.LanguageModelScore.interpolated_logprob)
    — the KenLM-faithful scorer the CCNet partition now runs on
    (Wenzek et al. 2020 score with a 5-gram KenLM). Every document's
    (n_grams, avg_logprob) value-checked against the full SQL replay
    (per-order count tables + nested JM combination)."""
    from sparker_spark.entry import load
    from sparker_spark.llm.text import LanguageModelScore

    return LanguageModelScore.interpolated_logprob(
        load(spark, sf_dir, "documents"), 5
    )


def r11_queries() -> dict:
    return {
        "dedup_semantic_prod": q_dedup_semantic_prod,
        "dedup_semantic_margin": q_dedup_semantic_margin,
        "text_lm5_logprob": q_text_lm5_logprob,
        "text_lm5_pruned_logprob": q_text_lm5_pruned_logprob,
    }


def r11_oracles() -> dict:
    return {
        "dedup_semantic_prod": _o_dedup_semantic_prod(),
        "dedup_semantic_margin": _o_dedup_semantic_margin(),
        "text_lm5_logprob": _o_text_lm5_logprob(),
        "text_lm5_pruned_logprob": _o_text_lm5_pruned_logprob(),
    }
