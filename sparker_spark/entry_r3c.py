"""Round-3 graded-query additions (third batch).

  * ``split_assign`` — deterministic hash-bucketed train/val/test
    split (llm/sampling.py): pure function of the doc key, stable
    under repartitioning/re-ingestion, replayed bit-for-bit by the
    DuckDB oracle through the shared md5 hash-coordinate expression.
  * ``dedup_embedding_srp`` — signed-random-projection LSH near-dup
    over the embedding column (llm/dedup.py embedding_srp_pairs): the
    banded-equi-join scale path for the O(n²) exact cosine baseline;
    the oracle regenerates the identical seeded hyperplanes and
    replays signature -> bands -> candidates -> exact-cosine verify.
  * ``quantiles_event_value`` — exact distributed per-group quantiles
    (stats.py): Spark's linear-interpolation percentile vs DuckDB's
    quantile_cont, bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = 7
SRP_BITS = 16
SRP_BANDS = 4
SRP_T = 0.35
SRP_SEED = 1234
QUANTS = [0.5, 0.9, 0.95, 0.99]


# ------------------------------------------------- deterministic split
def q_split_assign(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.llm.sampling import Sampling

    docs = load(spark, sf_dir, "documents")
    return Sampling.split(
        docs, "doc_id", SPLIT_WEIGHTS, seed=SPLIT_SEED
    ).select("doc_id", "split")


def _o_split_assign() -> str:
    from sparker_spark.llm.sampling import Sampling

    case = Sampling.split_case_sql("doc_id", SPLIT_WEIGHTS, seed=SPLIT_SEED)
    return f"SELECT doc_id, {case} AS split FROM documents"


# ------------------------------------------------- SRP embedding LSH
def q_dedup_embedding_srp(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.llm.dedup import Dedup

    emb = load(spark, sf_dir, "embeddings")
    return Dedup.embedding_srp_pairs(
        emb, bits=SRP_BITS, bands=SRP_BANDS, threshold=SRP_T, seed=SRP_SEED
    )


def _o_dedup_embedding_srp(dim: int = 64) -> str:
    from sparker_spark.llm.dedup import Dedup

    planes = Dedup.srp_hyperplanes(dim, SRP_BITS, SRP_SEED)
    rows = SRP_BITS // SRP_BANDS
    bit_cols = ",\n       ".join(
        "CASE WHEN list_dot_product(emb, [%s]::DOUBLE[]) >= 0 THEN 1 ELSE 0 END AS b_%d"
        % (", ".join(repr(x) for x in planes[j]), j)
        for j in range(SRP_BITS)
    )
    band_cols = ",\n       ".join(
        "concat_ws('_', %d, %s) AS band_%d"
        % (bi, ", ".join(f"b_{bi * rows + r}" for r in range(rows)), bi)
        for bi in range(SRP_BANDS)
    )
    bucket_union = " UNION ALL ".join(
        f"SELECT vec_id, band_{bi} AS bucket FROM banded"
        for bi in range(SRP_BANDS)
    )
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm
  FROM embeddings),
sig AS (SELECT vec_id,
       {bit_cols}
FROM v),
banded AS (SELECT vec_id,
       {band_cols}
FROM sig),
buckets AS ({bucket_union}),
cand AS (SELECT DISTINCT a.vec_id AS p1, b.vec_id AS p2
         FROM buckets a JOIN buckets b USING (bucket)
         WHERE a.vec_id < b.vec_id)
SELECT cand.p1, cand.p2,
       round(list_dot_product(v1.emb, v2.emb) / (v1.norm * v2.norm), 6) AS cosine
FROM cand JOIN v v1 ON cand.p1 = v1.vec_id JOIN v v2 ON cand.p2 = v2.vec_id
WHERE round(list_dot_product(v1.emb, v2.emb) / (v1.norm * v2.norm), 6) >= {SRP_T}"""


# ------------------------------------------------- exact group quantiles
def q_quantiles_event_value(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.stats import GroupStats

    ev = load(spark, sf_dir, "events")
    return GroupStats.quantiles(ev, ["event_type"], "value", QUANTS)


def _o_quantiles_event_value() -> str:
    cols = ",\n       ".join(
        "round(quantile_cont(value, %r), 6) AS q_%s"
        % (float(q), str(q).replace("0.", "").replace(".", "_"))
        for q in QUANTS
    )
    return f"""
SELECT event_type, count(value) AS n,
       {cols}
FROM events GROUP BY event_type"""


def r3c_queries() -> dict:
    return {
        "split_assign": q_split_assign,
        "dedup_embedding_srp": q_dedup_embedding_srp,
        "quantiles_event_value": q_quantiles_event_value,
        "er_incremental_delta": q_er_incremental_delta,
        "attr_profile": q_attr_profile,
    }


def r3c_oracles() -> dict:
    return {
        "split_assign": _o_split_assign(),
        "dedup_embedding_srp": _o_dedup_embedding_srp(),
        "quantiles_event_value": _o_quantiles_event_value(),
        "er_incremental_delta": _o_er_incremental_delta(),
        "attr_profile": _o_attr_profile(),
    }


# ------------------------------------------------- incremental blocking
# Registered past the grading window (the 50 slots hold each operator's
# primary query); verified by tools/check_entry.py and the
# delta-vs-full-re-block tests.
INC_CAP = 100


def q_er_incremental_delta(spark, sf_dir):
    from sparker_spark.blocking.incremental import IncrementalBlocking
    from sparker_spark.entry import _doc_keys_unigram

    keys = _doc_keys_unigram(spark, sf_dir)
    old = keys.where("profile_id % 10 != 0")
    new = keys.where("profile_id % 10 = 0")
    return IncrementalBlocking.delta_cbs_edges(old, new, max_block_size=INC_CAP)


def _o_er_incremental_delta() -> str:
    from sparker_spark.entry import DUCK_UNIGRAM_KEYS

    return f"""WITH {DUCK_UNIGRAM_KEYS.strip()},
sizes AS (SELECT key, count(*) AS bs FROM keys GROUP BY key),
kept AS (SELECT k.profile_id, k.key FROM keys k JOIN sizes s USING (key)
         WHERE s.bs <= {INC_CAP}),
new AS (SELECT * FROM kept WHERE profile_id % 10 = 0)
SELECT least(n.profile_id, a.profile_id) AS p1,
       greatest(n.profile_id, a.profile_id) AS p2,
       CAST(count(DISTINCT n.key) AS DOUBLE) AS cbs
FROM new n JOIN kept a USING (key)
WHERE n.profile_id <> a.profile_id
GROUP BY 1, 2"""


# ------------------------------------------------- attribute profiling
def q_attr_profile(spark, sf_dir):
    from sparker_spark.entry_ext import _customer_eav
    from sparker_spark.profiling import AttributeProfile

    return AttributeProfile.summary(_customer_eav(spark, sf_dir))


def _o_attr_profile() -> str:
    from sparker_spark.entry_ext import DUCK_CUST_EAV

    return f"""WITH {DUCK_CUST_EAV.strip()},
cleaned AS (SELECT CAST(source_id AS INTEGER) AS source_id, attr, value
            FROM eav WHERE value IS NOT NULL AND trim(value) <> ''),
hist AS (SELECT source_id, attr, value, count(*) AS c,
                sum(length(value)) AS len_sum
         FROM cleaned GROUP BY 1, 2, 3)
SELECT source_id, attr, CAST(sum(c) AS BIGINT) AS n_values, count(*) AS n_distinct,
       round(CAST(sum(len_sum) AS DOUBLE) / sum(c), 6) AS avg_len,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS entropy
FROM hist GROUP BY 1, 2"""
