"""Round-3 entry-surface additions.

``dedup_cc_clusters`` — the missing last stage of the near-dup dedup
flow: MinHash-LSH pair relation -> distributed connected components ->
one canonical doc per dup group (graph.py). The reference's only
transitive-closure code is the driver-side union-find over attribute
clusters (python/sparker/attribute_clustering.py:117-135); this is the
billions-of-nodes counterpart, oracle-checked against a DuckDB
recursive-CTE closure over the identical pair relation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparker_spark.graph import ConnectedComponents


def q_dedup_cc_clusters(spark, sf_dir):
    from sparker_spark.entry import (
        JACCARD_T,
        MINHASH_BANDS,
        MINHASH_K,
        SHINGLE,
        load,
    )
    from sparker_spark.llm.dedup import Dedup

    docs = load(spark, sf_dir, "documents")
    pairs = Dedup.minhash_lsh_pairs(
        docs, MINHASH_K, MINHASH_BANDS, SHINGLE, JACCARD_T
    )
    return ConnectedComponents.canonical_groups(pairs).select(
        F.col("node").alias("doc_id"),
        "component",
        "cluster_size",
        "is_canonical",
    )


def _o_dedup_cc_clusters() -> str:
    from sparker_spark.entry import _o_dedup_minhash

    return f"""WITH RECURSIVE edges AS (
{_o_dedup_minhash()}
),
und AS (SELECT p1 AS u, p2 AS v FROM edges
        UNION SELECT p2 AS u, p1 AS v FROM edges),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM und
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.u
),
comp AS (SELECT u, min(r) AS component FROM reach GROUP BY u),
sizes AS (SELECT component, count(*) AS cluster_size
          FROM comp GROUP BY component)
SELECT comp.u AS doc_id, comp.component, sizes.cluster_size,
       comp.u = comp.component AS is_canonical
FROM comp JOIN sizes USING (component)"""


def r3_queries() -> dict:
    return {"dedup_cc_clusters": q_dedup_cc_clusters}


def r3_oracles() -> dict:
    return {"dedup_cc_clusters": _o_dedup_cc_clusters()}
