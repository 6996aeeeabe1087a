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


# ====================================================================
# as-of join over the events table: for every click, the latest
# prior-or-equal view by the same user (asof.py — union + keyed window,
# one shuffle). The oracle uses the identical ANSI window formulation.
# ====================================================================
def q_events_asof(spark, sf_dir):
    from sparker_spark.asof import AsofJoin
    from sparker_spark.entry import _load_events

    ev = _load_events(spark, sf_dir)
    clicks = ev.where("event_type = 'click'").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.where("event_type = 'view'").select(
        "user_id", "event_id", "ts", "value"
    )
    out = AsofJoin.asof_join(
        clicks, views, on="user_id", right_prefix="view_",
        right_tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.col("view_event_id"),
        F.col("view_ts"),
        F.col("view_value"),
        (
            F.unix_micros("ts") - F.unix_micros("view_ts")
        ).alias("gap_us"),
    )


O_EVENTS_ASOF = """
WITH clicks AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
views AS (
  SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'view'),
u AS (
  SELECT user_id, ts AS _ts, 1 AS _side, event_id, ts, value,
         NULL::BIGINT AS v_event_id, NULL::TIMESTAMP AS v_ts,
         NULL::DOUBLE AS v_value
  FROM clicks
  UNION ALL
  SELECT user_id, ts, 0, NULL, NULL, NULL, event_id, ts, value FROM views),
c AS (
  SELECT user_id, event_id, ts, value, _side,
         last_value(v_event_id IGNORE NULLS) OVER w AS view_event_id,
         last_value(v_ts IGNORE NULLS) OVER w AS view_ts,
         last_value(v_value IGNORE NULLS) OVER w AS view_value
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _side, v_event_id
               ROWS UNBOUNDED PRECEDING))
SELECT user_id, event_id, ts, value, view_event_id, view_ts, view_value,
       epoch_us(ts) - epoch_us(view_ts) AS gap_us
FROM c WHERE _side = 1"""


def r3_queries() -> dict:
    return {
        "dedup_cc_clusters": q_dedup_cc_clusters,
        "events_asof": q_events_asof,
    }


def r3_oracles() -> dict:
    return {
        "dedup_cc_clusters": _o_dedup_cc_clusters(),
        "events_asof": O_EVENTS_ASOF,
    }
