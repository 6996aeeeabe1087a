"""Round-3 graded-query additions (second batch).

Six queries that bring every operator landed this round under the
driver's DuckDB oracle gate:

  * ``er_all_weight_edges`` — ONE row covering all six meta-blocking
    weight types (weights.py all_weights): each output column equals
    the corresponding ``er_*_edges`` single-weight query (those stay
    registered past the grading window; their per-weight formulas are
    value-hashed here every round via the cbs/js/ecbs/log_arcs/chi2/ejs
    columns).
  * ``range_join_events`` — the general banded range join
    (rangejoin.py): click↔view pairs of the same user within an hour.
  * ``countmin_users`` — count-min sketch build + distributed point
    estimates (sketches.py) with the engine-portable md5-affine hash
    family so DuckDB replays the identical d×w counter table.
  * ``rollup_day`` — hypertable rollup cascade (rollup.py): the graded
    day level is re-aggregated FROM the hour level, never from raw
    events; the oracle checks it against direct day aggregation, which
    the cascade must equal exactly for decomposable aggregates.
  * ``bm25_search`` — Okapi BM25 ranked retrieval (llm/search.py);
    scoring templates are shared verbatim between both engines.
  * ``dedup_minhash_lsh_cross`` — MinHash-LSH near-dup in cross-source
    mode (llm/dedup.py source_col): only cross-crawl pairs, the
    "which docs in the new crawl near-dup the old crawl" shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparker_spark.rounding import rnd

# range join: same-user click/view pairs within this many microseconds
RJ_RADIUS_US = 3_600_000_000  # 1 hour
# count-min sketch shape: small width so bucket collisions actually
# occur at sf0.1 (1500 users) and the oracle exercises real CM
# overestimates, not a trivially-exact table
CM_WIDTH = 64
CM_DEPTH = 4
CM_SEED = 4321
BM25_QUERY = "spark hash join window dup"
BM25_K = 20


# ------------------------------------------------- all-weights edges
def q_er_all_weight_edges(spark, sf_dir):
    from sparker_spark.entry import _shingle_blocks
    from sparker_spark.metablocking.weights import EdgeWeighting

    blocks, pb = _shingle_blocks(spark, sf_dir)
    e = EdgeWeighting.all_weights(blocks, pb)
    return e.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("p1"),
        F.col("dst").alias("p2"),
        F.col("cbs").cast("long").alias("cbs"),
        rnd("js", 6).alias("js"),
        rnd("ecbs", 6).alias("ecbs"),
        rnd("log_arcs", 6).alias("log_arcs"),
        rnd("chi2", 6).alias("chi2"),
        rnd("ejs", 6).alias("ejs"),
    )


def _o_er_all_weight_edges() -> str:
    from sparker_spark.entry import (
        DUCK_DIRTY_BLOCKS,
        DUCK_DIRTY_GRAPH,
        DUCK_SHINGLE_KEYS,
        _duck_weight_expr,
    )
    from sparker_spark.metablocking.pruning_utils import WeightTypes

    eps = "0.00000000001"
    ejs = f"""CASE WHEN (e2.e_cnt * log10((SELECT E FROM etotal) / (e1.e_cnt + {eps}))) > 0
       THEN (cbs / (src_blocks + dst_blocks - cbs))
            * log10((SELECT E FROM etotal) /
                    (e2.e_cnt * log10((SELECT E FROM etotal) / (e1.e_cnt + {eps}))))
       ELSE 0.0 END"""
    return f"""WITH {DUCK_SHINGLE_KEYS.strip()}, {DUCK_DIRTY_BLOCKS.strip()}, {DUCK_DIRTY_GRAPH.strip()},
nblocks AS (SELECT count(*) AS b FROM blocks),
estats AS (SELECT src AS pid, CAST(count(*) AS DOUBLE) AS e_cnt FROM co GROUP BY src),
etotal AS (SELECT CAST(count(*) AS DOUBLE) AS E FROM co WHERE src < dst)
SELECT g.src AS p1, g.dst AS p2, CAST(cbs AS BIGINT) AS cbs,
       round(cbs / (src_blocks + dst_blocks - cbs), 6) AS js,
       round({_duck_weight_expr(WeightTypes.ECBS)}, 6) AS ecbs,
       round(ln(cbs) - src_logden, 6) AS log_arcs,
       round({_duck_weight_expr(WeightTypes.CHI_SQUARE)}, 6) AS chi2,
       round({ejs}, 6) AS ejs
FROM g JOIN estats e1 ON g.src = e1.pid JOIN estats e2 ON g.dst = e2.pid
WHERE g.src < g.dst"""


# ------------------------------------------------- banded range join
def q_range_join_events(spark, sf_dir):
    from sparker_spark.entry import _load_events
    from sparker_spark.rangejoin import RangeJoin

    ev = _load_events(spark, sf_dir)
    clicks = ev.where("event_type = 'click'").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("val"),
    )
    views = ev.where("event_type = 'view'").select(
        "user_id", "event_id", F.unix_micros("ts").alias("val")
    )
    out = RangeJoin.within(
        clicks, views, on="user_id", radius=RJ_RADIUS_US, right_prefix="v_"
    )
    return out.select(
        "user_id",
        "click_id",
        F.col("v_event_id").alias("view_id"),
        (F.col("val") - F.col("v_val")).alias("delta_us"),
    )


O_RANGE_JOIN_EVENTS = f"""
WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS val
           FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, event_id, epoch_us(ts) AS val
      FROM events WHERE event_type = 'view')
SELECT c.user_id, c.click_id, v.event_id AS view_id, c.val - v.val AS delta_us
FROM c JOIN v USING (user_id)
WHERE abs(c.val - v.val) <= {RJ_RADIUS_US}"""


# ------------------------------------------------- count-min sketch
def q_countmin_users(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.sketches import CountMinSketch

    ev = load(spark, sf_dir, "events")
    sk = CountMinSketch.build(
        ev, "user_id", width=CM_WIDTH, depth=CM_DEPTH, seed=CM_SEED, portable=True
    )
    est = CountMinSketch.estimate(
        sk,
        ev.select("user_id").distinct(),
        "user_id",
        width=CM_WIDTH,
        depth=CM_DEPTH,
        seed=CM_SEED,
        portable=True,
    )
    return est.select("user_id", F.col("estimate").cast("long").alias("estimate"))


def _o_countmin_users() -> str:
    from sparker_spark.llm.hashing import minhash_coefficients
    from sparker_spark.sketches import _portable_h31, portable_bucket_sql

    coeffs = minhash_coefficients(CM_DEPTH, CM_SEED)
    h31 = _portable_h31("user_id", "duck")
    cell_rows = "\n  UNION ALL ".join(
        f"SELECT {j} AS j, {portable_bucket_sql(coeffs[j], CM_WIDTH, 'h31')} AS bucket FROM vals"
        for j in range(CM_DEPTH)
    )
    probe_rows = "\n  UNION ALL ".join(
        f"SELECT user_id, {j} AS j, {portable_bucket_sql(coeffs[j], CM_WIDTH, 'h31')} AS bucket FROM du"
        for j in range(CM_DEPTH)
    )
    return f"""
WITH vals AS (SELECT {h31} AS h31 FROM events),
cells AS (
  SELECT j, bucket, count(*) AS n FROM (
  {cell_rows}
  ) GROUP BY 1, 2),
du AS (SELECT DISTINCT user_id, {h31} AS h31 FROM events),
probes AS (
  {probe_rows}
)
SELECT p.user_id, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS estimate
FROM probes p LEFT JOIN cells c USING (j, bucket)
GROUP BY p.user_id"""


# ------------------------------------------------- rollup cascade
def q_rollup_day(spark, sf_dir):
    from sparker_spark.entry import _load_events
    from sparker_spark.rollup import RollupCascade

    # value carried as exact DECIMAL through the cascade so hour->day
    # re-aggregation is addition-order independent (same policy as
    # events_hourly)
    ev = _load_events(spark, sf_dir).withColumn(
        "value", F.col("value").cast("decimal(18,2)")
    )
    day = RollupCascade.cascade(ev, ["hour", "day"], dims=["event_type"])["day"]
    return day.select(
        F.col("bucket").alias("day"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        rnd(F.col("sum_value").cast("double"), 4).alias("sum_value"),
        rnd(F.col("min_value").cast("double"), 4).alias("min_value"),
        rnd(F.col("max_value").cast("double"), 4).alias("max_value"),
        rnd(F.col("sum_value").cast("double") / F.col("n_events"), 4).alias(
            "avg_value"
        ),
    )


O_ROLLUP_DAY = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_value,
       round(CAST(min(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS min_value,
       round(CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS max_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_value
FROM events GROUP BY 1, 2"""


# ------------------------------------------------- BM25 retrieval
def q_bm25_search(spark, sf_dir):
    from sparker_spark.entry import load
    from sparker_spark.llm.search import TextSearch

    return TextSearch.bm25(load(spark, sf_dir, "documents"), BM25_QUERY, k=BM25_K)


def _o_bm25_search() -> str:
    from sparker_spark.llm.search import IDF_SQL, W_SQL

    terms = sorted({t for t in BM25_QUERY.lower().split() if t})
    in_list = ", ".join(f"'{t}'" for t in terms)
    n_sql = "(SELECT n FROM stats)"
    idf = IDF_SQL.format(n=n_sql)
    w = W_SQL.format(k1="1.2e0", b="0.75e0", n=n_sql, sumdl="(SELECT sumdl FROM stats)")
    return f"""
WITH t AS (SELECT doc_id, tok FROM (
             SELECT doc_id,
                    unnest(regexp_split_to_array(lower(text), '[^0-9a-z_]+')) AS tok
             FROM documents) WHERE tok <> ''),
dl AS (SELECT doc_id, count(*) AS dlen FROM t GROUP BY doc_id),
stats AS (SELECT count(*) AS n, sum(dlen) AS sumdl FROM dl),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t
       WHERE tok IN ({in_list}) GROUP BY 1, 2),
df_ AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
idf AS (SELECT tok, {idf} AS idf FROM df_),
contrib AS (SELECT tf.doc_id, {w} AS w
            FROM tf JOIN idf USING (tok) JOIN dl ON tf.doc_id = dl.doc_id),
scored AS (SELECT doc_id,
                  CAST(sum(CAST(round(w, 6) AS DECIMAL(18,6))) AS DOUBLE) AS score
           FROM contrib GROUP BY doc_id)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored ORDER BY score DESC, doc_id LIMIT {BM25_K}"""


# ------------------------------------------------- cross-source LSH
def q_dedup_minhash_lsh_cross(spark, sf_dir):
    from sparker_spark.entry import (
        JACCARD_T,
        MINHASH_BANDS,
        MINHASH_K,
        SHINGLE,
        load,
    )
    from sparker_spark.llm.dedup import Dedup

    # synthetic two-crawl split: odd/even doc ids
    docs = load(spark, sf_dir, "documents").withColumn(
        "crawl", (F.col("doc_id") % 2).cast("int")
    )
    return Dedup.minhash_lsh_pairs(
        docs, MINHASH_K, MINHASH_BANDS, SHINGLE, JACCARD_T, source_col="crawl"
    )


def _o_dedup_minhash_lsh_cross() -> str:
    # same signatures/bands/verification as the graded within-corpus
    # oracle; cross-source mode only FILTERS candidate pairs, so the
    # result is the within-corpus pair set restricted to odd/even pairs
    from sparker_spark.entry import _o_dedup_minhash

    return f"""SELECT * FROM (
{_o_dedup_minhash()}
) WHERE p1 % 2 <> p2 % 2"""


def r3b_queries() -> dict:
    return {
        "er_all_weight_edges": q_er_all_weight_edges,
        "range_join_events": q_range_join_events,
        "countmin_users": q_countmin_users,
        "rollup_day": q_rollup_day,
        "bm25_search": q_bm25_search,
        "dedup_minhash_lsh_cross": q_dedup_minhash_lsh_cross,
    }


def r3b_oracles() -> dict:
    return {
        "er_all_weight_edges": _o_er_all_weight_edges(),
        "range_join_events": O_RANGE_JOIN_EVENTS,
        "countmin_users": _o_countmin_users(),
        "rollup_day": O_ROLLUP_DAY,
        "bm25_search": _o_bm25_search(),
        "dedup_minhash_lsh_cross": _o_dedup_minhash_lsh_cross(),
    }
