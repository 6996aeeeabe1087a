"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: the ER meta-blocking spine + one representative of each
# extension family (dedup, ANN, text, events, relational)
HEADLINE = [
    "er_token_blocks",
    "er_block_filtering",
    "er_cbs_edges",
    "er_wnp_cbs_avg_or",
    "er_cep_cbs",
    "er_cluster_blocks",
    "gspsn",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "text_token_stats",
    "text_quality",
    "events_sessionize",
    "events_hourly",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5ish",
]


def main():
    from sparker_spark.entry import QUERIES
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="sparker_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch session costs
    QUERIES["tpch_q1"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        n = fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
