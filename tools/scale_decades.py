"""Two-decade scale sweep: run registry queries against sf0.1 and the
perf-only synthetic 10x / 100x slices (tools/gen_scale.py), reporting
wall time AND output rows per point so input scaling can be separated
from output scaling.

Usage:
  python tools/gen_scale.py /tmp/sparker_10x 10
  python tools/gen_scale.py /tmp/sparker_100x 100
  SPARK_DRIVER_MEMORY=32g python tools/scale_decades.py [query ...]

Only queries whose inputs are documents/events can run (the synthetic
slices carry just those two tables).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", "/tmp/sparker_10x"),
    ("100x", "/tmp/sparker_100x"),
]

DEFAULT_QUERIES = [
    # linear-output operators: wall time should grow ~linearly in input
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_token_stats",
    "bm25_search",
    "tfidf_top_terms",
    "events_sessionize",
    "funnel_conversion",
    "hll_users",
    "countmin_users",
    "pps_init",
    "pps_emit",
    "dedup_cc_clusters",
    # ER spine (shingle blocking -> CBS WNP): output grows with block
    # co-occurrence density, reported alongside rows
    "er_wnp_cbs_avg_or",
]


def main():
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    only = sys.argv[1:] or DEFAULT_QUERIES

    from sparker_spark.entry import QUERIES
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="scale_decades", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    results: dict[str, dict[str, dict]] = {}
    for name in only:
        fn = QUERIES[name]
        results[name] = {}
        for label, d in POINTS:
            if not os.path.exists(f"{d}/documents.parquet"):
                print(f"# skipping point {label}: {d} missing", file=sys.stderr)
                continue
            t0 = time.time()
            try:
                n = fn(spark, d).count()
                results[name][label] = {
                    "sec": round(time.time() - t0, 2),
                    "rows": n,
                }
            except Exception as exc:  # keep sweeping; report the failure
                results[name][label] = {
                    "sec": round(time.time() - t0, 2),
                    "error": str(exc).splitlines()[0][:200],
                }
            spark.catalog.clearCache()
            print(f"# {name} @ {label}: {results[name][label]}",
                  file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
