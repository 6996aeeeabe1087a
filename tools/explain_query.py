"""Capture .explain("formatted") for registry queries / bench pipelines.

Usage: python tools/explain_query.py <out_dir> <query> [query ...]

Writes <out_dir>/<query>.txt with the formatted physical plan of the
DataFrame the query returns (for pipelines with internal actions the
final relation's plan; internal stage plans are in the per-operator
modules' docstrings). Honors $SPARK_GRAFT_SF_DIR (default sf0.01 — the
plan SHAPE is scale-independent; only AQE runtime stats differ).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_dir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(out_dir, exist_ok=True)

    from sparker_spark.entry import QUERIES
    from sparker_spark.session import get_spark

    spark = get_spark(app_name="explain_query", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    for name in names:
        if name in QUERIES:
            fn = QUERIES[name]
        elif name in bench.PIPELINES:
            fn = bench.PIPELINES[name]
        else:
            print(f"SKIP {name}: not in registry or bench pipelines")
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
