"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for correctness tests on local[*] but every knob is
the one you would also set on a 1000-executor cluster: AQE on (runtime
join-strategy switch + skew-join splitting — token blocks are Zipfian,
see reference old_versions/.../Utilities/CustomPartitioner.scala:9-56
which hand-rolled what AQE now does), Arrow on for the few pandas-UDF
paths, and a shuffle-partition count that AQE coalesces downward.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparker_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else 32),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # local-mode driver == the single executor JVM. Default stays
        # small: sessions start fast, and measured suite times at sf0.1
        # are *better* than with a 48g heap (bigger heap = longer minor
        # GC pauses, no spill avoided at this scale). Callers that do
        # need more can export SPARK_DRIVER_MEMORY.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "4g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
