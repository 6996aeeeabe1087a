"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``sparker_spark`` package; this module is
the thin registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full dirty-ER
    meta-blocking pipeline (shingle blocking -> CBS edge weighting ->
    weighted node pruning) over the documents table."""
    from sparker_spark.entry import QUERIES

    return QUERIES["er_wnp_cbs_avg_or"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparker_spark.entry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparker_spark.entry import build_oracles

    return build_oracles()
