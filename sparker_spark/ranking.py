"""Scalable global ranking.

``row_number() OVER (ORDER BY ...)`` with no partition key collapses
the whole relation into ONE partition (Spark warns "No Partition
Defined for Window operation") — fine at test scale, fatal at 100 TB.

``global_rank`` produces the identical dense 0-based rank with a
distributed plan: range-repartition on the sort key (total order
across partitions), rank locally per partition, then add each
partition's cumulative row-count offset (a tiny driver-side list —
#partitions entries, same class of scalar as a purging threshold).

The result is bit-identical to the single-partition window for any
total ordering (ties impossible when the sort key set is unique per
row): range partition boundaries only decide WHERE a row is ranked,
never its rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame, cols: list[str], out: str = "pos", num_partitions: int | None = None
) -> DataFrame:
    """Add ``out`` = dense 0-based global rank of each row under
    ORDER BY *cols* (which must form a total order — make the last
    column a unique tiebreaker)."""
    key = [F.col(c) for c in cols]
    parts = df.repartitionByRange(*key) if num_partitions is None else (
        df.repartitionByRange(num_partitions, *key)
    )
    parts = parts.withColumn("_pid", F.spark_partition_id()).cache()
    counts = (
        parts.groupBy("_pid").agg(F.count("*").alias("_n")).orderBy("_pid").collect()
    )
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["_n"]
    off_map = F.create_map(
        *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
    )
    w = Window.partitionBy("_pid").orderBy(*key)
    return (
        parts.withColumn("_local", F.row_number().over(w) - 1)
        .withColumn(out, (off_map[F.col("_pid")] + F.col("_local")).cast("long"))
        .drop("_pid", "_local")
    )
