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
    # empty input -> no offsets; create_map() with zero entries is a
    # VOID-keyed map that fails analysis, so fall back to a 0 literal
    off_expr = (
        F.create_map(
            *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
        )[F.col("_pid")]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy(*key)
    ranked = (
        parts.withColumn("_local", F.row_number().over(w) - 1)
        .withColumn(out, (off_expr + F.col("_local")).cast("long"))
        .drop("_pid", "_local")
    )
    # The cache on `parts` is load-bearing: range boundaries are fixed
    # at shuffle time, so cached reads (and evicted-partition
    # recomputes, which reuse the same shuffle output) stay consistent
    # with the collected offsets. Callers that materialize the ranked
    # output elsewhere can free it with release().
    ranked._gr_cache = parts
    return ranked


def global_cumsum(
    df: DataFrame,
    cols: list[str],
    value: str,
    out: str = "cum",
    descending: bool = False,
) -> DataFrame:
    """Add ``out`` = inclusive running sum of ``value`` under ORDER BY
    *cols* — the distributed twin of
    ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``, which
    Spark would otherwise execute as a single-partition window. Same
    two-phase scheme as :func:`global_rank`: range-repartition on the
    sort key, per-partition windowed sums, plus each partition's
    cumulative total collected as a tiny driver-side list. ``cols``
    must form a total order per row group (rows with equal keys land
    in one partition, so their relative cumsum order within the key is
    partition-local — pass unique keys, e.g. a histogram's level
    column). Internal cache: free with :func:`release` once the
    output is materialized.
    """
    key = [F.col(c).desc() if descending else F.col(c) for c in cols]
    parts = df.repartitionByRange(*key).withColumn(
        "_pid", F.spark_partition_id()
    ).cache()
    totals = (
        parts.groupBy("_pid").agg(F.sum(value).alias("_s")).orderBy("_pid").collect()
    )
    offsets = {}
    acc = 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += r["_s"]
    off_expr = (
        F.create_map(
            *[x for pid, o in offsets.items() for x in (F.lit(pid), F.lit(o))]
        )[F.col("_pid")]
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        parts.withColumn("_local", F.sum(value).over(w))
        .withColumn(out, off_expr + F.col("_local"))
        .drop("_pid", "_local")
    )
    cum._gr_cache = parts
    return cum


def global_topk(
    df: DataFrame,
    order: list[tuple[str, bool]],
    k: int,
) -> DataFrame:
    """Exactly the first ``k`` rows of ``df`` under ORDER BY *order*
    (list of ``(column, descending)``; the full key must form a total
    order — make the last columns a unique tiebreaker), without a
    global sort and without ever shipping k rows to the driver (unlike
    ``orderBy().limit(k)``, whose TakeOrderedAndProject merges every
    partition's top-k heap driver-side — k here can be a constant
    fraction of the input).

    Plan: range-repartition on the key (total order ACROSS partitions),
    collect per-partition row counts (a #partitions-sized list), then
    keep every partition wholly below the k-boundary AS IS — no sort —
    and sort only the single boundary partition to cut it at
    ``k - preceding``. Equal keys land in one partition, so the kept
    SET is exactly the rank-< k set of the total order.
    """
    if k <= 0:
        return df.limit(0)
    key = [F.col(c).desc() if d else F.col(c) for c, d in order]
    parts = df.repartitionByRange(*key).withColumn(
        "_pid", F.spark_partition_id()
    ).cache()
    counts = (
        parts.groupBy("_pid").agg(F.count("*").alias("_n")).orderBy("_pid").collect()
    )
    acc = 0
    boundary_pid = None
    boundary_keep = 0
    for r in counts:
        if acc + r["_n"] >= k:
            boundary_pid = r["_pid"]
            boundary_keep = k - acc
            break
        acc += r["_n"]
    if boundary_pid is None:
        # fewer than k rows: everything survives
        out = parts.drop("_pid")
        out._gr_cache = parts
        return out
    whole = parts.where(F.col("_pid") < F.lit(boundary_pid))
    w = Window.partitionBy("_pid").orderBy(*key)
    edge = (
        parts.where(F.col("_pid") == F.lit(boundary_pid))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.lit(int(boundary_keep)))
        .drop("_rn")
    )
    out = whole.unionByName(edge).drop("_pid")
    out._gr_cache = parts
    return out


def release(df: DataFrame) -> None:
    """Unpersist the internal cache of a ``global_rank`` result. Safe to
    call only after the ranked output has been materialized (or is no
    longer needed) — the ranks themselves were fixed at shuffle time."""
    cache = getattr(df, "_gr_cache", None)
    if cache is not None:
        cache.unpersist()
