"""Bucketed table sink — shuffle-free repeated joins.

The reference's only sink is a serialized-object dump
(python/sparker/wrappers.py CSVWrapper-style loaders have no write
path; the Scala harness persists RDDs ad hoc). At 100 TB the write
layout IS a query optimization: a relation that will be joined or
aggregated on the same key many times (profiles by profile_id, block
assignments by block_id, embeddings by vec_id) should be written
BUCKETED on that key so every later equi-join/aggregation on it skips
its exchange — Spark's bucketing metadata proves the distribution, so
Catalyst plans a join with no shuffle on the bucketed side(s); with
both sides bucketed into the same bucket count the join is fully
co-located (zero exchange), the cluster-native equivalent of the
reference's "keep the block index resident" strategy without any
driver state.

Bucketed output requires the table catalog (``saveAsTable``) — plain
``parquet(path)`` writes drop the bucketing metadata. Local default
warehouse works; on a cluster this is the metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class BucketedSink:
    @staticmethod
    def write(
        df: DataFrame,
        table: str,
        bucket_cols: list[str] | str,
        num_buckets: int = 32,
        sort_cols: list[str] | str | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write ``df`` as a bucketed (optionally sorted) parquet
        table. ``num_buckets`` should be sized so one bucket of the
        LARGER relation fits an executor's task comfortably; both
        sides of a co-located join must use the same count."""
        cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
        w = (
            df.write.mode(mode)
            .format("parquet")
            .bucketBy(int(num_buckets), cols[0], *cols[1:])
        )
        if sort_cols:
            s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
            w = w.sortBy(s[0], *s[1:])
        w.saveAsTable(table)

    @staticmethod
    def read(spark: SparkSession, table: str) -> DataFrame:
        """Read a bucketed table (bucket metadata comes from the
        catalog; requires ``spark.sql.sources.bucketing.enabled``,
        on by default)."""
        return spark.table(table)


class PartitionedSink:
    """Hive-style partitioned parquet writer — the layout-level twin of
    bucketing: equality/range predicates on the partition columns
    become PartitionFilters (directory pruning — files outside the
    predicate are never opened, let alone scanned). Use for the
    columns queries slice on (source, lang, event date), bucketing for
    the columns they join on."""

    @staticmethod
    def write(
        df: DataFrame,
        path: str,
        partition_cols: list[str] | str,
        mode: str = "overwrite",
    ) -> None:
        cols = (
            [partition_cols]
            if isinstance(partition_cols, str)
            else list(partition_cols)
        )
        df.write.mode(mode).partitionBy(*cols).parquet(path)

    @staticmethod
    def compact(
        spark: SparkSession,
        path: str,
        target_partitions: int,
        out_path: str,
    ) -> None:
        """Small-files compaction: rewrite a parquet directory into
        ``target_partitions`` files. Streaming sinks and incremental
        ingests accrete tiny files whose per-file open/footer cost
        eventually dominates scans; periodic compaction is standard
        table maintenance."""
        spark.read.parquet(path).repartition(int(target_partitions)).write.mode(
            "overwrite"
        ).parquet(out_path)
