"""Deterministic sampling and dataset splitting.

Training-data pipelines need splits that are (a) stable across reruns
and engines — re-ingesting a shard must never move a document from
train to test — and (b) a pure function of a key, not of partition
layout or row order. Spark's ``randomSplit`` is neither (it is seeded
per-partition: repartitioning reshuffles the assignment). The standard
fix is hash-bucketing: map the key through a fixed hash to a uniform
[0, 1) coordinate and cut it by cumulative weights.

The hash is the engine-portable md5-derived 60-bit family
(llm/hashing.py), so the assignment is reproducible by any system that
can compute md5 — the DuckDB oracle replays it bit-for-bit, and a
downstream pipeline in another engine can reconstruct the exact split.
Everything is a column expression: no shuffle, no UDF, embarrassingly
parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparker_spark.llm.hashing import hash60

TWO_60 = float(1 << 60)


def _coord_sql(key: str, seed: int, dialect: str) -> str:
    """Uniform [0, 1) coordinate of a key: hash60 of the seed-salted
    key string, scaled. Salting with a seed prefix gives independent
    coordinates per seed (different splits / repeated sampling)."""
    concat = (
        f"concat(CAST({seed} AS STRING), '|', CAST({key} AS STRING))"
        if dialect == "spark"
        else f"concat(CAST({seed} AS VARCHAR), '|', CAST({key} AS VARCHAR))"
    )
    return f"(CAST({hash60(concat, dialect)} AS DOUBLE) / {TWO_60!r})"


class Sampling:
    @staticmethod
    def coord(key_col: str, seed: int = 0) -> Column:
        """The [0, 1) hash coordinate as a Spark column."""
        return F.expr(_coord_sql(key_col, seed, "spark"))

    @staticmethod
    def sample(df: DataFrame, key_col: str, fraction: float, seed: int = 0) -> DataFrame:
        """Deterministic ``fraction``-sample: keeps rows whose
        coordinate < fraction. Unlike DataFrame.sample the result is a
        pure function of the key — stable under repartitioning,
        re-ingestion, and engine changes."""
        return df.where(Sampling.coord(key_col, seed) < F.lit(float(fraction)))

    @staticmethod
    def split(
        df: DataFrame,
        key_col: str,
        weights: dict[str, float],
        seed: int = 0,
        split_col: str = "split",
    ) -> DataFrame:
        """Adds ``split_col`` assigning each row to one named split by
        cumulative weight over the hash coordinate. Weights must sum to
        ~1 (the last split absorbs the remainder so every row is
        assigned)."""
        names = list(weights)
        total = float(sum(weights.values()))
        if not names or total <= 0:
            raise ValueError("need positive weights")
        coord = Sampling.coord(key_col, seed)
        cum = 0.0
        expr = None
        for name in names[:-1]:
            cum += weights[name] / total
            branch = F.when(coord < F.lit(cum), F.lit(name))
            expr = branch if expr is None else expr.when(
                coord < F.lit(cum), F.lit(name)
            )
        if expr is None:
            assigned = F.lit(names[-1])
        else:
            assigned = expr.otherwise(F.lit(names[-1]))
        return df.withColumn(split_col, assigned)

    @staticmethod
    def split_case_sql(
        key: str, weights: dict[str, float], seed: int = 0, dialect: str = "duck"
    ) -> str:
        """The equivalent CASE expression in SQL — the oracle/export
        form of :meth:`split` (identical cut points and hash)."""
        names = list(weights)
        total = float(sum(weights.values()))
        coord = _coord_sql(key, seed, dialect)
        cum = 0.0
        branches = []
        for name in names[:-1]:
            cum += weights[name] / total
            # e-notation: a double literal in both engines (bare
            # fractions parse as DECIMAL with engine-specific promotion)
            branches.append(f"WHEN {coord} < {cum!r}e0 THEN '{name}'")
        if not branches:
            return f"'{names[-1]}'"
        return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"

    @staticmethod
    def bottom_k(
        df: DataFrame, key_col: str, k: int, seed: int = 0
    ) -> DataFrame:
        """Exact-size deterministic uniform sample WITHOUT replacement:
        the k rows with the smallest hash coordinate (ties broken by
        key). Equivalent to a seeded shuffle + LIMIT k, but a pure
        function of the keys — the same k rows come back on any
        engine, partitioning, or ingestion order. Plans as
        TakeOrderedAndProject: a per-partition k-heap plus a k-row
        driver merge — no global sort, no full shuffle, at any scale."""
        return (
            df.withColumn("_coord", Sampling.coord(key_col, seed))
            .orderBy("_coord", key_col)
            .limit(int(k))
            .drop("_coord")
        )

    @staticmethod
    def stratified_bottom_k(
        df: DataFrame,
        key_col: str,
        group_col: str,
        k: int,
        seed: int = 0,
    ) -> DataFrame:
        """Per-group exact-k deterministic sample: within each value of
        ``group_col``, the k rows with the smallest hash coordinate.
        One window per group key — the shuffle is by group, so skew
        follows the group distribution (fine for source/language
        strata; for a single giant group use bottom_k on the filtered
        slice). Adds ``sample_rank`` (1-based position within the
        group's sample)."""
        from pyspark.sql import Window

        w = Window.partitionBy(group_col).orderBy("_coord", key_col)
        return (
            df.withColumn("_coord", Sampling.coord(key_col, seed))
            .withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= int(k))
            .drop("_coord")
        )

    @staticmethod
    def weighted_bottom_k(
        df: DataFrame,
        key_col: str,
        weight_col: str,
        k: int,
        seed: int = 0,
        ndigits: int = 12,
    ) -> DataFrame:
        """Deterministic weighted sample WITHOUT replacement
        (Efraimidis–Spirakis A-ES): each row gets rank key
        u^(1/w) with u = the hash coordinate; the k LARGEST keys are
        the sample, giving inclusion probability proportional to
        weight — but, unlike weighted `DataFrame.sample`, as a pure
        function of (key, weight, seed): stable across engines,
        partitionings, and reruns, and mergeable (the global top-k of
        shard-wise top-ks is the sample of the union). Rows with
        non-positive weight are excluded. The rank key is rounded to
        ``ndigits`` (ties then break on the key) so any engine orders
        identically. Plans as TakeOrderedAndProject — per-partition
        k-heap + k-row driver merge. Adds ``sample_rank_key``."""
        r = F.pow(
            Sampling.coord(key_col, seed),
            F.lit(1.0) / F.col(weight_col).cast("double"),
        )
        scale = float(10 ** ndigits)
        r_rounded = F.floor(r * F.lit(scale) + F.lit(0.5)) / F.lit(scale)
        return (
            df.where(F.col(weight_col) > 0)
            .withColumn("sample_rank_key", r_rounded)
            .orderBy(F.desc("sample_rank_key"), F.asc(key_col))
            .limit(int(k))
        )
