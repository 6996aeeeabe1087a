"""Profile / groundtruth sources.

Reference parity: python/sparker/wrappers.py:12-208 (CSVWrapper,
JSONWrapper, PandasWrapper). The reference loads rows into
``RDD[Profile]`` objects (a bag of stringified KeyValue pairs,
objects.py:1-87). This engine's canonical profile relation is instead a
*long/EAV DataFrame*::

    profiles(profile_id LONG, attr STRING, value STRING,
             original_id STRING, source_id INT)

i.e. one row per (profile, attribute, value-fragment). Every blocking
operator immediately tokenizes per attribute, so the exploded form is
the natural Spark shape — it parquet-compresses well, prunes columns,
and never needs a Python object in an executor.

Dense profile ids: the reference uses ``zipWithIndex``
(wrappers.py:54,110) whose order depends on input-partition order. For
deterministic, hash-checkable output we rank by
``(source_id, original_id)`` via the distributed two-phase ranker
(``ranking.global_rank``: range-repartition, rank per partition, add
cumulative offsets) — dense, deterministic, and never a
single-partition window. At 100 TB scale the ranking is a single
range shuffle over the (narrow) id column set and is amortized over
the whole pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparker_spark.ranking import global_rank

PROFILE_COLUMNS = ["profile_id", "attr", "value", "original_id", "source_id"]


def _melt_to_eav(
    df: DataFrame,
    real_id_field: str = "",
    source_id: int = 0,
    explode_arrays: bool = True,
) -> DataFrame:
    """Wide row DataFrame -> (original_id, attr, value, source_id) EAV rows.

    Mirrors WrapperTrait.rowToAttributes (scala/.../WrapperTrait.scala:32-66):
    every column becomes a KeyValue, array values explode into repeated
    KeyValues (wrappers.py:35-48), everything is stringified
    (wrappers.py:41,46), empty/null values are dropped.
    """
    cols = df.columns
    if real_id_field and real_id_field in cols:
        oid = F.col(real_id_field).cast("string")
        attr_cols = [c for c in cols if c != real_id_field]
    else:
        # no declared id: synthesize a stable one from the full row hash
        # (identical rows collapse into one profile — deterministic,
        # unlike the reference's partition-order zipWithIndex)
        oid = F.xxhash64(*[F.col(c).cast("string") for c in cols]).cast("string")
        attr_cols = cols

    structs = []
    for c in attr_cols:
        dt = df.schema[c].dataType
        if explode_arrays and isinstance(dt, T.ArrayType):
            value = F.col(c).cast("array<string>")
        else:
            value = F.array(F.col(c).cast("string"))
        structs.append(F.struct(F.lit(c).alias("attr"), value.alias("values")))

    eav = (
        df.select(oid.alias("original_id"), F.explode(F.array(*structs)).alias("kv"))
        .select(
            "original_id",
            F.col("kv.attr").alias("attr"),
            F.explode("kv.values").alias("value"),
        )
        .where(F.col("value").isNotNull() & (F.trim(F.col("value")) != ""))
        .withColumn("source_id", F.lit(source_id).cast("int"))
    )
    return eav


def assign_profile_ids(eav: DataFrame, start_id_from: int = 0) -> DataFrame:
    """Assign dense deterministic profile ids over (source_id, original_id).

    Distributed: ranks the distinct id set with ``global_rank`` (range
    repartition + per-partition rank + offsets) instead of an
    unpartitioned ``row_number()`` window, so the assignment scales to
    billions of profiles while producing bit-identical ids.
    """
    distinct_ids = eav.select("source_id", "original_id").distinct()
    ranked = global_rank(distinct_ids, ["source_id", "original_id"], out="profile_id")
    if start_id_from:
        ranked = ranked.withColumn(
            "profile_id", F.col("profile_id") + F.lit(start_id_from)
        )
    return ranked.select("source_id", "original_id", "profile_id")


class DataFrameWrapper:
    """Generic loader: any Spark DataFrame -> canonical EAV profiles."""

    @staticmethod
    def load_profiles(
        df: DataFrame,
        start_id_from: int = 0,
        real_id_field: str = "",
        source_id: int = 0,
        explode_arrays: bool = True,
    ) -> DataFrame:
        eav = _melt_to_eav(df, real_id_field, source_id, explode_arrays)
        ids = assign_profile_ids(eav, start_id_from)
        # no broadcast hint: ids has one row per profile, so at billions
        # of profiles a forced broadcast is an OOM. The equi-join on
        # (source_id, original_id) shuffles fine, and AQE still picks a
        # broadcast join at runtime whenever ids is actually small.
        return eav.join(ids, ["source_id", "original_id"]).select(*PROFILE_COLUMNS)

    @staticmethod
    def load_groundtruth(df: DataFrame, id1: str = "id1", id2: str = "id2") -> DataFrame:
        return df.select(
            F.col(id1).cast("string").alias("first_entity_id"),
            F.col(id2).cast("string").alias("second_entity_id"),
        )


class CSVWrapper:
    """CSV source. Reference: python/sparker/wrappers.py:72-110."""

    @staticmethod
    def load_profiles(
        spark: SparkSession,
        file_path: str,
        start_id_from: int = 0,
        separator: str = ",",
        header: bool = True,
        real_id_field: str = "",
        source_id: int = 0,
    ) -> DataFrame:
        # Spark-default quote/escape — matches the reference's effective
        # options (wrappers.py:96 sets sep and a dead "delimiter" alias).
        df = (
            spark.read.option("header", str(header).lower())
            .option("sep", separator)
            .csv(file_path)
        )
        return DataFrameWrapper.load_profiles(
            df, start_id_from, real_id_field, source_id
        )

    @staticmethod
    def load_groundtruth(
        spark: SparkSession,
        file_path: str,
        id1: str = "id1",
        id2: str = "id2",
        separator: str = ",",
        header: bool = True,
    ) -> DataFrame:
        df = (
            spark.read.option("header", str(header).lower())
            .option("sep", separator)
            .csv(file_path)
        )
        return DataFrameWrapper.load_groundtruth(df, id1, id2)


class JSONWrapper:
    """JSON-lines source. Reference: python/sparker/wrappers.py:12-64.

    Array-valued fields explode into repeated KeyValues
    (wrappers.py:35-44).
    """

    @staticmethod
    def load_profiles(
        spark: SparkSession,
        file_path: str,
        start_id_from: int = 0,
        real_id_field: str = "",
        source_id: int = 0,
    ) -> DataFrame:
        df = spark.read.json(file_path)
        return DataFrameWrapper.load_profiles(
            df, start_id_from, real_id_field, source_id
        )

    @staticmethod
    def load_groundtruth(
        spark: SparkSession, file_path: str, id1: str = "id1", id2: str = "id2"
    ) -> DataFrame:
        df = spark.read.json(file_path)
        return DataFrameWrapper.load_groundtruth(df, id1, id2)


class PandasWrapper:
    """pandas source. Reference: python/sparker/wrappers.py:137-208."""

    @staticmethod
    def load_profiles(
        spark: SparkSession,
        pandas_df,
        start_id_from: int = 0,
        real_id_field: str = "",
        source_id: int = 0,
    ) -> DataFrame:
        df = spark.createDataFrame(pandas_df.astype(str))
        return DataFrameWrapper.load_profiles(
            df, start_id_from, real_id_field, source_id
        )

    @staticmethod
    def load_groundtruth(
        spark: SparkSession, pandas_df, id1: str = "id1", id2: str = "id2"
    ) -> DataFrame:
        df = spark.createDataFrame(pandas_df.astype(str))
        return DataFrameWrapper.load_groundtruth(df, id1, id2)


class ParquetWrapper:
    """Parquet source — replaces the reference's Java-serialized loaders
    (scala/.../Wrappers/SerializedProfilesLoader.scala:22-33) with the
    columnar format a Spark cluster actually wants: splittable scans,
    predicate pushdown, column pruning.
    """

    @staticmethod
    def load_profiles(
        spark: SparkSession,
        file_path: str,
        start_id_from: int = 0,
        real_id_field: str = "",
        source_id: int = 0,
    ) -> DataFrame:
        df = spark.read.parquet(file_path)
        return DataFrameWrapper.load_profiles(
            df, start_id_from, real_id_field, source_id
        )


def separator_ids(profiles: DataFrame) -> list[int]:
    """Max profile id per source, ascending by source — the reference's
    multi-source delimiters (python/sparker/blocking_utils.py:1-11,
    notebook cell `examples/Clean-Clean datasets.ipynb`). All sources
    except the last contribute a separator.
    """
    rows = (
        profiles.groupBy("source_id")
        .agg(F.max("profile_id").alias("max_id"))
        .orderBy("source_id")
        .collect()
    )
    return [r["max_id"] for r in rows[:-1]]


class ORCWrapper:
    """ORC source — same melt path as ParquetWrapper; ORC ships in
    Spark's default distribution with predicate pushdown and column
    pruning, so existing ORC lakes load without conversion."""

    @staticmethod
    def load_profiles(
        spark: SparkSession,
        file_path: str,
        start_id_from: int = 0,
        real_id_field: str = "",
        source_id: int = 0,
    ) -> DataFrame:
        df = spark.read.orc(file_path)
        return DataFrameWrapper.load_profiles(
            df, start_id_from, real_id_field, source_id
        )
