"""Attribute profiling over EAV profile relations.

The exploration step BEFORE configuring an ER pipeline: which
attributes are populated, how discriminative are they (cardinality /
value entropy), how long are the values — the numbers that decide
blocking strategy, key/attribute exclusion lists (SURVEY §2 B5) and
LSH thresholds. The reference leaves this to the user; the only
related machinery it ships is the attribute-cluster entropy
(python/sparker/attribute_clustering.py:263-313), which this module
generalizes to a per-attribute summary.

One hash-aggregate pass keyed by the attribute (plus one for the
value histogram feeding the entropy term): scales with the EAV
relation, no driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.rounding import rnd


class AttributeProfile:
    @staticmethod
    def summary(
        eav: DataFrame,
        key_cols: list[str] | None = None,
        value_col: str = "value",
        ndigits: int = 6,
    ) -> DataFrame:
        """Per-attribute summary of an EAV relation:

        (keys..., n_values, n_distinct, avg_len, entropy) where
        entropy is the Shannon entropy (log2) of the value-occurrence
        distribution — high = discriminative blocking key material,
        near-zero = near-constant attribute worth excluding.

        Blank/null values should be filtered upstream by the loader
        (wrappers strip them, reference csv_wrapper.py does the same);
        rows that still carry them are excluded here for parity.
        """
        keys = key_cols or ["source_id", "attr"]
        v = F.col(value_col)
        clean = eav.where(v.isNotNull() & (F.trim(v) != ""))
        hist = clean.groupBy(*keys, value_col).agg(
            F.count("*").alias("c"), F.sum(F.length(v)).alias("len_sum")
        )
        per = hist.groupBy(*keys).agg(
            F.sum("c").alias("n_values"),
            F.count("*").alias("n_distinct"),
            F.sum("len_sum").alias("_len_total"),
            F.sum(F.col("c") * F.log2("c")).alias("_clog"),
        )
        return per.select(
            *keys,
            F.col("n_values").cast("long").alias("n_values"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            rnd(
                F.col("_len_total").cast("double") / F.col("n_values"), ndigits
            ).alias("avg_len"),
            rnd(
                F.log2("n_values") - F.col("_clog") / F.col("n_values"), ndigits
            ).alias("entropy"),
        )
