"""Distributed summary statistics for curation/monitoring pipelines.

Exact per-group quantiles via Spark's ``percentile`` aggregate (one
hash-aggregate shuffle on the group key; the per-group value buffer is
bounded by group cardinality — right when groups are bounded, e.g.
per-event-type or per-day metrics). For unbounded groups the t-digest
sketch behind ``approx_percentile`` is the scale path: mergeable,
constant memory, rank error <= the supplied accuracy — the classic
exact-oracle/approx-scale pairing this engine uses for dedup and ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.rounding import rnd


class GroupStats:
    @staticmethod
    def quantiles(
        df: DataFrame,
        keys: list[str],
        value_col: str,
        qs: list[float],
        exact: bool = True,
        accuracy: int = 10_000,
        ndigits: int = 6,
    ) -> DataFrame:
        """(keys..., n, q_<pct> ...) per group. ``exact=True`` uses the
        linear-interpolation percentile (identical to ANSI
        percentile_cont / DuckDB quantile_cont, bit-for-bit); False
        uses the mergeable t-digest approximation with the given
        accuracy."""
        arr = "array(" + ", ".join(repr(float(q)) for q in qs) + ")"
        if exact:
            agg = F.expr(f"percentile({value_col}, {arr})")
        else:
            agg = F.expr(f"approx_percentile({value_col}, {arr}, {int(accuracy)})")
        out = df.groupBy(*keys).agg(
            F.count(value_col).alias("n"), agg.alias("_qs")
        )
        cols = [F.col(k) for k in keys] + [F.col("n")]
        for i, q in enumerate(qs):
            name = f"q_{str(q).replace('0.', '').replace('.', '_')}"
            cols.append(rnd(F.col("_qs")[i].cast("double"), ndigits).alias(name))
        return out.select(*cols)


class DataQuality:
    @staticmethod
    def report(
        df: DataFrame,
        *,
        not_null: list[str] = (),
        unique: list[str] = (),
        ranges: dict[str, tuple[float, float]] | None = None,
    ) -> DataFrame:
        """Expectation-style data-quality report: one row per check
        with the violation count — the operational health scan a
        scheduled pipeline runs before publishing a table. All checks
        evaluate in ONE scan (conditional aggregates) plus one
        aggregate per uniqueness check; no driver state. Output:
        (check, violations, n_rows)."""
        aggs = [F.count("*").alias("_n")]
        names = []
        for c in not_null:
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    f"null:{c}"
                )
            )
            names.append(f"null:{c}")
        for c, (lo, hi) in (ranges or {}).items():
            aggs.append(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & ((F.col(c) < lo) | (F.col(c) > hi)),
                        1,
                    ).otherwise(0)
                ).alias(f"range:{c}")
            )
            names.append(f"range:{c}")
        base = df.agg(*aggs).collect()[0]
        n_rows = int(base["_n"])
        rows = [(name, int(base[name])) for name in names]
        for c in unique:
            dup = (
                df.groupBy(c)
                .agg(F.count("*").alias("_c"))
                .where("_c > 1")
                .agg(F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("d"))
                .collect()[0]["d"]
            )
            rows.append((f"unique:{c}", int(dup)))
        spark = df.sparkSession
        out = spark.createDataFrame(
            [(name, v, n_rows) for name, v in rows],
            "check string, violations long, n_rows long",
        )
        return out
