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
