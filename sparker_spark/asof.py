"""Distributed as-of join.

Neither Spark nor the reference has one (the reference has no
timestamp type at all — SURVEY §1.3); this is the canonical
time-series operator a training-data/event pipeline needs ("attach the
latest prior state to each observation").

Formulation: the classic union + keyed window. Tag left rows side=1
and right rows side=0, union on (key, ts, side, payloads), then one
window per key ordered by (ts, side) carries the last non-null right
payload forward — for every left row that is exactly the right row
with the greatest right_ts <= left_ts (right sorts first on ties, so
an equal-timestamp right row matches).

Scale shape: ONE shuffle on the join key and one per-partition sort —
same cost class as any keyed window; no range join (Spark would plan a
BroadcastNestedLoopJoin for the raw inequality predicate) and no
per-key driver state. Key skew concentrates a hot key's rows in one
partition — the same bound as every keyed window — so pick keys like
user/session, not a global constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class AsofJoin:
    @staticmethod
    def asof_join(
        left: DataFrame,
        right: DataFrame,
        on: list[str] | str,
        left_ts: str = "ts",
        right_ts: str = "ts",
        tolerance_us: int | None = None,
        right_prefix: str = "r_",
        right_tiebreak: str | None = None,
    ) -> DataFrame:
        """For each left row: the right row (same ``on`` key) with the
        greatest ``right_ts`` <= ``left_ts``, or nulls if none (left
        outer semantics). ``tolerance_us`` additionally nulls matches
        older than the tolerance (microseconds). Right columns come
        back prefixed with ``right_prefix``; the right timestamp as
        ``{right_prefix}{right_ts}``. ``right_tiebreak`` names a right
        column that deterministically picks among right rows sharing
        the same (key, ts) — the row with the GREATEST tiebreak value
        wins; without it that choice is partition-order dependent.
        """
        keys = [on] if isinstance(on, str) else list(on)
        lcols = [c for c in left.columns if c not in keys]
        rcols = [c for c in right.columns if c not in keys]

        lrow = F.struct(*[F.col(c) for c in lcols]).alias("_lrow")
        rrow = F.struct(*[F.col(c) for c in rcols]).alias("_rrow")
        lunion = left.select(
            *keys,
            F.col(left_ts).alias("_ts"),
            F.lit(1).alias("_side"),
            lrow,
            F.lit(None).cast(
                right.select(rrow).schema["_rrow"].dataType.simpleString()
            ).alias("_rrow"),
        )
        runion = right.select(
            *keys,
            F.col(right_ts).alias("_ts"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(
                left.select(lrow).schema["_lrow"].dataType.simpleString()
            ).alias("_lrow"),
            rrow,
        )
        order = [F.col("_ts"), F.col("_side")]
        if right_tiebreak is not None:
            # right rows order ascending on the tiebreak (last one =
            # greatest wins); left rows carry null there, but the
            # column only discriminates WITHIN a (ts, side) group, and
            # left/right rows never share one
            order.append(F.col(f"_rrow.{right_tiebreak}"))
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = lunion.unionByName(runion).withColumn(
            "_last_r", F.last("_rrow", ignorenulls=True).over(w)
        )
        out = carried.where(F.col("_side") == 1)
        if tolerance_us is not None:
            too_old = (
                F.unix_micros(F.col("_ts"))
                - F.unix_micros(F.col("_last_r")[right_ts])
            ) > F.lit(int(tolerance_us))
            out = out.withColumn(
                "_last_r", F.when(too_old, F.lit(None)).otherwise(F.col("_last_r"))
            )
        return out.select(
            *keys,
            *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
            *[F.col(f"_last_r.{c}").alias(f"{right_prefix}{c}") for c in rcols],
        )
