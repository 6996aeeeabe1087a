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
        direction: str = "backward",
    ) -> DataFrame:
        """For each left row: the matching right row (same ``on`` key)
        by ``direction`` — ``"backward"`` (default): greatest
        ``right_ts`` <= ``left_ts``; ``"forward"``: smallest
        ``right_ts`` >= ``left_ts``; ``"nearest"``: whichever of the
        two is closer in time (exact tie -> the backward match) — or
        nulls if none (left outer semantics, pandas merge_asof
        parity). ``tolerance_us`` additionally nulls matches farther
        than the tolerance (microseconds). Right columns come back
        prefixed with ``right_prefix``; the right timestamp as
        ``{right_prefix}{right_ts}``. ``right_tiebreak`` names a right
        column that deterministically picks among right rows sharing
        the same (key, ts) — the row with the GREATEST tiebreak value
        wins in every direction; without it that choice is
        partition-order dependent. All directions cost the same ONE
        shuffle on the key (nearest adds a second per-partition sort,
        no extra exchange).
        """
        if direction not in ("backward", "forward", "nearest"):
            raise ValueError(f"invalid direction: {direction}")
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
        union = lunion.unionByName(runion)

        # backward carry: right (side 0) sorts BEFORE left at equal ts,
        # so a same-ts right row is inside the trailing window; the
        # tiebreak orders ascending (last non-null = greatest wins).
        # Left rows carry null there; the column only discriminates
        # WITHIN a (ts, side) group, and left/right never share one.
        border = [F.col("_ts"), F.col("_side")]
        # forward carry: left must sort BEFORE right at equal ts so a
        # same-ts right row is inside the leading window; tiebreak
        # orders DESCENDING so first non-null = greatest wins.
        forder = [F.col("_ts"), -F.col("_side")]
        if right_tiebreak is not None:
            border.append(F.col(f"_rrow.{right_tiebreak}").asc())
            forder.append(F.col(f"_rrow.{right_tiebreak}").desc())
        wb = (
            Window.partitionBy(*keys)
            .orderBy(*border)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(*forder)
            .rowsBetween(0, Window.unboundedFollowing)
        )

        carried = union
        picks = {}
        if direction in ("backward", "nearest"):
            carried = carried.withColumn(
                "_back_r", F.last("_rrow", ignorenulls=True).over(wb)
            )
            picks["_back_r"] = F.unix_micros(F.col("_ts")) - F.unix_micros(
                F.col("_back_r")[right_ts]
            )
        if direction in ("forward", "nearest"):
            carried = carried.withColumn(
                "_fwd_r", F.first("_rrow", ignorenulls=True).over(wf)
            )
            picks["_fwd_r"] = F.unix_micros(
                F.col("_fwd_r")[right_ts]
            ) - F.unix_micros(F.col("_ts"))

        out = carried.where(F.col("_side") == 1)
        if tolerance_us is not None:
            for col, dist in picks.items():
                out = out.withColumn(
                    col,
                    F.when(dist > F.lit(int(tolerance_us)), F.lit(None)).otherwise(
                        F.col(col)
                    ),
                )
        if direction == "backward":
            out = out.withColumn("_pick_r", F.col("_back_r"))
        elif direction == "forward":
            out = out.withColumn("_pick_r", F.col("_fwd_r"))
        else:
            back_d, fwd_d = picks["_back_r"], picks["_fwd_r"]
            out = out.withColumn(
                "_pick_r",
                F.when(F.col("_back_r").isNull(), F.col("_fwd_r"))
                .when(F.col("_fwd_r").isNull(), F.col("_back_r"))
                .when(fwd_d < back_d, F.col("_fwd_r"))
                .otherwise(F.col("_back_r")),  # tie -> backward
            )
        return out.select(
            *keys,
            *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
            *[F.col(f"_pick_r.{c}").alias(f"{right_prefix}{c}") for c in rcols],
        )
