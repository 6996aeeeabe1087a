"""Event-analytics operators over an event stream — funnels (global
and within-session), cohort retention, time-decayed activity scores,
rate-anomaly z-scores, Markov transitions, and path mining: classic
product-analytics operators the reference has no counterpart for (its
surface stops at ER; SURVEY §2.11 notes the events extension
surface), expressed as pure DataFrame plans.

Scale posture (100 TB events):

* ``Funnel.step_times`` scans the events relation once per step, but
  each scan carries an ``event_type = <step>`` predicate that reaches
  the parquet scan (PushedFilters), so each pass reads only that
  step's row group subset. The per-user step-time relations shrink
  monotonically (users reaching step k+1 ⊆ step k), so after the
  first shuffle-by-user every later join is AQE-broadcastable in
  typical funnels. No driver state, no windows over the full stream.
* ``Retention.cohorts`` is two hash aggregates (per-user min, then
  distinct (user, day)) plus one shuffle join on user_id — the same
  shape at any scale; output is bounded by days², not by events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Funnel:
    @staticmethod
    def step_times(
        events: DataFrame,
        steps: list[str],
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> DataFrame:
        """Per-user strict-order funnel times: one row per user who
        completed step 1, with ``t1..tk`` = the earliest timestamp of
        each step occurring STRICTLY AFTER the previous step's time
        (NULL once the chain breaks). Strict ``>`` makes same-instant
        events non-qualifying — deterministic regardless of row
        order."""
        assert steps, "need at least one funnel step"
        cur = (
            events.where(F.col(type_col) == steps[0])
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t1"))
        )
        for i, step in enumerate(steps[1:], start=2):
            prev = f"t{i - 1}"
            nxt = (
                events.where(F.col(type_col) == step)
                .join(cur.select(user_col, prev), user_col)
                .where(F.col(ts_col) > F.col(prev))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(f"t{i}"))
            )
            cur = cur.join(nxt, user_col, "left")
        return cur

    @staticmethod
    def conversion(
        events: DataFrame,
        steps: list[str],
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> DataFrame:
        """Funnel conversion report: one row per step with the number
        of users reaching it (in strict order) — ``(step, step_name,
        n_users)``, monotonically non-increasing in ``step``."""
        st = Funnel.step_times(events, steps, user_col, ts_col, type_col)
        counts = st.agg(
            *[F.count(f"t{i + 1}").alias(f"n{i + 1}") for i in range(len(steps))]
        )
        pairs = F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step"),
                    F.lit(s).alias("step_name"),
                    F.col(f"n{i + 1}").alias("n_users"),
                )
                for i, s in enumerate(steps)
            ]
        )
        return (
            counts.select(F.explode(pairs).alias("r"))
            .select("r.step", "r.step_name", "r.n_users")
        )

    @staticmethod
    def step_latency(
        events: DataFrame,
        steps: list[str],
        qs: list[float],
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> DataFrame:
        """Per consecutive funnel transition, exact quantiles of the
        seconds between the two step times (users who reached the
        later step only). Reuses step_times + the engine's exact
        linear-interpolation percentile (stats.GroupStats parity with
        quantile_cont)."""
        from sparker_spark.stats import GroupStats

        st = Funnel.step_times(events, steps, user_col, ts_col, type_col)
        legs = []
        for i in range(1, len(steps)):
            dt = (
                F.unix_micros(F.col(f"t{i + 1}")) - F.unix_micros(F.col(f"t{i}"))
            ) / 1e6
            legs.append(
                st.where(F.col(f"t{i + 1}").isNotNull()).select(
                    F.lit(i).alias("step"),
                    F.lit(steps[i - 1]).alias("from_step"),
                    F.lit(steps[i]).alias("to_step"),
                    dt.alias("dt"),
                )
            )
        deltas = legs[0]
        for leg in legs[1:]:
            deltas = deltas.unionByName(leg)
        return GroupStats.quantiles(
            deltas, ["step", "from_step", "to_step"], "dt", qs
        )


class Retention:
    @staticmethod
    def cohorts(
        events: DataFrame,
        user_col: str = "user_id",
        ts_col: str = "ts",
    ) -> DataFrame:
        """Day-cohort retention matrix: users are cohorted by the DATE
        of their first event; for every (cohort_day, day_offset) the
        count of cohort users active that day. ``day_offset`` 0 row
        equals cohort size. Output: ``(cohort_day DATE, day_offset INT,
        n_users LONG)``."""
        first = events.groupBy(user_col).agg(
            F.to_date(F.min(ts_col)).alias("cohort_day")
        )
        active = events.select(
            user_col, F.to_date(ts_col).alias("day")
        ).distinct()
        return (
            active.join(first, user_col)
            .select(
                "cohort_day",
                F.datediff("day", "cohort_day").alias("day_offset"),
                user_col,
            )
            .groupBy("cohort_day", "day_offset")
            .agg(F.count("*").cast("long").alias("n_users"))
            # ISO string: DATE round-trips through pandas differently
            # per engine (datetime64 vs date), breaking value hashes
            .select(
                F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
                "day_offset",
                "n_users",
            )
        )


class Decay:
    @staticmethod
    def decayed_value(
        events: DataFrame,
        tau_seconds: float,
        ref_ts=None,
        user_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> DataFrame:
        """Per-user exponentially time-decayed value: the recency-
        weighted activity score sum(value·e^{-(T_ref - t)/tau}) used
        for engagement ranking and feature freshness. ``ref_ts``
        defaults to the dataset's max timestamp (one column-pruned
        aggregate, driver scalar).

        Determinism: a sum of irrational terms is order-dependent in
        IEEE doubles, so each term is rounded to 8 decimals and summed
        as exact DECIMAL — any engine, any partitioning, any row order
        produces the identical total (the same trick the sessionize
        oracle uses for its value sums). One groupBy, no windows —
        scan-shaped at any scale."""
        from sparker_spark.rounding import rnd

        if ref_ts is None:
            ref_ts = events.agg(F.max(ts_col)).first()[0]
        age_s = (
            F.lit(ref_ts).cast("timestamp").cast("double")
            - F.col(ts_col).cast("double")
        )
        term = rnd(
            F.col(value_col) * F.exp(-age_s / F.lit(float(tau_seconds))), 8
        ).cast("decimal(30,8)")
        return events.groupBy(user_col).agg(
            F.count("*").cast("long").alias("n_events"),
            rnd(F.sum(term).cast("double"), 6).alias("decayed_value"),
        )


class Anomaly:
    @staticmethod
    def hourly_zscores(
        events: DataFrame,
        trailing: int = 24,
        min_history: int = 8,
        type_col: str = "event_type",
        ts_col: str = "ts",
    ) -> DataFrame:
        """Per-(type, hour) event-rate anomaly score: z of the hour's
        count against the trailing ``trailing`` OBSERVED hours
        (rows, not wall hours — a documented spec choice that makes
        gaps harmless). The mean/variance come from exact integer
        window sums (Σn, Σn², count), so the score is deterministic
        and engine-identical; hours with < ``min_history`` history get
        NULL. Output: (event_type, hour, n, mean_trailing, z,
        is_anomaly[|z|>3]).

        Plan: one hash aggregate + one window partitioned by type —
        the window key is the type, so parallelism follows the type
        cardinality; for few giant types pre-aggregate per (type,
        hour) first (done here: the window input is already the hourly
        rollup, bounded by types x hours, NOT by raw events)."""
        from pyspark.sql import Window

        from sparker_spark.rounding import rnd

        hourly = events.groupBy(
            type_col,
            F.date_format(
                F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:00:00"
            ).alias("hour"),
        ).agg(F.count("*").cast("long").alias("n"))
        w = (
            Window.partitionBy(type_col)
            .orderBy("hour")
            .rowsBetween(-trailing, -1)
        )
        s1 = F.sum("n").over(w)
        s2 = F.sum(F.col("n") * F.col("n")).over(w)
        cnt = F.count("n").over(w)
        mu = s1.cast("double") / cnt
        var = (s2.cast("double") - s1.cast("double") * s1 / cnt) / (cnt - 1)
        z = F.when(
            (cnt >= min_history) & (var > 0),
            (F.col("n") - mu) / F.sqrt(var),
        )
        return hourly.select(
            type_col,
            "hour",
            "n",
            rnd(F.when(cnt >= min_history, mu), 6).alias("mean_trailing"),
            rnd(z, 6).alias("z"),
            F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
        )


class Transitions:
    @staticmethod
    def event_transitions(
        events: DataFrame,
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        order_cols: tuple[str, ...] = ("event_id",),
    ) -> DataFrame:
        """First-order Markov transition matrix over each user's
        event sequence: (from_type, to_type, n, p) where p is the
        row-normalized transition probability. The per-user ordering
        is (ts, *order_cols) — the extra columns break same-instant
        ties deterministically. One lag window partitioned by user +
        one hash aggregate; n is integer-exact so p = n/row_total is a
        single deterministic division."""
        from pyspark.sql import Window

        from sparker_spark.rounding import rnd

        w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
        pairs = (
            events.withColumn("_next", F.lead(type_col).over(w))
            .where(F.col("_next").isNotNull())
            .select(
                F.col(type_col).alias("from_type"),
                F.col("_next").alias("to_type"),
            )
        )
        counts = pairs.groupBy("from_type", "to_type").agg(
            F.count("*").cast("long").alias("n")
        )
        totals = Window.partitionBy("from_type")
        return counts.select(
            "from_type",
            "to_type",
            "n",
            rnd(F.col("n") / F.sum("n").over(totals), 6).alias("p"),
        )



class Paths:
    @staticmethod
    def top_event_paths(
        events: DataFrame,
        length: int = 3,
        k: int = 20,
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
        order_cols: tuple[str, ...] = ("event_id",),
    ) -> DataFrame:
        """Top-k most frequent consecutive event-type paths of
        ``length`` steps (order-(length-1) sequence mining — the
        generalization of the transition matrix). One window with
        length-1 leads + one hash aggregate; ties break on the path
        string so the top-k is deterministic. Output: (path, n,
        rank)."""
        from pyspark.sql import Window

        w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
        cols = [F.col(type_col)] + [
            F.lead(type_col, i).over(w) for i in range(1, int(length))
        ]
        paths = (
            events.select(F.concat_ws(" > ", *cols).alias("path"),
                          cols[-1].isNotNull().alias("_full"))
            .where("_full")
            .groupBy("path")
            .agg(F.count("*").cast("long").alias("n"))
        )
        ranked = paths.orderBy(F.desc("n"), F.asc("path")).limit(int(k))
        w2 = Window.orderBy(F.desc("n"), F.asc("path"))
        return ranked.withColumn(
            "rank", F.row_number().over(w2).cast("int")
        )
