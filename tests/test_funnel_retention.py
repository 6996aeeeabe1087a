"""Hand-computed fixtures for the event-analytics operators: ordered
funnels, cohort retention, and the portable HyperLogLog sketch."""

import datetime as dt

import pytest

from sparker_spark.funnel import Funnel, Retention
from sparker_spark.sketches import HyperLogLog

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # user 1 completes view -> click -> buy in order
        (1, ts(0), "view"),
        (1, ts(1), "click"),
        (1, ts(2), "buy"),
        # user 2: click BEFORE view -> chain stops after view
        (2, ts(0), "click"),
        (2, ts(1), "view"),
        # user 3: view and click at the SAME instant -> strict > fails
        (3, ts(0), "view"),
        (3, ts(0), "click"),
        (3, ts(5), "buy"),
        # user 4: never views -> not in funnel at all
        (4, ts(0), "click"),
        (4, ts(1), "buy"),
        # user 5: view, then a later click from a SECOND view cycle
        (5, ts(0), "view"),
        (5, ts(9), "view"),
        (5, ts(10), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_order(funnel_events):
    out = {
        r["step_name"]: r["n_users"]
        for r in Funnel.conversion(
            funnel_events, ["view", "click", "buy"]
        ).collect()
    }
    # views: users 1,2,3,5; clicks strictly after first view: 1,5
    # (2 clicked before viewing, 3 clicked at the same instant);
    # buys strictly after the qualifying click: only 1
    assert out == {"view": 4, "click": 2, "buy": 1}


def test_funnel_step_times_earliest_qualifying(funnel_events):
    row = (
        Funnel.step_times(funnel_events, ["view", "click"])
        .where("user_id = 5")
        .collect()[0]
    )
    # first view at t0 qualifies; click at t10 counts even though it
    # belongs to the second browsing cycle (earliest-after semantics)
    assert row["t1"] == ts(0) and row["t2"] == ts(10)


def test_funnel_monotone_counts(funnel_events):
    rows = sorted(
        (r["step"], r["n_users"])
        for r in Funnel.conversion(
            funnel_events, ["view", "click", "buy"]
        ).collect()
    )
    counts = [n for _, n in rows]
    assert counts == sorted(counts, reverse=True)


def test_retention_cohorts(spark):
    day = 24 * 60
    rows = [
        # user 1 first seen day 0, active days 0, 1, 3
        (1, ts(10), "e"),
        (1, ts(day + 5), "e"),
        (1, ts(3 * day), "e"),
        # user 2 first seen day 0, active day 0 only (two events)
        (2, ts(20), "e"),
        (2, ts(30), "e"),
        # user 3 first seen day 1, active days 1 and 3
        (3, ts(day), "e"),
        (3, ts(3 * day + 1), "e"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in Retention.cohorts(ev).collect()
    }
    assert out == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 1): 1,
        ("2026-01-01", 3): 1,
        ("2026-01-02", 0): 1,
        ("2026-01-02", 2): 1,
    }


def test_hll_accuracy_and_registers(spark):
    n = 20_000
    df = spark.range(n).selectExpr("id AS v", "'g' AS grp")
    regs = HyperLogLog.registers(df, "v", ("grp",), p=10)
    est = HyperLogLog.estimate(regs, ("grp",), p=10).collect()[0]
    # raw-HLL relative error ~1.04/sqrt(1024) = 3.25%; allow 4 sigma
    assert est["n_registers"] <= 1024
    assert abs(est["hll_estimate"] - n) / n < 0.13
    # duplicated input must not change the sketch at all
    dup = df.union(df)
    est2 = HyperLogLog.estimate(
        HyperLogLog.registers(dup, "v", ("grp",), p=10), ("grp",), p=10
    ).collect()[0]
    assert est2["hll_estimate"] == est["hll_estimate"]


def test_hll_merge_equals_single_pass(spark):
    a = spark.range(0, 3000).selectExpr("id AS v")
    b = spark.range(2000, 5000).selectExpr("id AS v")  # overlapping
    merged = HyperLogLog.merge(
        HyperLogLog.registers(a, "v"), HyperLogLog.registers(b, "v")
    )
    single = HyperLogLog.registers(a.union(b), "v")
    est_m = HyperLogLog.estimate(merged).collect()[0]["hll_estimate"]
    est_s = HyperLogLog.estimate(single).collect()[0]["hll_estimate"]
    assert est_m == est_s  # exact merge semantics, not approximate


def test_hll_matches_duckdb_replay(spark):
    import duckdb

    df = spark.range(500).selectExpr("CAST(id AS STRING) AS v")
    est = HyperLogLog.estimate(HyperLogLog.registers(df, "v")).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(range AS VARCHAR) AS v FROM range(500)")
    got = con.execute(HyperLogLog.duck_sql("t", "v")).fetchone()
    assert got[0] == est["n_registers"]
    assert got[1] == est["hll_estimate"]  # bit-identical across engines


def test_streaming_hll_matches_batch(spark, tmp_path):
    """The streaming register table after all batches equals the batch
    sketch over the same rows — max-merge makes order irrelevant."""
    src = tmp_path / "vals"
    df = spark.range(2000).selectExpr("CAST(id % 700 AS STRING) AS v")
    df.repartition(4).write.parquet(str(src))
    from sparker_spark.streaming.incremental import streaming_hll

    stream = spark.readStream.schema("v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        streaming_hll(stream, "v")
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["r"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    want = {
        (r["bucket"], r["r"])
        for r in HyperLogLog.registers(df, "v").collect()
    }
    assert got == want
    est = HyperLogLog.estimate(spark.sql("SELECT * FROM hll_regs")).collect()[0]
    assert abs(est["hll_estimate"] - 700) / 700 < 0.13


def test_sampling_bottom_k(spark):
    from sparker_spark.llm.sampling import Sampling

    df = spark.range(1000).selectExpr("id AS doc_id", "id % 7 AS grp")
    s1 = sorted(r["doc_id"] for r in Sampling.bottom_k(df, "doc_id", 25).collect())
    # deterministic: same rows on re-evaluation and under repartition
    s2 = sorted(
        r["doc_id"]
        for r in Sampling.bottom_k(df.repartition(13), "doc_id", 25).collect()
    )
    assert s1 == s2 and len(s1) == 25
    # different seed -> (almost surely) different sample
    s3 = sorted(
        r["doc_id"] for r in Sampling.bottom_k(df, "doc_id", 25, seed=9).collect()
    )
    assert s1 != s3


def test_sampling_stratified_bottom_k(spark):
    from sparker_spark.llm.sampling import Sampling

    df = spark.range(1000).selectExpr("id AS doc_id", "CAST(id % 4 AS STRING) AS src")
    out = Sampling.stratified_bottom_k(df, "doc_id", "src", 10).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["src"], []).append(r["sample_rank"])
    assert set(by_grp) == {"0", "1", "2", "3"}
    for ranks in by_grp.values():
        assert sorted(ranks) == list(range(1, 11))
    # per-group sample is the global bottom_k of that group's slice
    g0 = sorted(
        r["doc_id"]
        for r in Sampling.bottom_k(df.where("src = '0'"), "doc_id", 10).collect()
    )
    assert g0 == sorted(r["doc_id"] for r in out if r["src"] == "0")


def test_decayed_value_fixture(spark):
    import math

    from sparker_spark.funnel import Decay

    rows = [
        (1, ts(0), 10.0),
        (1, ts(60), 5.0),   # newest -> ref_ts, weight 1
        (2, ts(30), 4.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["user_id"]: r for r in Decay.decayed_value(ev, 3600.0).collect()}
    exp1 = round(10.0 * math.exp(-3600 / 3600.0), 8) + round(5.0 * 1.0, 8)
    exp2 = round(4.0 * math.exp(-1800 / 3600.0), 8)
    assert out[1]["decayed_value"] == pytest.approx(round(exp1, 6), abs=1e-9)
    assert out[2]["decayed_value"] == pytest.approx(round(exp2, 6), abs=1e-9)
    assert out[1]["n_events"] == 2


def test_decayed_value_order_invariant(spark):
    from sparker_spark.funnel import Decay

    rows = [(1, ts(i), 0.1 + i * 0.01) for i in range(200)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a = Decay.decayed_value(ev, 1234.0).collect()[0]["decayed_value"]
    b = Decay.decayed_value(ev.repartition(17), 1234.0).collect()[0][
        "decayed_value"
    ]
    assert a == b  # DECIMAL term sum: partitioning cannot change the total


def test_anomaly_zscores(spark):
    import math

    from sparker_spark.funnel import Anomaly

    # 12 quiet hours of exactly 2 events, then one burst hour of 40
    rows = []
    eid = 0
    for h in range(12):
        for _ in range(2):
            rows.append((eid, ts(h * 60), 1, "click")); eid += 1
    for _ in range(40):
        rows.append((eid, ts(12 * 60), 1, "click")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["hour"]: r for r in Anomaly.hourly_zscores(ev, 24, 8).collect()}
    assert len(out) == 13
    burst = out["2026-01-01 12:00:00"]
    # trailing window: 12 hours of n=2 -> mean 2, var 0 -> z undefined?
    # no: var==0 means z is NULL but flagged false
    assert burst["mean_trailing"] == 2.0
    assert burst["z"] is None and burst["is_anomaly"] is False
    # add one hour of 3 so variance > 0, then the burst z is huge
    rows.append((eid, ts(5 * 60 + 1), 1, "click"))
    ev2 = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out2 = {r["hour"]: r for r in Anomaly.hourly_zscores(ev2, 24, 8).collect()}
    b2 = out2["2026-01-01 12:00:00"]
    n = 12
    vals = [2] * 11 + [3]
    mu = sum(vals) / n
    var = sum((v - mu) ** 2 for v in vals) / (n - 1)
    assert b2["z"] == pytest.approx((40 - mu) / math.sqrt(var), rel=1e-5)
    assert b2["is_anomaly"] is True
    # first hours have no history -> everything null/false
    first = out2["2026-01-01 00:00:00"]
    assert first["z"] is None and first["mean_trailing"] is None
    assert first["is_anomaly"] is False


def test_event_transitions(spark):
    from sparker_spark.funnel import Transitions

    rows = [
        (1, 1, ts(0), "a"),
        (2, 1, ts(1), "b"),
        (3, 1, ts(2), "a"),
        (4, 2, ts(0), "a"),
        (5, 2, ts(1), "c"),
        (6, 3, ts(0), "a"),  # single event -> no transition
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in Transitions.event_transitions(ev).collect()
    }
    # from 'a': a->b (u1), a->c (u2); from 'b': b->a (u1)
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_funnel_step_latency(spark):
    from sparker_spark.funnel import Funnel

    rows = [
        (1, ts(0), "view"), (1, ts(10), "click"),   # 600 s
        (2, ts(0), "view"), (2, ts(30), "click"),   # 1800 s
        (3, ts(0), "view"),                          # never clicks
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = Funnel.step_latency(ev, ["view", "click"], [0.5]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["step"], r["from_step"], r["to_step"], r["n"]) == (1, "view", "click", 2)
    assert r["q_5"] == 1200.0  # interpolated median of {600, 1800}


def test_weighted_sample_matches_python_model(spark):
    """The Efraimidis-Spirakis sample is a pure function of
    (key, weight, seed): replicate the md5 coordinate + rank key in
    plain Python and expect the exact same selection."""
    import hashlib
    import math

    from sparker_spark.llm.sampling import Sampling

    rows = [(i, (i % 9) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [
        (r["doc_id"], r["sample_rank_key"])
        for r in Sampling.weighted_bottom_k(df, "doc_id", "w", 20, seed=3).collect()
    ]

    def coord(key):
        h = int(hashlib.md5(f"3|{key}".encode()).hexdigest()[:15], 16)
        return h / float(1 << 60)

    scale = 1e12
    model = sorted(
        (
            (math.floor(coord(d) ** (1.0 / w) * scale + 0.5) / scale, -d)
            for d, w in rows
        ),
        reverse=True,
    )[:20]
    want = [(-nd, r) for r, nd in model]
    assert got == want


def test_weighted_sample_biases_toward_heavy(spark):
    from sparker_spark.llm.sampling import Sampling

    # half the rows weight 1, half weight 50 -> heavy rows dominate
    rows = [(i, 1) for i in range(500)] + [(1000 + i, 50) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = Sampling.weighted_bottom_k(df, "doc_id", "w", 100).collect()
    heavy = sum(1 for r in got if r["doc_id"] >= 1000)
    assert heavy > 80  # expectation ~98 of 100


def test_top_event_paths(spark):
    from sparker_spark.funnel import Paths

    rows = [
        (1, 1, ts(0), "a"), (2, 1, ts(1), "b"), (3, 1, ts(2), "c"),
        (4, 1, ts(3), "a"), (5, 1, ts(4), "b"), (6, 1, ts(5), "c"),
        (7, 2, ts(0), "a"), (8, 2, ts(1), "b"), (9, 2, ts(2), "c"),
        (10, 3, ts(0), "x"), (11, 3, ts(1), "y"),  # too short for len 3
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {(r["path"], r["n"], r["rank"])
           for r in Paths.top_event_paths(ev, 3, 5).collect()}
    # 'a > b > c' occurs 3x (twice in u1's run, once in u2)
    assert ("a > b > c", 3, 1) in got
    assert not any(p.startswith("x") for p, _, _ in got)


def test_dq_report(spark):
    from sparker_spark.stats import DataQuality

    rows = [
        (1, "u", 5.0), (2, "u", 150.0), (2, None, None), (3, "v", -1.0),
    ]
    df = spark.createDataFrame(rows, "id long, name string, v double")
    got = {
        r["check"]: r["violations"]
        for r in DataQuality.report(
            df, not_null=["name"], unique=["id"], ranges={"v": (0.0, 100.0)}
        ).collect()
    }
    assert got == {"null:name": 1, "range:v": 2, "unique:id": 1}
