"""Quiet-window bench launcher (r12 measurement hygiene).

The r11/r12 records documented host vCPU-stall bursts that inflate
same-code bench numbers 1.3-5x while staying invisible to coarse load
metrics (SCALING.md r11, OPTIMIZATION_r12.md "Measurement pathology").
bench.py already SELF-REPORTS contamination via per-query constant-work
sentinels and quarantines burst-hit records; this tool attacks the
problem from the other side — don't start a ~1 h full-registry run
inside a burst in the first place.

Probe choice (measured, r12): a wave of concurrent PROCESSES doing
fixed Python work stays flat through bursts that inflate Spark stages
2-10x — same blind spot as the GIL-loop sentinel. What does move with
the burst is a small SHUFFLE job: interleaved readings on this host
showed range->hash-aggregate at 0.72-0.92 s in quiet windows vs
1.2-3.5 s during the same minutes the full bench measured
pipeline_gsmb_e2e at 134-203 s (quiet: 16-36 s). So the probe keeps
ONE small Spark session alive and times that shuffle job; the
no-shuffle 32-task range-sum rides along for the same stall taxonomy
bench.py records (py sentinel vs jvm sentinel vs shuffle).

Launch rule: start bench.py only after STREAK consecutive probes land
under ABS_CAP_S. The first version also required sh <= 1.35x the
session's best probe, but the min-ratchet made that stricter than the
measured quiet band itself (best 0.445 s -> gate 0.60 s, while genuine
quiet windows read 0.5-0.95 s): it rejected real windows for an hour.
The absolute band is the documented discriminator (quiet 0.5-0.95 s vs
burst 1.2-9.3 s interleaved with inflated bench segments), so the
relative criterion is gone. After the bench exits, re-read the record it
wrote: if it self-quarantined (sentinel flags > allowed), wait for
quiet again and retry, up to MAX_RUNS total bench executions.

Usage: python tools/quiet_bench.py [out_prefix]
  Writes bench stdout/stderr to <out_prefix><k>.out/.err (default
  /tmp/quiet_bench_run<k>). Environment (SPARK_GRAFT_*) passes through
  to bench.py unchanged.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_EVERY_S = 45
STREAK = 4
ABS_CAP_S = float(os.environ.get("QUIET_BENCH_ABS_CAP_S", "1.0"))
MIN_PROBES = 2
MAX_RUNS = int(os.environ.get("QUIET_BENCH_MAX_RUNS", "2"))


def _probe_session():
    sys.path.insert(0, REPO)
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="quiet_bench_probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def shuffle_probe(spark) -> tuple[float, float]:
    """(shuffle_sec, nosh_sec) for the fixed probe jobs."""
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(0, 4_000_000, 1, 32).withColumn(
        "k", F.col("id") % 100_000
    ).groupBy("k").agg(F.sum("id").alias("s")).agg(F.sum("s")).collect()
    sh = time.time() - t0
    t0 = time.time()
    spark.range(0, 8_000_000, 1, 32).selectExpr("sum(id * 3 + 1)").collect()
    return sh, time.time() - t0


def wait_for_quiet(spark, log) -> None:
    n = 0
    streak = 0
    while True:
        sh, nosh = shuffle_probe(spark)
        n += 1
        ok = n >= MIN_PROBES and sh <= ABS_CAP_S
        streak = streak + 1 if ok else 0
        log(
            f"probe shuffle={sh:.3f}s nosh={nosh:.3f}s "
            f"{'OK' if ok else 'noisy'} streak={streak}/{STREAK}"
        )
        if streak >= STREAK:
            return
        time.sleep(PROBE_EVERY_S)


def record_flags(path: str) -> int:
    try:
        with open(path) as f:
            rec = json.load(f)
    except OSError:
        return -1
    return len(
        set(rec.get("sentinel_flagged") or [])
        | set(rec.get("sentinel_jvm_flagged") or [])
    )


def main() -> int:
    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/quiet_bench_run"

    def log(msg: str) -> None:
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    spark = _probe_session()
    shuffle_probe(spark)  # pay codegen/JIT outside the readings
    for attempt in range(1, MAX_RUNS + 1):
        wait_for_quiet(spark, log)
        out = f"{prefix}{attempt}.out"
        err = f"{prefix}{attempt}.err"
        cand = os.path.join(REPO, "BENCH_LOCAL.candidate.json")
        # a stale candidate from an earlier attempt would read as this
        # attempt's quarantine — clear it before launching
        if os.path.exists(cand):
            os.remove(cand)
        log(f"quiet window — launching bench.py (attempt {attempt})")
        t0 = time.time()
        with open(out, "w") as fo, open(err, "w") as fe:
            rc = subprocess.call(
                [sys.executable, os.path.join(REPO, "bench.py")],
                stdout=fo,
                stderr=fe,
                cwd=REPO,
            )
        dt = time.time() - t0
        quar = os.path.exists(cand)
        log(
            f"bench rc={rc} wall={dt:.0f}s "
            f"canonical_flags={record_flags(os.path.join(REPO, 'BENCH_LOCAL.json'))} "
            f"candidate_flags={record_flags(cand)} quarantined={quar}"
        )
        if rc == 0 and not quar:
            log("record accepted (not quarantined)")
            return 0
        log("record quarantined or failed — waiting for next window")
    return 1


if __name__ == "__main__":
    sys.exit(main())
