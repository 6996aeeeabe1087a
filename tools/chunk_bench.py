"""Chunked quiet-gated bench driver (r12 measurement hygiene, v2).

tools/quiet_bench.py gates a WHOLE bench run on a quiet window, but the
r12 host's quiet windows last ~3-5 min while a 27-query subset run
needs 12-30 min — every full attempt straddled a burst and came back
with sentinel-flagged entries. Since bench.py puts a clearCache+GC
barrier between EVERY query (r9 series break), per-query warm medians
are independent of which process measured them; so this driver shrinks
the timed unit instead: run 1-4 queries per bench.py invocation, gate
each invocation on the same shuffle probe, adjudicate each chunk with
the per-query JVM sentinel bench.py already records, and retry only
the chunks (not the whole subset) that a burst hit.

Accept criterion per chunk attempt: every query's jvm sentinel
<= JVM_SENT_CAP_S (quiet band measured on this host: 0.10-0.45 s,
burst-hit segments 0.7-5 s) AND every query's py sentinel <=
PY_SENT_CAP_S. On accept the chunk's queries/cold/sentinel entries
merge into the output record; on reject the driver waits for quiet
and retries the chunk up to MAX_TRIES times, then keeps the attempt
with the smallest chunk-total as a flagged fallback (reported in
"unresolved" so the record is honest about which entries never got a
clean window).

Usage:
  python tools/chunk_bench.py OUT.json q1,q2 q3 "q4,q5" ...
Each positional arg is one chunk (comma-separated query names).
Environment (SPARK_GRAFT_*) passes through to bench.py unchanged.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_EVERY_S = 40
STREAK = 2
ABS_CAP_S = float(os.environ.get("QUIET_BENCH_ABS_CAP_S", "1.0"))
JVM_SENT_CAP_S = float(os.environ.get("CHUNK_JVM_SENT_CAP_S", "0.6"))
PY_SENT_CAP_S = float(os.environ.get("CHUNK_PY_SENT_CAP_S", "0.35"))
MAX_TRIES = int(os.environ.get("CHUNK_MAX_TRIES", "4"))
SUBSET_ARTIFACT = os.path.join(REPO, "BENCH_SUBSET_LOCAL.json")


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def probe_session():
    sys.path.insert(0, REPO)
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="chunk_bench_probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def shuffle_probe(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.time()
    spark.range(0, 4_000_000, 1, 32).withColumn(
        "k", F.col("id") % 100_000
    ).groupBy("k").agg(F.sum("id").alias("s")).agg(F.sum("s")).collect()
    return time.time() - t0


def wait_for_quiet(spark) -> None:
    streak = 0
    while True:
        sh = shuffle_probe(spark)
        ok = sh <= ABS_CAP_S
        streak = streak + 1 if ok else 0
        log(f"probe shuffle={sh:.3f}s {'OK' if ok else 'noisy'} "
            f"streak={streak}/{STREAK}")
        if streak >= STREAK:
            return
        time.sleep(PROBE_EVERY_S)


def run_chunk(chunk: list[str], tag: str) -> dict | None:
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = ",".join(chunk)
    if os.path.exists(SUBSET_ARTIFACT):
        os.remove(SUBSET_ARTIFACT)
    out = f"/tmp/chunk_{tag}.out"
    err = f"/tmp/chunk_{tag}.err"
    t0 = time.time()
    with open(out, "w") as fo, open(err, "w") as fe:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "bench.py")],
            stdout=fo, stderr=fe, cwd=REPO, env=env,
        )
    dt = time.time() - t0
    if rc != 0 or not os.path.exists(SUBSET_ARTIFACT):
        log(f"chunk {tag}: bench rc={rc} wall={dt:.0f}s — no artifact")
        return None
    with open(SUBSET_ARTIFACT) as f:
        rec = json.load(f)
    log(f"chunk {tag}: rc=0 wall={dt:.0f}s "
        + " ".join(f"{q}={rec['queries'].get(q, float('nan')):.2f}s"
                   f"/j{rec['sentinel_jvm'].get(q, float('nan')):.2f}"
                   for q in chunk))
    return rec


def chunk_clean(rec: dict, chunk: list[str]) -> bool:
    for q in chunk:
        if q not in rec.get("queries", {}):
            return False
        if rec["sentinel_jvm"].get(q, 99.0) > JVM_SENT_CAP_S:
            return False
        if rec["sentinel"].get(q, 99.0) > PY_SENT_CAP_S:
            return False
    return True


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    out_path = sys.argv[1]
    chunks = [[q.strip() for q in a.split(",") if q.strip()]
              for a in sys.argv[2:]]
    merged: dict = {
        "metric": "chunked_quiet_bench",
        "unit": "sec",
        "queries": {}, "cold": {}, "sentinel": {}, "sentinel_jvm": {},
        "attempts": {}, "unresolved": [],
        "method": (
            "per-chunk quiet-gated bench.py runs (SPARK_GRAFT_ONLY), "
            f"accepted when every query's jvm sentinel <= {JVM_SENT_CAP_S}s "
            f"and py sentinel <= {PY_SENT_CAP_S}s; medians are clean-JVM-"
            "warm exactly as in the full record (bench.py barriers between "
            "every query), so entries are comparable to BENCH_LOCAL.json"
        ),
    }
    spark = probe_session()
    shuffle_probe(spark)  # pay codegen outside readings
    for ci, chunk in enumerate(chunks):
        accepted = None
        best_fallback = None
        for attempt in range(1, MAX_TRIES + 1):
            wait_for_quiet(spark)
            rec = run_chunk(chunk, f"c{ci}a{attempt}")
            if rec is None:
                continue
            tot = sum(rec["queries"].get(q, 0.0) for q in chunk)
            if best_fallback is None or tot < best_fallback[0]:
                best_fallback = (tot, rec, attempt)
            if chunk_clean(rec, chunk):
                accepted = (rec, attempt)
                break
            log(f"chunk {ci} attempt {attempt}: sentinel-contaminated, retrying")
        if accepted is None and best_fallback is None:
            log(f"chunk {ci} FAILED every attempt — skipping {chunk}")
            merged["unresolved"].extend(chunk)
            continue
        rec, attempt = accepted if accepted else (best_fallback[1],
                                                  best_fallback[2])
        if accepted is None:
            log(f"chunk {ci}: no clean window in {MAX_TRIES} tries — "
                "keeping min-total attempt, marked unresolved")
            merged["unresolved"].extend(chunk)
        for q in chunk:
            for field in ("queries", "cold", "sentinel", "sentinel_jvm"):
                if q in rec.get(field, {}):
                    merged[field][q] = rec[field][q]
            merged["attempts"][q] = attempt
        merged["sf"] = rec.get("sf")
        merged["reps"] = rec.get("reps")
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
            f.write("\n")
    merged["value"] = round(sum(merged["queries"].values()), 3)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    log(f"done: {len(merged['queries'])} entries, "
        f"{len(merged['unresolved'])} unresolved -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
