"""Measure the round-11 SemanticDedup production scale mode.

Two measurements, one JSON record (bench_semdedup_prod.json):

1. DECADE WALL for ``SemanticDedup.dedup`` under the three sizings —
   pinned 16 cells (the round-10 gate constant, quadratic-per-cell),
   ``num_cells="auto"`` (sqrt-N — N^1.5 total), and the new
   ``target_cell_size`` mode (cells ≈ N/k — LINEAR total) — at
   sf0.1 (testdata), sf0.5 and sf1.0 (.scale decade corpora). The
   round-10 verdict's ask: production sizing shows ~linear wall
   sf0.1 → sf1.0 where the pinned gate showed 15.9×.

2. MARGIN-PROBE RECALL at matched ground truth: plant near-duplicate
   vectors (seeded perturbations) into the sf0.1 embeddings, then
   compare full Hamming-1 multi-probe vs the margin-pruned variant on
   (a) recall of the planted pairs at cosine >= 0.99 and (b) candidate
   volume. The verdict's bar: >= 2x fewer candidates at equal recall.

Usage: python tools/bench_semdedup_prod.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = 100  # production target cell size for the decade runs
SEM_T = 0.42  # same threshold as the gated queries


def _timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "bench_semdedup_prod.json"
    )
    from pyspark.sql import functions as F

    from sparker_spark.llm.dedup import SemanticDedup
    from sparker_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="semdedup_prod",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    record: dict = {
        "metric": "semdedup_prod",
        "unit": "sec",
        "target_cell_size": TARGET,
        "threshold": SEM_T,
        "cpus": int(cpus),
        "decade": {},
        "margin": {},
    }

    # ---------------------------------------------------- decade wall
    sfs = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf0.5": os.path.join(REPO, ".scale", "sf0.5"),
        "sf1.0": os.path.join(REPO, ".scale", "sf1.0"),
    }
    for name, d in sfs.items():
        p = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(p):
            continue
        emb = spark.read.parquet(p)
        n = emb.count()
        row = {"n_vectors": n}
        for mode, kwargs in (
            ("pinned16", {"num_cells": 16}),
            ("auto_sqrtN", {"num_cells": "auto"}),
            ("prod_target", {"target_cell_size": TARGET}),
        ):
            wall, rows = _timed(
                lambda kw=kwargs: SemanticDedup.dedup(
                    emb, SEM_T, **kw
                ).count()
            )
            row[mode] = {"wall_sec": wall, "rows": rows}
        record["decade"][name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    # ------------------------------------- margin recall measurement
    # plant 200 seeded near-duplicates into the sf0.1 embeddings:
    # vec N+i is a small perturbation of vec i*10 — ground truth is
    # the planted (i*10, N+i) pair set at cosine >= 0.99
    import random

    emb = spark.read.parquet(sfs["sf0.1"] + "/embeddings.parquet")
    base = emb.collect()
    n0 = len(base)
    rng = random.Random(42)
    planted = []
    truth = set()
    for i in range(200):
        src = base[(i * 10) % n0]
        vec = [float(x) + rng.gauss(0.0, 0.002) for x in src["embedding"]]
        planted.append((n0 + i, vec))
        truth.add((src["vec_id"], n0 + i))
    fix = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in base]
        + planted,
        "vec_id long, embedding array<double>",
    ).repartition(int(cpus))

    thr = 0.99
    for mode, kwargs in (
        ("home_only", {}),
        ("full_probe", {"multi_probe": True}),
        ("margin_probe", {"multi_probe": "margin", "probe_margin": 0.05}),
        ("margin_probe_02", {"multi_probe": "margin", "probe_margin": 0.2}),
    ):
        common = {"num_cells": 256, **kwargs}
        cands = SemanticDedup.pairs(fix, None, **common).count()
        got = {
            (r["p1"], r["p2"])
            for r in SemanticDedup.pairs(fix, thr, **common)
            .select("p1", "p2")
            .collect()
        }
        hit = len(truth & got)
        record["margin"][mode] = {
            "candidates": cands,
            "planted_recall": round(hit / len(truth), 4),
            "pairs_found": len(got),
        }
        print(f"# {mode}: {record['margin'][mode]}", file=sys.stderr)

    fp = record["margin"].get("full_probe", {})
    mp = record["margin"].get("margin_probe", {})
    if fp and mp:
        record["margin"]["candidate_ratio_full_over_margin"] = round(
            fp["candidates"] / max(1, mp["candidates"]), 2
        )

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
