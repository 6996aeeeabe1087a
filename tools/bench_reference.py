"""Head-to-head throughput: reference SparkER (RDD) vs this engine
(DataFrame) on the SAME data, session, and stage parameters.

BASELINE.md records that the reference publishes no absolute numbers,
so this tool MEASURES them: the maintained Python reference pipeline
(load -> token blocking -> purging (1.005) -> filtering (0.8) ->
WNP CBS/AVG/OR, exactly the Dirty-datasets notebook flow) against our
equivalent operators, on the documents table at a chosen SF. The
parity tests (tests/test_reference_parity.py) prove the two compute
identical edge sets on cora; this tool compares wall time at scale.

Usage: python tools/bench_reference.py [sf_dir]
Prints one JSON line: {"reference": {...}, "ours": {...}, "sf": ...}.

Stage timings include each side's own materialization idiom — the
reference's driver-collected broadcast block index is charged to the
reference (it is the documented memory cliff, AllTest.scala:440-452),
our caches to us.

COLD vs WARM (r8): each (engine, regime) leg now runs BENCH_REF_REPS
times (default 2) inside its one JVM, with all caches/persistent RDDs
swept between reps so every rep recomputes the full work. Rep 0 is the
COLD leg (carries first-plan codegen/JIT for that engine's operators);
the best later rep is the WARM leg — the steady-state number a long-
running session sees. BASELINE.md's r7 claim that the token-regime
filtering gap is codegen warmup was previously supported only by a
side measurement; the warm column now measures it in the same harness.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
REFERENCE_PY = "/root/reference/python"

# executor Python workers must be able to unpickle the reference's
# closures — they inherit PYTHONPATH from the JVM (same trick as
# tests/conftest.py); must be set BEFORE the session starts
_extra = f"{_REPO}:{REFERENCE_PY}"
os.environ["PYTHONPATH"] = (
    _extra + ":" + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _extra
)

SMOOTH = 1.005
FILTER_R = 0.8


def _ref_word_shingles(attributes, keys_to_exclude=None,
                       attributes_to_exclude=None, size=3):
    """Word-3-shingle blocking keys for the reference engine, mirroring
    sparker_spark.llm.shingles.shingles exactly (lower, split on \\s+,
    windows of `size` joined by spaces) so both engines build identical
    blocks. Same per-profile pure-Python shape as the reference's own
    BlockingKeysStrategies.token_blocking."""
    import re

    out = set()
    for a in attributes:
        toks = re.split(r"\s+", a.value.lower())
        if len(toks) >= size:
            out |= {
                " ".join(toks[i : i + size]) for i in range(len(toks) - size + 1)
            }
    return out


def bench_reference(spark, sf_dir, regime="token"):
    sys.path.insert(0, REFERENCE_PY)
    import sparker as ref

    import pandas as pd

    t = {}
    t0 = time.time()
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    profiles = ref.PandasWrapper.load_profiles(pdf, real_id_field="doc_id")
    profiles.cache()
    max_profile_id = profiles.map(lambda p: p.profile_id).max()
    t["load"] = round(time.time() - t0, 3)

    if regime == "gsmb":
        # supervised meta-blocking feature generation (9 features per
        # co-occurring pair) over purge(1.025)+filter(0.8) token blocks
        t0 = time.time()
        blocks = ref.Blocking.create_blocks(profiles)
        purged = ref.BlockPurging.block_purging(blocks, 1.025)
        (_, _, rebuilt) = ref.BlockFiltering.block_filtering_quick(purged, FILTER_R)
        rebuilt.cache()
        n_blocks = rebuilt.count()
        t["blocking"] = round(time.time() - t0, 3)

        t0 = time.time()
        feats = ref.FeatureGenerator.generate_features(
            profiles, rebuilt, convert_ids=False
        )
        n_feats = feats.count()
        t["features"] = round(time.time() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        t["counts"] = {"blocks": n_blocks, "features": int(n_feats)}
        sys.path.remove(REFERENCE_PY)
        return t

    if regime == "shingle":
        # realistic block-size distribution (matches the bench's
        # er_wnp_cbs_avg_or): shingle blocks, no purge/filter
        t0 = time.time()
        blocks = ref.Blocking.create_blocks(
            profiles, blocking_method=_ref_word_shingles
        )
        blocks.cache()
        n_blocks = blocks.count()
        t["blocking"] = round(time.time() - t0, 3)

        t0 = time.time()
        pb = ref.Converters.blocks_to_profile_blocks(blocks).cache()
        sc = spark.sparkContext
        block_index = sc.broadcast(
            blocks.map(lambda b: (b.block_id, b.profiles)).collectAsMap()
        )
        pbsi = sc.broadcast(
            pb.map(lambda x: (x.profile_id, len(x.blocks))).collectAsMap()
        )
        results = ref.WNP.wnp(
            pb,
            block_index,
            max_profile_id,
            weight_type=ref.WeightTypes.CBS,
            threshold_type=ref.ThresholdTypes.AVG,
            comparison_type=ref.ComparisonTypes.OR,
            profile_blocks_size_index=pbsi,
        )
        n_edges = results.map(lambda x: len(x[2])).sum()
        t["wnp_cbs_avg_or"] = round(time.time() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        t["counts"] = {"blocks": n_blocks, "edges": int(n_edges)}
        sys.path.remove(REFERENCE_PY)
        return t

    t0 = time.time()
    blocks = ref.Blocking.create_blocks(profiles)
    blocks.cache()
    n_blocks = blocks.count()
    t["blocking"] = round(time.time() - t0, 3)

    t0 = time.time()
    purged = ref.BlockPurging.block_purging(blocks, SMOOTH)
    purged.cache()
    n_purged = purged.count()
    t["purging"] = round(time.time() - t0, 3)

    t0 = time.time()
    (_, pb_filtered, rebuilt) = ref.BlockFiltering.block_filtering_quick(
        purged, FILTER_R
    )
    pb_filtered.cache()
    rebuilt.cache()
    n_after = rebuilt.count()
    t["filtering"] = round(time.time() - t0, 3)

    t0 = time.time()
    sc = spark.sparkContext
    block_index = sc.broadcast(
        rebuilt.map(lambda b: (b.block_id, b.profiles)).collectAsMap()
    )
    pbsi = sc.broadcast(
        pb_filtered.map(lambda pb: (pb.profile_id, len(pb.blocks))).collectAsMap()
    )
    results = ref.WNP.wnp(
        pb_filtered,
        block_index,
        max_profile_id,
        weight_type=ref.WeightTypes.CBS,
        threshold_type=ref.ThresholdTypes.AVG,
        comparison_type=ref.ComparisonTypes.OR,
        profile_blocks_size_index=pbsi,
    )
    n_edges = results.map(lambda x: len(x[2])).sum()
    t["wnp_cbs_avg_or"] = round(time.time() - t0, 3)

    t["total"] = round(sum(t.values()), 3)
    t["counts"] = {
        "blocks": n_blocks,
        "purged": n_purged,
        "filtered": n_after,
        "edges": int(n_edges),
    }
    sys.path.remove(REFERENCE_PY)
    return t


def bench_ours(spark, sf_dir, regime="token"):
    from pyspark.sql import functions as F

    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.blocking.converters import Converters
    from sparker_spark.entry import _doc_keys_shingle, _doc_keys_unigram
    from sparker_spark.filters import BlockFiltering, BlockPurging
    from sparker_spark.metablocking.pruning_utils import (
        ComparisonTypes,
        ThresholdTypes,
        WeightTypes,
    )
    from sparker_spark.metablocking.weights import EdgeWeighting
    from sparker_spark.metablocking.wnp import WNP

    if regime == "gsmb":
        from sparker_spark.feature_generator import FeatureGenerator

        t = {}
        t0 = time.time()
        keys = _doc_keys_unigram(spark, sf_dir).cache()
        keys.count()
        t["load"] = round(time.time() - t0, 3)

        t0 = time.time()
        # hash block ids (assign_ids=False): the id scheme does not
        # change block membership or edge/feature sets (parity suite);
        # the dense-id global_rank's range shuffle is pure overhead here
        blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
        purged = BlockPurging.block_purging(blocks, 1.025)
        _, _, rebuilt = BlockFiltering.block_filtering_quick(purged, FILTER_R)
        rebuilt.meta.cache()
        rebuilt.assignments.cache()
        n_blocks = rebuilt.meta.count()
        t["blocking"] = round(time.time() - t0, 3)

        t0 = time.time()
        feats = FeatureGenerator.generate_features(rebuilt)
        n_feats = feats.count()
        t["features"] = round(time.time() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        t["counts"] = {"blocks": n_blocks, "features": n_feats}
        return t

    if regime == "shingle":
        t = {}
        t0 = time.time()
        keys = _doc_keys_shingle(spark, sf_dir).cache()
        keys.count()
        t["load"] = round(time.time() - t0, 3)

        t0 = time.time()
        blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
        blocks.meta.cache()
        blocks.assignments.cache()
        n_blocks = blocks.meta.count()
        t["blocking"] = round(time.time() - t0, 3)

        t0 = time.time()
        pb = Converters.blocks_to_profile_blocks(blocks).cache()
        ctx = EdgeWeighting.weighted_edges(blocks, pb, WeightTypes.CBS)
        kept = WNP.prune(ctx, ThresholdTypes.AVG, ComparisonTypes.OR)
        n_edges = kept.count()
        t["wnp_cbs_avg_or"] = round(time.time() - t0, 3)
        t["total"] = round(sum(t.values()), 3)
        t["counts"] = {"blocks": n_blocks, "edges": n_edges}
        return t

    t = {}
    t0 = time.time()
    keys = _doc_keys_unigram(spark, sf_dir).cache()
    keys.count()
    t["load"] = round(time.time() - t0, 3)

    t0 = time.time()
    # hash block ids (assign_ids=False): the id scheme does not
    # change block membership or edge/feature sets (parity suite);
    # the dense-id global_rank's range shuffle is pure overhead here
    blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
    blocks.meta.cache()
    blocks.assignments.cache()
    n_blocks = blocks.meta.count()
    t["blocking"] = round(time.time() - t0, 3)

    t0 = time.time()
    purged = BlockPurging.block_purging(blocks, SMOOTH)
    n_purged = purged.meta.count()
    t["purging"] = round(time.time() - t0, 3)

    t0 = time.time()
    _, pb_filtered, rebuilt = BlockFiltering.block_filtering_quick(purged, FILTER_R)
    pb_filtered.cache()
    rebuilt.meta.cache()
    rebuilt.assignments.cache()
    n_after = rebuilt.meta.count()
    t["filtering"] = round(time.time() - t0, 3)

    t0 = time.time()
    kept = WNP.wnp(
        rebuilt,
        pb_filtered,
        threshold_type=ThresholdTypes.AVG,
        weight_type=WeightTypes.CBS,
        comparison_type=ComparisonTypes.OR,
    )
    n_edges = kept.count()
    t["wnp_cbs_avg_or"] = round(time.time() - t0, 3)

    t["total"] = round(sum(t.values()), 3)
    t["counts"] = {
        "blocks": n_blocks,
        "purged": n_purged,
        "filtered": n_after,
        "edges": n_edges,
    }
    return t


def _run_one(sf_dir, engine, regime):
    from sparker_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"bench_reference_{engine}_{regime}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the shared one-time machinery so neither side pays
    # first-touch costs in its timed legs. All of this is data-free
    # and engine-symmetric: it initializes the runtime both engines
    # sit on (JVM, codegen compiler, parquet datasource, python
    # workers, pandas/pyarrow), not any operator under test.
    # - trivial agg: JVM + scheduler
    spark.range(1000).selectExpr("sum(id)").collect()
    # - janino/whole-stage-codegen class loading (~1-2 s the first
    #   time ANY nontrivial plan compiles; per-plan cost afterwards
    #   is the steady-state ~0.1-0.3 s both engines should pay)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    warm = spark.range(256).select(
        F.col("id"), F.split(F.lit("a b c"), " ").alias("t")
    )
    warm.select(
        F.explode("t").alias("x"), "id",
        F.row_number().over(Window.partitionBy("id").orderBy("id")).alias("r"),
    ).join(F.broadcast(spark.range(8)), "id", "left").count()
    # - parquet reader/writer init (hadoop fs + parquet-mr classes for
    #   the DataFrame engine, pyarrow for the pandas path the
    #   reference loader uses)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.range(16).write.mode("overwrite").parquet(f"{d}/warm.parquet")
        spark.read.parquet(f"{d}/warm.parquet").count()
        import pandas as pd

        pd.read_parquet(f"{d}/warm.parquet")
    # - python worker pool (the reference computes in RDD lambdas;
    #   our side uses it for Arrow batches)
    spark.sparkContext.parallelize(range(32), 8).map(lambda x: x + 1).count()
    fn = bench_ours if engine == "ours" else bench_reference
    reps = max(1, int(os.environ.get("BENCH_REF_REPS", "2")))
    runs = []
    for i in range(reps):
        if i:
            _sweep_session(spark)
        runs.append(fn(spark, sf_dir, regime))
    # historical schema: top-level stage timings are the COLD rep
    rec = dict(runs[0])
    rec["cold_total"] = runs[0]["total"]
    if len(runs) > 1:
        warm = min(runs[1:], key=lambda r: r["total"])
        rec["warm"] = {k: v for k, v in warm.items() if k != "counts"}
        rec["warm_total"] = warm["total"]
    print("RESULT" + json.dumps(rec))


def _sweep_session(spark):
    """Drop every cached DataFrame and persistent RDD so a warm rep
    recomputes the full work (JIT/codegen stay warm — that is the
    point); without the sweep rep 2 would partially read rep 1's
    caches and measure I/O, not the operators."""
    import gc

    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    gc.collect()


def main():
    # Each (engine, regime) combo runs in its OWN subprocess/JVM:
    # within one session, accumulated caches/checkpoints from an
    # earlier combo inflate a later combo's GC time by 1.5-2x
    # (measured), which would mis-attribute costs.
    import subprocess

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 3 and sys.argv[2] == "--one":
        _run_one(sf_dir, sys.argv[3], sys.argv[4])
        return

    out = {"sf": sf_dir.rstrip("/").split("sf")[-1]}
    for regime in ("shingle", "token", "gsmb"):
        res = {}
        for engine in ("ours", "reference"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf_dir, "--one",
                 engine, regime],
                capture_output=True, text=True, timeout=1200,
            )
            line = [
                ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT")
            ]
            if not line:
                raise RuntimeError(
                    f"{engine}/{regime} failed:\n{proc.stderr[-2000:]}"
                )
            res[engine] = json.loads(line[-1][len("RESULT"):])
        entry = {
            "reference": res["reference"],
            "ours": res["ours"],
            "speedup_total": round(
                res["reference"]["total"] / res["ours"]["total"], 2
            ),
        }
        if "warm_total" in res["reference"] and "warm_total" in res["ours"]:
            entry["speedup_warm_total"] = round(
                res["reference"]["warm_total"] / res["ours"]["warm_total"], 2
            )
        out[regime] = entry
    print(json.dumps(out))


if __name__ == "__main__":
    main()
