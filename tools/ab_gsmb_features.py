"""Interleaved same-session A/B: r12 generate_features (SMJ sides,
per-leg stats) vs r13 (checkpointed side_base + broadcast sides).
Times feats.select(...).count() — the registry query's timed action —
alternating variants so host drift hits both equally.
Usage: python tools/ab_gsmb_features.py [reps=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402


def generate_features_old(blocks, groundtruth=None, id_map=None):
    """The r12 body (pre-r13): per-leg per_profile ⟕ stats, planner
    joins (SMJ on the pair side)."""
    from sparker_spark.feature_generator import FeatureGenerator

    meta = blocks.meta.select("block_id", "block_size", "comparisons")
    asg = blocks.assignments.select("block_id", "profile_id", "source_id")
    pb = asg.join(meta, "block_id")
    per_profile = pb.groupBy("profile_id").agg(
        F.count("*").alias("num_blocks"),
        F.sum(1.0 / F.col("block_size")).alias("inv_size_sum"),
        F.sum(F.col("comparisons").cast("double")).alias("comp_sum"),
        F.sum(1.0 / F.col("comparisons")).alias("inv_comp_sum"),
    )
    totals = blocks.meta.agg(
        F.count("*").alias("b"), F.sum("comparisons").alias("t")
    ).first()
    num_blocks_total = totals["b"]
    total_comparisons = totals["t"] or 0
    pairs = None
    if not blocks.clean:
        sizes = blocks.meta.agg(
            F.count("*").alias("b"),
            F.sum(F.col("block_size") * F.col("block_size")).alias("ss"),
        ).first()
        if sizes["b"] <= 63:
            n_profiles = asg.select("profile_id").distinct().count()
            if n_profiles * n_profiles < (sizes["ss"] or 0):
                pairs = FeatureGenerator._pairs_bitmask(meta, asg)
    assert pairs is not None, "A/B expects the bitmask regime"
    pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(F.col("p1").alias("pid"), "cbs").unionByName(
        pairs.select(F.col("p2").alias("pid"), "cbs")
    )
    stats = sym.groupBy("pid").agg(
        F.sum("cbs").alias("red_n"), F.count("*").alias("nonred_n")
    )
    dirty_red = F.lit(0.0) if blocks.clean else F.col("num_blocks").cast("double")
    dirty_nonred = F.lit(0) if blocks.clean else F.lit(1)

    def side(name):
        return (
            per_profile.join(stats, per_profile.profile_id == stats.pid, "left")
            .select(
                F.col("profile_id").alias(name),
                F.col("num_blocks").alias(f"nb_{name}"),
                F.col("inv_size_sum").alias(f"invsize_{name}"),
                F.col("comp_sum").alias(f"comp_{name}"),
                F.col("inv_comp_sum").alias(f"invcomp_{name}"),
                (F.coalesce("red_n", F.lit(0.0)) + dirty_red).alias(f"red_{name}"),
                (F.coalesce("nonred_n", F.lit(0)) + dirty_nonred).alias(
                    f"nonred_{name}"
                ),
            )
        )

    e = pairs.join(side("p1"), "p1").join(side("p2"), "p2")
    B = F.lit(float(num_blocks_total))
    T = F.lit(float(total_comparisons))
    cbs = F.col("cbs")
    raccb = F.greatest(F.col("raccb_raw"), F.lit(1.0e-6))
    js = cbs / (F.col("red_p1") + F.col("red_p2") - cbs)
    cfibf = cbs * F.log(B / F.col("nb_p1")) * F.log(B / F.col("nb_p2"))
    js1 = cbs / (F.col("nb_p1") + F.col("nb_p2") - cbs)
    aejs = js1 * F.log(T / F.col("comp_p1")) * F.log(T / F.col("comp_p2"))
    nrs = F.col("rs") / (F.col("invsize_p1") + F.col("invsize_p2") - F.col("rs"))
    wjs = raccb / (F.col("invcomp_p1") + F.col("invcomp_p2") - raccb)
    out = e.select(
        "p1",
        "p2",
        cfibf.cast("float").alias("cfibf"),
        raccb.cast("float").alias("raccb"),
        js.cast("float").alias("js"),
        F.col("nonred_p1").cast("long").alias("numCompP1"),
        F.col("nonred_p2").cast("long").alias("numCompP2"),
        F.col("rs").cast("float").alias("rs"),
        aejs.cast("float").alias("aejs"),
        nrs.cast("float").alias("nrs"),
        wjs.cast("float").alias("wjs"),
    )
    return out.withColumn("is_match", F.lit(None).cast("int"))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from sparker_spark.entry import FILTER_R, _doc_keys_unigram
    from sparker_spark.feature_generator import FeatureGenerator
    from sparker_spark.filters import BlockFiltering, BlockPurging
    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.entry_ext import GSMB_SMOOTH
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="ab_gsmb", master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    def one(tag, fn):
        spark.catalog.clearCache()
        gc.collect()
        keys = _doc_keys_unigram(spark, SF_DIR).cache()
        blocks = Blocking.blocks_from_keys(keys, clean=False, assign_ids=False)
        purged = BlockPurging.block_purging(blocks, GSMB_SMOOTH)
        _, _, rebuilt = BlockFiltering.block_filtering_quick(purged, FILTER_R)
        rebuilt.cache()
        t0 = time.time()
        n = fn(rebuilt).count()
        dt = time.time() - t0
        print(f"{tag}: {dt:.2f}s rows={n}", flush=True)
        return dt

    # pay first-touch once, outside readings
    one("warmup-new", FeatureGenerator.generate_features)
    olds, news = [], []
    for i in range(reps):
        olds.append(one(f"old[{i}]", generate_features_old))
        news.append(one(f"new[{i}]", FeatureGenerator.generate_features))
    print(f"old: {sorted(olds)}  median={sorted(olds)[len(olds)//2]:.2f}")
    print(f"new: {sorted(news)}  median={sorted(news)[len(news)//2]:.2f}")


if __name__ == "__main__":
    main()
