"""Physical-plan health audit over every registered query.

For each entry in the query registry, builds the DataFrame at a small
SF and inspects the formatted physical plan for scale anti-patterns:

  * BroadcastNestedLoopJoin / CartesianProduct — a raw inequality or
    cross join that will not survive scale-out (allowed only for the
    two documented exact-baseline queries that are crossJoin BY DESIGN)
  * parquet scans reading all columns when the query projects few
    (column pruning failure) — reported, not fatal

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit code 1 if any query outside the allowlist plans a nested loop.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# crossJoin by design: documented O(n²) exact baselines whose scale
# path is the IVF/LSH variant graded alongside
ALLOW_NESTED = {
    "dedup_embedding_cosine",
    "ann_topk_cosine",
    # same bounded exact-anchor crossJoin as ann_topk_cosine (query side
    # is the vec_id % MOD slice); the scale path is IVFIndex.search
    "knn_label_vote",
}

# wide scans that ARE the query's semantics, not pruning failures —
# annotated so the audit's non-clean lines are self-explaining
ALLOW_WIDE = {
    "tpch_q1": "legitimate: Q1 aggregates 7 lineitem columns "
    "(quantity/extendedprice/discount/tax + returnflag/linestatus + "
    "shipdate filter) — the projection genuinely needs them",
    "pack_shard_manifest": "legitimate: the manifest read-back returns "
    "ALL 7 manifest columns (epoch/shard/path/n_seqs/token_count/"
    "min_order/max_order) — the relation IS the output, nothing to "
    "prune",
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from sparker_spark.entry import QUERIES
    from sparker_spark.session import get_spark

    spark = get_spark(app_name="audit_plans", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    bad = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # construction failure is itself a finding
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad.append(name)
            continue
        wide_scans = sum(
            1
            for m in re.finditer(r"ReadSchema: struct<([^>]*)", plan)
            if m.group(1).count(",") >= 6
        )
        # Judge each nested-loop operator by ITS OWN formatted-explain
        # detail block, not the whole plan: the <=63-block mega-block
        # mask loop (weights._co_occurrence_bitmask /
        # FeatureGenerator._pairs_bitmask) is an OUTPUT-OPTIMAL
        # quadratic loop recognizable by the bit_count(mask) condition
        # ON THE JOIN NODE itself — a plan-wide "mentions bit_count"
        # test would silently waive an unrelated accidental cross join
        # elsewhere in the same query.
        detail_blocks = re.split(r"\n\s*\n", plan)
        nested_blocks = [
            b
            for b in detail_blocks
            if re.match(
                r"\(\d+\)\s+(BroadcastNestedLoopJoin|CartesianProduct)", b
            )
        ]
        nested = len(nested_blocks)
        mask_loops = sum(1 for b in nested_blocks if "bit_count" in b)
        unexempt = nested - mask_loops
        flags = []
        if unexempt and name not in ALLOW_NESTED:
            flags.append(f"NESTED_LOOP x{unexempt}")
            bad.append(name)
        elif nested:
            kind = "mask-loop" if mask_loops == nested else "allowed by design"
            flags.append(f"nested-loop ({kind}) x{nested}")
        if wide_scans:
            note = ALLOW_WIDE.get(name)
            flags.append(
                f"wide-scan x{wide_scans}"
                + (f" ({note})" if note else "")
            )
        status = "WARN" if flags else "ok"
        print(f"{status:4s} {name}: {', '.join(flags) if flags else 'clean'}")

    if bad:
        print(f"\nFAIL: {len(bad)} queries with scale anti-patterns: {bad}")
        sys.exit(1)
    print("\nall plans healthy")


if __name__ == "__main__":
    main()
