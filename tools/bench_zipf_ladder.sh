#!/bin/bash
# INDEPENDENT (non-tiled) scale-ladder decades — verdict r11 ask #4:
# fresh seeded Zipf corpora per rung (tools/gen_zipf_ladder.py), so LM
# state growth measures Heaps' law and gsmb pair growth measures the
# plan, with none of the ~k-tiling artifacts (shared vocabulary within
# a replica / suffix-stripped cross-replica pairs).
#
# Rungs: n5000 (~sf0.1-sized corpus), n50000 (10x), n500000 (100x).
# Queries: the order-5 LM family (unpruned / pruned / Kneser-Ney) and
# the gsmb e2e pipeline. Copies each subset record to
# bench_zipf_<rung>.json.
#
# Prereq: python tools/gen_zipf_ladder.py  (writes .scale/zipf/n*/).
set -e
cd "$(dirname "$0")/.."
Q=text_lm5_logprob,text_lm5_pruned_logprob,text_lm5_kn_logprob,pipeline_gsmb_e2e
for n in 5000 50000 500000; do
  dir=".scale/zipf/n$n"
  echo "== n$n ($dir)" >&2
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_ONLY="$Q" python bench.py 2> "/tmp/zipf_n$n.err"
  cp BENCH_SUBSET_LOCAL.json "bench_zipf_n$n.json"
done
python - <<'EOF'
import json
prev = None
for n in (5000, 50000, 500000):
    d = json.load(open(f"bench_zipf_n{n}.json"))
    q = d["queries"]
    line = f"n{n}: " + " ".join(f"{k}={v}s" for k, v in sorted(q.items()))
    if prev:
        ratios = {
            k: round(q[k] / prev[k], 2) for k in q if prev.get(k)
        }
        line += "   growth vs prev decade: " + str(ratios)
    print(line)
    prev = q
EOF
