#!/bin/bash
# Order-5 LM wall decade: text_lm5_logprob + text_lm5_pruned_logprob
# (+ ppl_partition, now order-aware) at sf0.1 / sf0.5 / sf1.0.
# Prereq: tools/gen_scale.py has materialized .scale/sf{0.5,1.0}.
# Copies each subset record to bench_lm5_decade_<sf>.json.
set -e
cd "$(dirname "$0")/.."
Q=text_lm5_logprob,text_lm5_pruned_logprob,ppl_partition
for sf in sf01:/root/testdata/sf0.1 sf05:.scale/sf0.5 sf10:.scale/sf1.0; do
  tag="${sf%%:*}"; dir="${sf#*:}"
  echo "== $tag ($dir)" >&2
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_REPS=2 \
    SPARK_GRAFT_ONLY="$Q" python bench.py 2> "/tmp/lm5_$tag.err"
  cp BENCH_SUBSET_LOCAL.json "bench_lm5_decade_$tag.json"
done
python - <<'EOF'
import json
for tag in ("sf01", "sf05", "sf10"):
    d = json.load(open(f"bench_lm5_decade_{tag}.json"))
    print(tag, d["queries"], "cold:", d.get("cold"))
EOF
