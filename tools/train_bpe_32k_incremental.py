"""Run the FULL 32k merge budget with BPE.train_incremental — the
production trainer architecture (one distributed corpus pass, then an
in-memory merge loop with incremental pair-count maintenance) — and
cross-check its merge table against the distributed run's durable
dump as a prefix-equality witness at production scale.

Why this exists (round 11): the distributed trainer's measured cost
at depth is ~2 Spark scheduler round-trips per ~1.35 merges
(tools/train_bpe_32k.py, bpe32k_run_r11.json.progress) — the merge
LOOP is not a distributed problem once the Heaps-law word-count
relation fits the driver (199,758 words here; Heaps keeps it
driver-sized even at 100 TB of corpus). train_incremental is
property-tested identical to train/train_local (tests/test_bpe.py),
and this runner verifies identity AGAIN on the real corpus: the
incremental table's first k merges must equal the distributed run's
k-merge dump byte-for-byte.

Usage:
    python tools/train_bpe_32k_incremental.py [corpus_dir] [budget]
        [out_json] [dist_dump]
    # defaults: .scale/bpe_corpus, 32000, bpe32k_incremental_run.json,
    #           bpe32k_run_r11.json.merges.json

Writes <out_json> (wall, merges, trajectory deciles of per-merge
count levels, prefix-equality result) and the model artifact to
.scale/bpe32k_model (merges + byte-level vocab parquet) for the
roundtrip gate (tests/test_bpe32k_model.py). Also dumps the full
merge table to <out_json>.merges.json in the trainer-dump format.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "bpe_corpus"
    )
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "bpe32k_incremental_run.json"
    )
    dist_dump = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        REPO, "bpe32k_run_r11.json.merges.json"
    )

    from sparker_spark.llm.bpe import BPE, BPEModel, BPEVocab
    from sparker_spark.session import get_spark

    spark = get_spark(
        app_name="bpe_32k_incremental", master="local[8]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n_docs = docs.count()

    t0 = time.time()
    marks: list[tuple[int, float, int]] = []  # (rank, wall, count)
    learned: list[tuple[int, str, str]] = []

    def observe(rank: int, left: str, right: str, count: int) -> None:
        learned.append((rank, left, right))
        if rank % 1000 == 0 or rank == budget:
            el = time.time() - t0
            marks.append((rank, round(el, 1), int(count)))
            print(
                f"# merge {rank}/{budget}: count={count}, {el:.0f}s "
                f"({el / rank:.4f} s/merge)",
                file=sys.stderr,
            )

    merges = BPE.train_incremental(
        docs, budget, byte_level=True, observer=observe
    )
    n_learned = merges.count()
    wall = time.time() - t0

    # --- prefix-equality witness vs the distributed run's dump
    prefix = {"dist_dump": dist_dump, "checked": 0, "equal": None}
    if os.path.exists(dist_dump):
        dist = [
            (int(k), str(l), str(r))
            for k, l, r in json.load(open(dist_dump))["merges"]
        ]
        k = min(len(dist), len(learned))
        prefix["checked"] = k
        prefix["equal"] = learned[:k] == dist[:k]
        if not prefix["equal"]:
            first_bad = next(
                i for i in range(k) if learned[i] != dist[i]
            )
            prefix["first_mismatch"] = {
                "rank": first_bad + 1,
                "incremental": learned[first_bad],
                "distributed": dist[first_bad],
            }

    # --- durable dump (trainer-dump format) + model artifact
    with open(out_path + ".merges.json.tmp", "w") as f:
        json.dump({"merges": learned}, f)
    os.replace(out_path + ".merges.json.tmp", out_path + ".merges.json")
    model_dir = os.path.join(REPO, ".scale", "bpe32k_model")
    vocab = BPEVocab.build(docs, merges, byte_level=True)
    BPEModel.write(model_dir, merges, vocab)

    # trajectory: top-pair count level per 10% of the budget — the
    # incremental analogue of the batch-factor deciles (shows how the
    # frequency mass thins as the budget deepens)
    step = max(1, len(marks) // 10)
    record = {
        "metric": "bpe_train_wall_sec",
        "value": round(wall, 1),
        "unit": "sec",
        "trainer": "train_incremental",
        "corpus": corpus_dir,
        "n_docs": n_docs,
        "merge_budget": budget,
        "merges_learned": int(n_learned),
        "sec_per_merge": round(wall / max(1, n_learned), 4),
        "count_level_by_1k": [
            {"rank": r, "wall_sec": w, "top_count": c}
            for r, w, c in marks[::step] + marks[-1:]
        ],
        "stopped_early": int(n_learned) < budget,
        "byte_level": True,
        "prefix_vs_distributed": prefix,
        "model_dir": model_dir,
        "vocab_rows": vocab.count(),
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
