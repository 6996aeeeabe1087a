"""Run the distributed batched BPE trainer at a PRODUCTION merge
budget and record the batch-factor trajectory — converting
SCALING.md's 32k extrapolation into a measurement (round-10 ask #3).

Usage:
    python tools/train_bpe_32k.py [corpus_dir] [num_merges] [out_json]
    # defaults: .scale/sf1.0 (the decade corpus), 32000,
    #           /tmp/bpe32k_run.json

Durability (round 11): the observer also dumps the ACCUMULATED MERGE
TABLE to ``<out_json>.merges.json`` every 200 iterations; if that file
already exists at startup the run RESUMES from it via
``BPE.train(resume_merges=...)`` (exact replay of the training-state
evolution — see BPE._apply_ranked_passes). On completion the model
(merges + byte-level vocab) is written as parquet to
``.scale/bpe32k_model`` for the roundtrip gate.

Writes one JSON record: wall time, merges learned, iteration count,
per-phase batch factors (mean batch size over each 10% slice of the
merge budget, showing whether batches collapse as counts thin out),
and the stop reason (budget reached vs min_count floor).

Instrumentation wraps BPE._select_batch to observe batch sizes without
touching the trainer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1.0",
    )
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bpe32k_run.json"

    from sparker_spark.llm.bpe import BPE
    from sparker_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bpe_32k",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n_docs = docs.count()

    # ---- resume: pick up a previously dumped merge table, if any
    merges_path = out_path + ".merges.json"
    resume: list[tuple[int, str, str]] = []
    if os.path.exists(merges_path):
        with open(merges_path) as f:
            resume = [tuple(m) for m in json.load(f)["merges"]]
        print(
            f"# resuming from {merges_path}: {len(resume)} merges",
            file=sys.stderr,
        )

    batches: list[int] = []
    learned: list[tuple[int, str, str]] = list(resume)
    orig = BPE._select_batch  # staticmethod -> plain function via class

    t0 = time.time()

    def observing(*args, **kwargs):
        out = orig(*args, **kwargs)
        batches.append(len(out))
        for left, right, _n in out:
            learned.append((len(learned) + 1, left, right))
        if len(batches) % 200 == 0:
            done = sum(batches)
            el = time.time() - t0
            print(
                f"# iter {len(batches)}: {done}/{num_merges} merges, "
                f"mean batch {done / len(batches):.2f}, {el:.0f}s "
                f"({el / max(1, done):.3f} s/merge)",
                file=sys.stderr,
            )
            # partial record so an interrupted run still yields a
            # measured bound (incl. the batch-factor trajectory)
            step = max(1, len(batches) // 10)
            dec = [
                round(sum(batches[i:i + step]) / len(batches[i:i + step]), 2)
                for i in range(0, len(batches), step)
            ]
            with open(out_path + ".progress", "w") as f:
                json.dump(
                    {
                        "elapsed_sec": round(el, 1),
                        "resumed_at": len(resume),
                        "merges_so_far": len(resume) + done,
                        "iterations": len(batches),
                        "mean_batch_factor": round(done / len(batches), 2),
                        "sec_per_merge": round(el / max(1, done), 4),
                        "batch_factor_by_iter_decile": dec,
                    },
                    f,
                )
            # durable merge table: an interrupted run resumes from
            # here instead of restarting (atomic rename so a kill
            # mid-write can't corrupt the resume point)
            with open(merges_path + ".tmp", "w") as f:
                json.dump({"merges": learned}, f)
            os.replace(merges_path + ".tmp", merges_path)
        return out

    BPE._select_batch = staticmethod(observing)
    merges = BPE.train(
        docs,
        num_merges,
        byte_level=True,
        batch_pairs=int(os.environ.get("BPE_BATCH_PAIRS", "32")),
        resume_merges=resume or None,
    )
    n_learned = merges.count()
    wall = time.time() - t0
    BPE._select_batch = staticmethod(orig)

    # batch-factor trajectory: mean batch size per decile of ITERATIONS
    # (shows whether batches collapse as pair counts thin out at depth)
    deciles = []
    if batches:
        step = max(1, len(batches) // 10)
        for i in range(0, len(batches), step):
            chunk = batches[i:i + step]
            deciles.append(round(sum(chunk) / len(chunk), 2))
    # final durable merge table (the completed run's resume point is
    # also the artifact the roundtrip gate loads)
    with open(merges_path + ".tmp", "w") as f:
        json.dump({"merges": learned}, f)
    os.replace(merges_path + ".tmp", merges_path)

    # model write: merges + byte-level vocab as parquet
    from sparker_spark.llm.bpe import BPEModel, BPEVocab

    model_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "bpe32k_model",
    )
    vocab = BPEVocab.build(docs, merges, byte_level=True)
    BPEModel.write(model_dir, merges, vocab)

    n_new = n_learned - len(resume)
    record = {
        "metric": "bpe_train_wall_sec",
        "value": round(wall, 1),
        "unit": "sec",
        "corpus": corpus_dir,
        "n_docs": n_docs,
        "merge_budget": num_merges,
        "merges_learned": n_learned,
        "resumed_at": len(resume),
        "iterations": len(batches),
        "mean_batch_factor": round(n_new / max(1, len(batches)), 2),
        "batch_factor_by_iter_decile": deciles,
        "stopped_early": n_learned < num_merges,
        "sec_per_merge": round(wall / max(1, n_new), 4),
        "byte_level": True,
        "batch_pairs": int(os.environ.get("BPE_BATCH_PAIRS", "32")),
        "cpus": int(cpus),
        "model_dir": model_dir,
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
