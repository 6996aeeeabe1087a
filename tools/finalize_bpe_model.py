"""Materialize the BPE model artifact from the trainer's durable
merge dump — the contingency path when tools/train_bpe_32k.py is
stopped before completion (its dump is the exact resume point, so the
model it implies is identical to what the completed run would write
for the learned prefix).

Usage: python tools/finalize_bpe_model.py [merges_json] [model_dir]
  defaults: bpe32k_run_r11.json.merges.json -> .scale/bpe32k_model
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    merges_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "bpe32k_run_r11.json.merges.json"
    )
    model_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale", "bpe32k_model"
    )
    from sparker_spark.llm.bpe import BPEModel, BPEVocab
    from sparker_spark.session import get_spark

    learned = json.load(open(merges_path))["merges"]
    spark = get_spark(app_name="bpe_finalize", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    merges = spark.createDataFrame(
        [(k, l, r, l + r) for k, l, r in learned],
        "rank int, left string, right string, merged string",
    )
    # byte-level vocab needs NO corpus pass (fixed 256-symbol base)
    vocab = BPEVocab.build(
        spark.createDataFrame([(0, "")], ["doc_id", "text"]),
        merges,
        byte_level=True,
    )
    BPEModel.write(model_dir, merges, vocab)
    print(
        json.dumps(
            {
                "model_dir": model_dir,
                "merges": len(learned),
                "vocab_rows": vocab.count(),
            }
        )
    )


if __name__ == "__main__":
    main()
