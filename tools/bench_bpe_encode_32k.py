"""Encode throughput under the production 32k-merge model — the
model artifact's end-use datapoint: tokenize the full training corpus
(100k docs / 20M whitespace tokens) with BPE.encode (Arrow-batched
priority encoder, per-batch word cache, 32k-rank map shipped in the
closure) and report wall + tokens/sec.

Usage: python tools/bench_bpe_encode_32k.py [corpus_dir] [model_dir]
Writes bpe32k_encode_bench.json.
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
    model_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale", "bpe32k_model"
    )
    from pyspark.sql import functions as F

    from sparker_spark.llm.bpe import BPE, BPEModel
    from sparker_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bpe32k_encode", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    merges = BPEModel.read_merges(spark, model_dir)
    n_merges = merges.count()

    t0 = time.time()
    out = BPE.encode(docs, merges, byte_level=True).agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("bpe_tokens"),
    ).first()
    wall = time.time() - t0
    record = {
        "metric": "bpe_encode_tokens_per_sec",
        "value": round(out["bpe_tokens"] / wall),
        "unit": "tokens/sec",
        "wall_sec": round(wall, 1),
        "docs": out["docs"],
        "bpe_tokens": out["bpe_tokens"],
        "merges": n_merges,
        "cpus": int(cpus),
    }
    with open(os.path.join(REPO, "bpe32k_encode_bench.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
