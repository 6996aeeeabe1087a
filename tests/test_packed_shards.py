"""Packed-shard writer (llm/packing.write_packed_shards) and BPE model
persistence (llm/bpe.BPEModel)."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.packing import write_packed_shards


def test_shard_layout_order_and_pruning(spark, tmp_path):
    path = str(tmp_path / "shards")
    seqs = spark.range(0, 250).select(
        F.col("id").alias("seq_id"),
        F.concat(F.lit("seq "), F.col("id")).alias("text"),
    )
    write_packed_shards(seqs, path, seqs_per_shard=100)
    back = spark.read.parquet(path)
    assert back.count() == 250
    # shard assignment: seq_id div 100
    bad = back.where(
        F.col("shard") != (F.col("seq_id") / 100).cast("long")
    ).count()
    assert bad == 0
    # a single-shard read plans PartitionFilters pruning (the worker-
    # assignment read path): only shard=1's rows are scanned
    one = back.where("shard = 1")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "shard" in plan
    assert one.count() == 100
    with pytest.raises(ValueError, match="seqs_per_shard"):
        write_packed_shards(seqs, path, seqs_per_shard=0)


def test_bpe_model_roundtrip(spark, tmp_path):
    from sparker_spark.llm.bpe import BPE, BPEVocab, BPEModel

    docs = spark.createDataFrame(
        [(0, "low low lower newest newest")], ["doc_id", "text"]
    )
    merges = BPE.train_local(docs, 4)
    vocab = BPEVocab.build(docs, merges)
    path = str(tmp_path / "model")
    BPEModel.write(path, merges, vocab)
    m2 = BPEModel.read_merges(spark, path)
    v2 = BPEModel.read_vocab(spark, path)
    assert sorted(tuple(r) for r in merges.collect()) == sorted(
        tuple(r) for r in m2.collect()
    )
    assert sorted(tuple(r) for r in vocab.collect()) == sorted(
        tuple(r) for r in v2.collect()
    )
    # the reloaded model encodes identically
    enc1 = BPE.encode(docs, merges).collect()[0]["tokens"]
    enc2 = BPE.encode(docs, m2).collect()[0]["tokens"]
    assert list(enc1) == list(enc2)
