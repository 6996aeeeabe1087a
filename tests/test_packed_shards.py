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


def test_shard_manifest(spark, tmp_path):
    """The manifest (epoch, shard, path, n_seqs, token_count, min/max
    order) is written to path/_manifest, read back, matches the data,
    and stays INVISIBLE to the partitioned data read."""
    path = str(tmp_path / "shards_m")
    seqs = spark.range(0, 37).select(
        F.col("id").alias("seq_id"),
        F.lit(5).cast("long").alias("n_tokens"),
        F.concat(F.lit("seq "), F.col("id")).alias("text"),
    )
    man = write_packed_shards(seqs, path, seqs_per_shard=10, epoch=2)
    rows = {r["shard"]: r for r in man.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(r["epoch"] == 2 for r in rows.values())
    assert rows[0]["n_seqs"] == 10 and rows[3]["n_seqs"] == 7
    assert rows[1]["token_count"] == 50 and rows[3]["token_count"] == 35
    assert rows[2]["min_order"] == 20 and rows[2]["max_order"] == 29
    assert rows[1]["path"] == "shard=1"
    # the data read does NOT see the manifest rows
    back = spark.read.parquet(path)
    assert back.count() == 37 and "epoch" not in back.columns
    # manifest=False writes no manifest and returns None
    path2 = str(tmp_path / "shards_nm")
    assert write_packed_shards(seqs, path2, 10, manifest=False) is None
    import os

    assert not os.path.exists(os.path.join(path2, "_manifest"))
    # no n_tokens column -> null token_count
    seqs2 = seqs.drop("n_tokens")
    man2 = write_packed_shards(seqs2, path2, 10)
    assert all(r["token_count"] is None for r in man2.collect())
