"""Tests for the Structured Streaming extensions and multimodal
plumbing (memory source/sink; deterministic fake decoder)."""

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparker_spark.llm.multimodal import (
    MEDIA_META,
    DecodeRegistry,
    extract_features,
    frame_sample_plan,
)
from sparker_spark.streaming.incremental import (
    incremental_blocking_keys,
    streaming_exact_dedup,
    windowed_event_counts,
)


def _run_stream(df, query_name, timeout=60):
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def test_incremental_blocking_keys(spark, tmp_path):
    src = tmp_path / "docs"
    spark.createDataFrame(
        [(0, "Data Cleaning"), (1, "data systems")], ["doc_id", "text"]
    ).write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = incremental_blocking_keys(stream)
    _run_stream(out, "inc_keys")
    rows = {
        (r["profile_id"], r["key"])
        for r in spark.sql("SELECT * FROM inc_keys").collect()
    }
    assert rows == {(0, "data"), (0, "cleaning"), (1, "data"), (1, "systems")}


def test_streaming_exact_dedup(spark, tmp_path):
    src = tmp_path / "stream_docs"
    spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:00", "hello  world"),
            (1, "2024-01-01 00:01:00", "hello world"),  # dup after normalize
            (2, "2024-01-01 00:02:00", "different"),
        ],
        ["doc_id", "ts", "text"],
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        str(src)
    )
    out = streaming_exact_dedup(stream)
    _run_stream(out, "dedup_stream")
    kept = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    assert len(kept) == 2  # one of {0,1} plus 2
    assert 2 in kept


def test_streaming_near_dup_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static incremental near-dup must reproduce the batch
    MinHash-LSH pair set exactly (same seeds/shingles/bands/threshold),
    restricted to new-vs-corpus pairs — including the jaccard values."""
    from sparker_spark.llm.dedup import Dedup
    from sparker_spark.streaming.incremental import (
        build_near_dup_index,
        streaming_near_dup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.where("doc_id % 5 != 0").cache()
    new = docs.where("doc_id % 5 = 0")
    src = tmp_path / "new_docs"
    new.write.parquet(str(src))

    postings, detail = build_near_dup_index(corpus)
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = streaming_near_dup(stream, postings, detail)
    _run_stream(out, "near_dup_stream")
    got = {
        (r["doc_id"], r["corpus_id"], r["jaccard"])
        for r in spark.sql("SELECT * FROM near_dup_stream").collect()
    }

    batch = Dedup.minhash_lsh_pairs(docs)
    want = {
        (
            (r["p1"], r["p2"]) if r["p1"] % 5 == 0 else (r["p2"], r["p1"])
        )
        + (r["jaccard"],)
        for r in batch.collect()
        if (r["p1"] % 5 == 0) != (r["p2"] % 5 == 0)  # exactly one is new
    }
    assert got == want
    assert len(got) > 0  # fixture must actually produce near-dups


def test_windowed_event_counts(spark, tmp_path):
    src = tmp_path / "stream_events"
    spark.createDataFrame(
        [
            (0, "2024-01-01 00:10:00", "click", 1.5),
            (1, "2024-01-01 00:20:00", "click", 2.5),
            (2, "2024-01-01 01:10:00", "view", 3.0),
        ],
        ["event_id", "ts", "event_type", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(str(src))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(str(src))
    out = windowed_event_counts(stream, "1 hour", "2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_events")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_events").collect()
    }
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 4.0)
    assert rows[("2024-01-01 01:00:00", "view")] == (1, 3.0)


def test_multimodal_extract_features(spark):
    rows = [
        # image/tiff has no registered codec -> byte-histogram fallback
        # (image/png grew a REAL decoder in r5 — tests/test_png_codec.py)
        (0, bytearray(b"\x00\x10\x20\x30"), "image/tiff"),
        (1, bytearray(b"\xff" * 8), "audio/ogg"),  # no registered codec -> histogram
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[0]["n_bytes"] == 4
    # byte histogram: bytes 0x00,0x10,0x20,0x30 -> bins 0..3 each 0.25
    assert out[0]["feature"][0] == pytest.approx(0.25)
    assert out[1]["feature"][15] == pytest.approx(1.0)
    assert len(out[0]["content_hash"]) == 32


def test_ppm_decoder_end_to_end(spark):
    """A real (dependency-free) codec through the DecodeRegistry plug
    point: binary PPM rows decode via header parse + channel means,
    while other mimes keep the default histogram — mixed in ONE
    extract_features pass."""
    # 2x2 P6 image, maxval 255, comment in header: pixels
    # (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    ppm = (
        b"P6\n# test comment\n2 2\n255\n"
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    )
    rows = [
        (0, bytearray(ppm), "image/x-portable-pixmap"),
        # image/tiff has no codec -> default histogram (image/png has
        # a real decoder since r5: tests/test_png_codec.py)
        (1, bytearray(b"\x00\x10\x20\x30"), "image/tiff"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    w, h, mr, mg, mb = out[0]["feature"]
    assert (w, h) == (2.0, 2.0)
    assert mr == pytest.approx(510 / (4 * 255))
    assert mg == pytest.approx(510 / (4 * 255))
    assert mb == pytest.approx(510 / (4 * 255))
    # the tiff row still goes through the default byte histogram
    assert len(out[1]["feature"]) == 16
    assert out[1]["feature"][0] == pytest.approx(0.25)


def test_ppm_decoder_rejects_garbage():
    from sparker_spark.llm.multimodal import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")  # truncated raster


def test_decode_registry_unregistered():
    saved = dict(DecodeRegistry._decoders)
    try:
        DecodeRegistry._decoders.clear()
        with pytest.raises(NotImplementedError):
            DecodeRegistry.decode("video/mp4", b"xx")
    finally:
        DecodeRegistry._decoders.update(saved)


def test_frame_sample_plan(spark):
    rows = [
        (0, ("video/mp4", 640, 480, 3500)),
        (1, ("video/mp4", 640, 480, 500)),
    ]
    media = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("meta", MEDIA_META),
        ])
    )
    out = sorted(
        (r["media_id"], r["frame_ts_ms"])
        for r in frame_sample_plan(media, every_ms=1000).collect()
    )
    assert out == [(0, 0), (0, 1000), (0, 2000), (0, 3000), (1, 0)]


def test_streaming_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: in-batch gap closes a
    session; the open tail session stays in state (append mode)."""
    import datetime as dt

    from sparker_spark.streaming.incremental import streaming_sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    src = tmp_path / "events"
    rows = [
        # user 1: two events 5 min apart, then a 90-min gap -> session
        # closes, new session opens (stays open in state)
        (1, ts(0), 10.0),
        (1, ts(5), 2.5),
        (1, ts(95), 1.0),
        # user 2: single event -> open session only, nothing emitted
        (2, ts(0), 7.0),
    ]
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.parquet(str(src))
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(str(src))

    out = streaming_sessionize(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # user 1's first session closes on the in-batch gap; user 2's
    # single-event session closes via the EVENT-TIME TIMEOUT: the
    # final watermark (max ts − 10 min = 13:25) passed its
    # last+gap (12:30). User 1's tail session (start 13:35) is still
    # open — its timeout (14:05) is beyond the watermark — so it is
    # correctly NOT emitted in append mode.
    assert got == {
        (1, ts(0), ts(5), 2, 12.5),
        (2, ts(0), ts(0), 1, 7.0),
    }


def test_arrow_batch_rows_restores_conf(spark):
    from sparker_spark.llm.multimodal import _ARROW_BATCH_CONF, arrow_batch_rows

    prev = spark.conf.get(_ARROW_BATCH_CONF, None)
    rows = [(i, bytearray(bytes([i % 256]) * (i + 1)), "image/tiff") for i in range(10)]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    feats = extract_features(media, batch_rows=3)  # forces chunked batches
    with arrow_batch_rows(spark, 4):
        assert spark.conf.get(_ARROW_BATCH_CONF) == "4"
        out = {r["media_id"]: r["n_bytes"] for r in feats.collect()}
    assert out == {i: i + 1 for i in range(10)}
    assert spark.conf.get(_ARROW_BATCH_CONF, None) == prev


def test_streaming_countmin_equals_batch_sketch(spark, tmp_path):
    """Complete-mode streaming sketch over two files == the batch
    sketch over their union: the cell-wise-sum merge is what the
    streaming count aggregation computes incrementally."""
    from sparker_spark.sketches import CountMinSketch
    from sparker_spark.streaming.incremental import streaming_countmin

    src = tmp_path / "cm_stream"
    src.mkdir()
    rows1 = [(f"k{i % 7}",) for i in range(100)]
    rows2 = [(f"k{i % 11}",) for i in range(80)]
    spark.createDataFrame(rows1, "v string").write.parquet(str(src / "a.parquet"))
    spark.createDataFrame(rows2, "v string").write.parquet(str(src / "b.parquet"))

    stream = spark.readStream.schema("v string").parquet(str(src / "*"))
    out = streaming_countmin(stream, "v", width=32, depth=3, seed=9)
    q = (
        out.writeStream.format("memory")
        .queryName("cm_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = sorted(
        (r["j"], r["bucket"], r["n"])
        for r in spark.sql("SELECT * FROM cm_cells").collect()
    )
    batch_df = spark.createDataFrame(rows1 + rows2, "v string")
    batch = sorted(
        (r["j"], r["bucket"], r["n"])
        for r in CountMinSketch.build(batch_df, "v", width=32, depth=3, seed=9).collect()
    )
    assert streamed == batch


def test_streaming_decontaminate_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static decontamination must reproduce the batch
    Decontamination.overlap_ngrams output value-for-value on the same
    train/eval split (same n, shingles, hashes)."""
    from sparker_spark.llm.curation import Decontamination
    from sparker_spark.streaming.incremental import streaming_decontaminate

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .cache()
    )
    ev = docs.where("doc_id % 5 = 0")
    train = docs.where("doc_id % 5 != 0")
    src = tmp_path / "train_docs"
    train.write.parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = streaming_decontaminate(stream, ev, n=3)
    _run_stream(out, "decon_stream")
    got = {
        (r["doc_id"], r["n_ngrams"], r["n_overlap_ngrams"], r["contaminated"])
        for r in spark.sql("SELECT * FROM decon_stream").collect()
    }
    expected = {
        (r["doc_id"], r["n_ngrams"], r["n_overlap_ngrams"], r["contaminated"])
        for r in Decontamination.overlap_ngrams(train, ev, 3).collect()
    }
    assert got == expected
    assert any(c for (_, _, _, c) in got)  # split contains real overlaps


def test_wav_decoder_end_to_end(spark):
    """A real dependency-free audio codec through DecodeRegistry:
    PCM WAV rows decode via RIFF chunk parse while other mimes keep
    their registered behavior — mixed in one extract_features pass."""
    import struct

    # 16-bit mono 8000 Hz, 4 frames: 0, +16384, -16384, +32767
    samples = [0, 16384, -16384, 32767]
    data = b"".join(struct.pack("<h", v) for v in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rows = [
        (0, bytearray(wav), "audio/wav"),
        (1, bytearray(b"\x00\x10"), "application/octet-stream"),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    ch, sr, dur, amp = out[0]["feature"]
    assert (ch, sr) == (1.0, 8000.0)
    assert dur == pytest.approx(4 / 8000.0)
    want = (0 + 16384 / 32768 + 16384 / 32768 + 32767 / 32768) / 4
    assert amp == pytest.approx(want)
    assert len(out[1]["feature"]) == 16  # histogram fallback


def test_wav_decoder_rejects_garbage():
    from sparker_spark.llm.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"OggS....")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no chunks


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the batch join with the same
    range condition over the same rows."""
    import datetime as dt

    from sparker_spark.streaming.incremental import streaming_interval_join

    t0 = dt.datetime(2026, 2, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    clicks = [(1, ts(60), "c1"), (1, ts(200), "c2"), (2, ts(30), "c3")]
    views = [
        (1, ts(10), "v1"),   # 50 min before c1 -> joins c1
        (1, ts(59), "v2"),   # joins c1
        (1, ts(130), "v3"),  # 70 min before c2 -> outside 1h window
        (1, ts(200), "v4"),  # same instant -> joins c2
        (2, ts(100), "v5"),  # after c3 -> never
    ]
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(clicks, "user_id long, ts timestamp, cid string").write.parquet(lp)
    spark.createDataFrame(views, "user_id long, ts timestamp, vid string").write.parquet(rp)
    ls = spark.readStream.schema("user_id long, ts timestamp, cid string").parquet(lp)
    rs = spark.readStream.schema("user_id long, ts timestamp, vid string").parquet(rp)
    out = streaming_interval_join(ls, rs, "user_id", "1 hour", "10 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["cid"], r["vid"]) for r in spark.sql("SELECT * FROM ivj").collect()
    }
    assert got == {("c1", "v1"), ("c1", "v2"), ("c2", "v4")}


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    """Watermark semantics: rows older than the watermark at their
    arrival batch are dropped from windowed aggregation."""
    import datetime as dt

    from sparker_spark.streaming.incremental import windowed_event_counts

    t0 = dt.datetime(2026, 4, 1)
    early = [(1, t0 + dt.timedelta(hours=h), "click", 1.0) for h in range(5)]
    # the watermark computed from a batch takes effect one batch
    # LATER, so an on-time middle batch locks it in before the late
    # row (6 h before t0) arrives in the third batch
    middle = [(2, t0 + dt.timedelta(hours=5), "click", 1.0)]
    late = [(9, t0 - dt.timedelta(hours=6), "click", 1.0)]
    p = str(tmp_path / "ev")
    schema = "user_id long, ts timestamp, event_type string, value double"
    import glob
    import os
    import time

    now = time.time()
    for i, rows in enumerate([early, middle, late]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(p)
        newest = max(glob.glob(p + "/part-*"), key=os.path.getmtime)
        os.utime(newest, (now - 60 + 10 * i, now - 60 + 10 * i))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(p)
    out = windowed_event_counts(stream, window="1 hour", watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    starts = {
        str(r["window_start"]) for r in spark.sql("SELECT * FROM late_drop").collect()
    }
    # the late row's window never appears; closed early windows do
    assert "2026-03-31 18:00:00" not in starts
    assert "2026-04-01 00:00:00" in starts


def test_resize_images_ppm(spark):
    """Real media transform through mapInPandas: nearest-neighbor PPM
    resize — downscale picks exact source pixels, upscale replicates
    them, and the output payload is itself a valid P6 that round-trips
    through the decoder."""
    from sparker_spark.llm.multimodal import decode_ppm, resize_images

    # 2x2: (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    ppm = (
        b"P6\n2 2\n255\n"
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    )
    media = spark.createDataFrame(
        [(7, bytearray(ppm))], "media_id long, payload binary"
    )

    # 1x1: nearest-neighbor picks the top-left pixel
    one = resize_images(media, 1, 1).collect()[0]
    assert (one["width"], one["height"]) == (1, 1)
    assert bytes(one["payload"]) == b"P6\n1 1\n255\n" + bytes([255, 0, 0])

    # 4x4 upscale: each source pixel becomes a 2x2 block; the resized
    # payload is valid PPM (decoder round-trip) with unchanged means
    up = resize_images(media, 4, 4).collect()[0]
    w, h, mr, mg, mb = decode_ppm(bytes(up["payload"]))
    assert (w, h) == (4.0, 4.0)
    assert mr == pytest.approx(510 / (4 * 255))
    assert mg == pytest.approx(510 / (4 * 255))
    assert mb == pytest.approx(510 / (4 * 255))


def test_resize_images_rejects_bad_target(spark):
    from sparker_spark.llm.multimodal import resize_images

    media = spark.createDataFrame([], "media_id long, payload binary")
    with pytest.raises(ValueError):
        resize_images(media, 0, 4)
