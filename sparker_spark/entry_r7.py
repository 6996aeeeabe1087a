"""Round-7 gated queries.

1. ``video_frame_features`` — real video frame DECODE under the
   value-hash gate: MJPEG-in-AVI payloads (llm/avi.py RIFF container +
   the builtin T.81 baseline JPEG codec per frame), consuming the same
   (media_id, frame_ts_ms) work units ``frame_sample_plan`` emits.
   Fixture + oracle follow the r6 JPEG gate's closed-form YCbCr
   round-trip argument (entry_r6.py).
2. ``knn_label_vote_ivf`` — the kNN label vote routed through
   ``IVFIndex.search`` (cell sketch, Hamming probe map, cell join)
   instead of the exact-anchor crossJoin. Probing ALL cells makes IVF
   recall provably 100 % for ANY input — the candidate set is the full
   relation — so the exact-kNN SQL oracle states the result while the
   Spark plan exercises the scale path's machinery end-to-end.
   (Partial-probe recall is covered by tests/test_similarity.py.)
3. ``jaccard_prefix_join_skew`` — the PPJoin mechanism on a
   deterministically length-skewed corpus where the prefix + length
   filters do real pruning work. The original ``jaccard_prefix_join``
   fixture intentionally defeats pruning (near-all-pairs candidates;
   setjoin.py) and stays registered as the adversarial correctness
   anchor, but is EXCLUDED from the bench — this query is the benched
   sibling that measures the operator, not the fixture's output size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# video fixture: 8x6 frames, 2 fps (500 ms per frame), 2..4 frames per
# document, sampled every 500 ms — every frame lands on exactly one
# sampled timestamp (ts = 500·i, frame_index_at(500·i) = i)
VIDEO_W, VIDEO_H = 8, 6
VIDEO_FPS = 2
VIDEO_FRAME_MS = 1000 // VIDEO_FPS


def _avi_fixture_media(spark, sf_dir):
    """One AVI per document: 2 + doc_id % 3 solid-color quality-100
    JPEG frames whose channels are arithmetic in (doc_id,
    frame_index), built worker-side by the repo's own encoders."""
    from sparker_spark.entry import _parallelize_scan, load

    docs = _parallelize_scan(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id")
    )

    def make_avi(batches):
        import numpy as np
        import pandas as pd

        from sparker_spark.llm import avi, jpeg

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                # oracle replays the modulo family with DuckDB's
                # sign-preserving %; same non-negative contract as the
                # r6 JPEG/WAV gates. The encoder-side YCbCr clamp
                # corner needs an exact (255,0,0)/(0,0,255)/(255,255,
                # 255) channel triple, and the coupled residues below
                # admit none for i in 0..3 (the 90i ≡ c (mod 256)
                # systems are unsolvable) — see entry_r6's note.
                assert mid >= 0, "AVI gate fixture requires doc_id >= 0"
                frames = []
                for i in range(2 + mid % 3):
                    img = np.zeros((VIDEO_H, VIDEO_W, 3), dtype=np.uint8)
                    img[:, :, 0] = (mid + 17 * i) % 256
                    img[:, :, 1] = (mid * 7 + 29 * i) % 256
                    img[:, :, 2] = (mid * 13 + 31 * i) % 256
                    frames.append(jpeg.encode(img, quality=100))
                payloads.append(
                    avi.encode_avi_mjpeg(
                        frames, VIDEO_W, VIDEO_H, fps_num=VIDEO_FPS
                    )
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    return docs.mapInPandas(
        make_avi, schema="media_id long, payload binary"
    )


def q_video_frame_features(spark, sf_dir):
    """MJPEG-in-AVI frame decode under the VALUE-HASH gate: each
    document becomes a real AVI (llm/avi.encode_avi_mjpeg) of
    2 + doc_id % 3 solid-color quality-100 JPEG frames whose channels
    are arithmetic in (doc_id, frame_index), decoded back through
    multimodal.video_frame_features (RIFF parse -> per-frame T.81
    entropy decode -> IDCT -> color convert -> channel means). The
    oracle replays the integer YCbCr round trip per frame in closed
    form — the entire container+codec chain is value-checked."""
    from sparker_spark.llm.multimodal import video_frame_features

    media = _avi_fixture_media(spark, sf_dir)
    feats = video_frame_features(media, every_ms=VIDEO_FRAME_MS)
    byte = lambda c: F.round(F.col(c) * 255.0).cast("int")  # noqa: E731
    return feats.select(
        "media_id",
        "frame_ts_ms",
        "frame_index",
        "width",
        "height",
        byte("mean_r").alias("r_byte"),
        byte("mean_g").alias("g_byte"),
        byte("mean_b").alias("b_byte"),
    )


O_VIDEO_FRAME_FEATURES = f"""
WITH v AS (
  SELECT doc_id AS media_id, 2 + doc_id % 3 AS n_frames FROM documents),
fr AS (
  SELECT media_id, unnest(generate_series(0, n_frames - 1)) AS i FROM v),
rgb AS (
  SELECT media_id, i,
         CAST((media_id + 17 * i) % 256 AS DOUBLE) AS r,
         CAST((media_id * 7 + 29 * i) % 256 AS DOUBLE) AS g,
         CAST((media_id * 13 + 31 * i) % 256 AS DOUBLE) AS b
  FROM fr),
ycc AS (
  SELECT media_id, i,
         floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5) AS y,
         floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5) AS cb,
         floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5) AS cr
  FROM rgb)
SELECT media_id,
       CAST(i * {VIDEO_FRAME_MS} AS BIGINT) AS frame_ts_ms,
       CAST(i AS INTEGER) AS frame_index,
       CAST({VIDEO_W} AS INTEGER) AS width,
       CAST({VIDEO_H} AS INTEGER) AS height,
       CAST(least(greatest(floor(y + 1.402 * (cr - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS r_byte,
       CAST(least(greatest(floor(y - 0.344136 * (cb - 128.0)
                                   - 0.714136 * (cr - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS g_byte,
       CAST(least(greatest(floor(y + 1.772 * (cb - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS b_byte
FROM ycc"""


def q_knn_label_vote_ivf(spark, sf_dir):
    """kNN label vote with neighbors from ``IVFIndex.search`` — the
    corpus-scale path (cell-sketch assignment, broadcast Hamming probe
    map, per-cell candidate join) under the VALUE-HASH gate. Probing
    all IVF_CELLS cells makes the candidate set the full relation, so
    recall is provably 100 % and the exact-kNN oracle states the
    output bit-for-bit while the plan is the IVF plan. The graded
    allow-listed exact anchor is ``knn_label_vote`` (entry_r6); this
    row grades the scale path itself."""
    from sparker_spark.entry import ANN_K, ANN_QUERY_MOD, load
    from sparker_spark.entry_ext import IVF_CELLS, IVF_SEED
    from sparker_spark.llm.similarity import IVFIndex, LabelKNN

    emb = load(spark, sf_dir, "embeddings")
    index = IVFIndex.build(emb, num_cells=IVF_CELLS, seed=IVF_SEED)
    neighbors = index.search(
        k=ANN_K,
        n_probe=IVF_CELLS,  # full probe: provably exhaustive candidates
        query_filter=f"vec_id % {ANN_QUERY_MOD} = 0",
    )
    return LabelKNN.predict(emb, k=ANN_K, neighbors=neighbors)


# ------------------------------ benched prefix-join sibling (skewed)
# offset + length both vary per document: a plain first-k truncation
# of this corpus still yields millions of true near-dup pairs (the
# generated documents share openings), which would make the benched
# query output-bound all over again — measured 3.67M pairs at sf0.1 vs
# 2.7k for the offset-slice fixture at t=0.8
SETJOIN_SKEW_T = 0.8
SETJOIN_SKEW_LEN_MOD = 45  # slice lengths 5..49 tokens
SETJOIN_SKEW_OFF_MOD = 7  # slice offsets 0, 9, ..., 54 tokens


def q_jaccard_prefix_join_skew(spark, sf_dir):
    """PPJoin prefix-filtered exact Jaccard on a length-skewed corpus:
    each document reduced to a slice of 5 + doc_id % 45 whitespace
    tokens starting at offset 9·(doc_id % 7), so set sizes spread
    5..49 across staggered content windows and the lossless length
    filter (min/max >= t) plus the short t=0.8 prefixes prune hard —
    the regime the operator is FOR. Same operator as the adversarial
    anchor ``jaccard_prefix_join``."""
    from sparker_spark.entry import load
    from sparker_spark.llm.setjoin import SetSimilarityJoin

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            f"array_join(slice(split(text, '[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+'), "
            f"CAST(1 + (doc_id % {SETJOIN_SKEW_OFF_MOD}) * 9 AS INT), "
            f"CAST(5 + doc_id % {SETJOIN_SKEW_LEN_MOD} AS INT)), ' ')"
        ).alias("text"),
    )
    return SetSimilarityJoin.jaccard_prefix_join(docs, SETJOIN_SKEW_T)


O_JACCARD_PREFIX_SKEW = f"""
WITH corpus AS (
  SELECT doc_id,
         array_to_string(
           list_slice(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                      CAST(1 + (doc_id % {SETJOIN_SKEW_OFF_MOD}) * 9
                           AS INTEGER),
                      CAST((doc_id % {SETJOIN_SKEW_OFF_MOD}) * 9
                           + 5 + doc_id % {SETJOIN_SKEW_LEN_MOD}
                           AS INTEGER)),
           ' ') AS text
  FROM documents),
toks AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\r\\n\\f\\x0B]+'),
                                  x -> len(x) > 0)) AS tok
        FROM corpus)),
sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS p1, b.doc_id AS p2, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT p1, p2, CAST(inter AS BIGINT) AS inter,
       CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
       round(inter / (s1.n + s2.n - inter), 6) AS jaccard
FROM inter
JOIN sizes s1 ON p1 = s1.doc_id
JOIN sizes s2 ON p2 = s2.doc_id
WHERE inter / (s1.n + s2.n - inter) >= {SETJOIN_SKEW_T}"""


THUMB_W, THUMB_H = 4, 3


def q_video_thumbnails(spark, sf_dir):
    """The full video decode→resize→re-encode→decode chain under the
    VALUE-HASH gate: the same AVI fixture as video_frame_features is
    pushed through multimodal.video_thumbnails (frame sample →
    nearest-neighbor resize to 4x3 → JPEG quality-100 re-encode), and
    the query then DECODES each thumbnail payload back through the
    registry's extract_features — so the gate value-checks two
    complete encode/decode round trips. Solid frames make both trips
    closed-form: the oracle applies the integer YCbCr round trip
    TWICE, modeling the encoder-side clamp explicitly at every stage
    (the stage-2 inputs are arbitrary [0,255] triples, so the r6
    unreachability argument does not apply — the clamp is simply
    stated in SQL instead)."""
    from sparker_spark.llm.multimodal import (
        extract_features,
        video_thumbnails,
    )

    media = _avi_fixture_media(spark, sf_dir)
    thumbs = video_thumbnails(
        media, THUMB_W, THUMB_H, every_ms=VIDEO_FRAME_MS, quality=100
    )
    # frame_index < 8 always (≤4 frames per fixture video), so the
    # packed id is collision-free and invertible
    packed = thumbs.select(
        (F.col("media_id") * 8 + F.col("frame_index")).alias("media_id"),
        "payload",
        F.lit("image/jpeg").alias("mime"),
    )
    feats = extract_features(packed)
    byte = lambda i: F.round(  # noqa: E731
        F.element_at("feature", i) * 255.0
    ).cast("int")
    return feats.select(
        # integer `div`, not float division: exact at any id magnitude
        F.expr("media_id div 8").alias("media_id"),
        (F.col("media_id") % 8).cast("int").alias("frame_index"),
        F.element_at("feature", 1).cast("int").alias("width"),
        F.element_at("feature", 2).cast("int").alias("height"),
        byte(3).alias("r_byte"),
        byte(4).alias("g_byte"),
        byte(5).alias("b_byte"),
    )


def _clamped_roundtrip_sql(r, g, b, out_prefix):
    """SQL fragment: one encode(clamped forward YCbCr)+decode(clamped
    inverse) round trip of a solid color — the exact arithmetic of
    jpeg.encode/decode at quality 100 on DC-only content, term order
    matching the numpy expressions."""
    clamp = "least(greatest({x}, 0), 255)"
    y = clamp.format(x=f"floor(0.299 * {r} + 0.587 * {g} + 0.114 * {b} + 0.5)")
    cb = clamp.format(
        x=f"floor(-0.168736 * {r} - 0.331264 * {g} + 0.5 * {b} + 128.0 + 0.5)"
    )
    cr = clamp.format(
        x=f"floor(0.5 * {r} - 0.418688 * {g} - 0.081312 * {b} + 128.0 + 0.5)"
    )
    return (
        f"{y} AS {out_prefix}y, {cb} AS {out_prefix}cb, {cr} AS {out_prefix}cr"
    )


O_VIDEO_THUMBNAILS = f"""
WITH v AS (
  SELECT doc_id AS media_id, 2 + doc_id % 3 AS n_frames FROM documents),
fr AS (
  SELECT media_id, unnest(generate_series(0, n_frames - 1)) AS i FROM v),
rgb0 AS (
  SELECT media_id, i,
         CAST((media_id + 17 * i) % 256 AS DOUBLE) AS r,
         CAST((media_id * 7 + 29 * i) % 256 AS DOUBLE) AS g,
         CAST((media_id * 13 + 31 * i) % 256 AS DOUBLE) AS b
  FROM fr),
ycc1 AS (SELECT media_id, i, {_clamped_roundtrip_sql("r", "g", "b", "")}
         FROM rgb0),
rgb1 AS (
  SELECT media_id, i,
         least(greatest(floor(y + 1.402 * (cr - 128.0) + 0.5), 0), 255) AS r,
         least(greatest(floor(y - 0.344136 * (cb - 128.0)
                                - 0.714136 * (cr - 128.0) + 0.5), 0), 255) AS g,
         least(greatest(floor(y + 1.772 * (cb - 128.0) + 0.5), 0), 255) AS b
  FROM ycc1),
ycc2 AS (SELECT media_id, i, {_clamped_roundtrip_sql("r", "g", "b", "")}
         FROM rgb1)
SELECT media_id,
       CAST(i AS INTEGER) AS frame_index,
       CAST({THUMB_W} AS INTEGER) AS width,
       CAST({THUMB_H} AS INTEGER) AS height,
       CAST(least(greatest(floor(y + 1.402 * (cr - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS r_byte,
       CAST(least(greatest(floor(y - 0.344136 * (cb - 128.0)
                                   - 0.714136 * (cr - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS g_byte,
       CAST(least(greatest(floor(y + 1.772 * (cb - 128.0) + 0.5),
                           0), 255) AS INTEGER) AS b_byte
FROM ycc2"""


def q_audio_flac_features(spark, sf_dir):
    """The FLAC codec under the VALUE-HASH gate: the same square-wave
    construction as the r6 WAV gate (entry_r6.q_audio_wav_features),
    but the payload is a real FLAC stream built worker-side by
    llm/flac.encode (fixed/constant subframes, rice residuals, CRCs)
    and decoded back through the audio_samples dispatcher's FLAC
    branch. FLAC is LOSSLESS, so the closed-form time-domain oracle
    (RMS == amplitude, peak == amplitude, 2m−1 zero crossings) carries
    over from the WAV gate with no new rounding argument — the gate
    value-checks the entire entropy-decode + predictor-reconstruction
    chain. Distinct arithmetic constants keep this row independent of
    the WAV row."""
    from sparker_spark.entry import _parallelize_scan, load
    from sparker_spark.llm.audio import audio_features
    from sparker_spark.rounding import rnd

    docs = _parallelize_scan(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id")
    )

    def make_flac(batches):
        import numpy as np
        import pandas as pd

        from sparker_spark.llm import flac

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                # same modulo-sign contract as the r6 gate fixtures
                assert mid >= 0, "FLAC gate fixture requires doc_id >= 0"
                half = 2 + mid % 11
                period = 2 * half
                m = 8 + mid % 5
                amp = 700 + (mid * 17) % 27000
                t = np.arange(m * period)
                samples = np.where(t % period < half, amp, -amp)
                payloads.append(flac.encode(samples, sample_rate=8000))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(
        make_flac, schema="media_id long, payload binary"
    )
    feats = audio_features(media)
    return feats.select(
        "media_id",
        F.col("n_channels").cast("int").alias("n_channels"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        rnd("duration_s", 6).alias("duration_s"),
        rnd("rms", 6).alias("rms"),
        F.col("peak").cast("int").alias("peak"),
        F.col("zero_crossings").cast("bigint").alias("zero_crossings"),
    )


O_AUDIO_FLAC = """
WITH p AS (
  SELECT doc_id AS media_id,
         2 * (2 + doc_id % 11) AS period,
         8 + doc_id % 5 AS m,
         700 + (doc_id * 17) % 27000 AS amp
  FROM documents)
SELECT media_id,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(m * period AS BIGINT) AS n_frames,
       round(CAST(m * period AS DOUBLE) / 8000.0, 6) AS duration_s,
       round(CAST(amp AS DOUBLE), 6) AS rms,
       CAST(amp AS INTEGER) AS peak,
       CAST(2 * m - 1 AS BIGINT) AS zero_crossings
FROM p"""


def q_multimodal_gif_features(spark, sf_dir):
    """The GIF codec under the VALUE-HASH gate: each document becomes
    a real multi-frame GIF (llm/gif.encode_gif — LZW, global color
    table, animation blocks) of 1 + doc_id % 3 solid frames whose
    first-frame palette color is arithmetic in doc_id, decoded back
    through DecodeRegistry -> gif.decode (LZW decode + palette lookup
    + compositing). GIF is LOSSLESS, so the oracle is the direct
    modulo arithmetic — no color-space round trip to model."""
    from sparker_spark.entry import _parallelize_scan, load
    from sparker_spark.llm.multimodal import extract_features

    docs = _parallelize_scan(load(spark, sf_dir, "documents")).select(
        F.col("doc_id").alias("media_id")
    )

    def make_gif(batches):
        import numpy as np
        import pandas as pd

        from sparker_spark.llm import gif

        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                # same modulo-sign contract as the other media gates
                assert mid >= 0, "GIF gate fixture requires doc_id >= 0"
                palette = [
                    (
                        (mid + 31 * i) % 256,
                        (mid * 5 + 37 * i) % 256,
                        (mid * 11 + 41 * i) % 256,
                    )
                    for i in range(4)
                ]
                n_frames = 1 + mid % 3
                frames = [
                    np.full((5, 7), i % 4, dtype=np.uint8)
                    for i in range(n_frames)
                ]
                payloads.append(gif.encode_gif(frames, palette))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads,
                 "mime": "image/gif"}
            )

    media = docs.mapInPandas(
        make_gif, schema="media_id long, payload binary, mime string"
    )
    feats = extract_features(media)
    byte = lambda i: F.round(  # noqa: E731
        F.element_at("feature", i) * 255.0
    ).cast("int")
    return feats.select(
        "media_id",
        F.element_at("feature", 1).cast("int").alias("width"),
        F.element_at("feature", 2).cast("int").alias("height"),
        F.element_at("feature", 3).cast("int").alias("n_frames"),
        byte(4).alias("r_byte"),
        byte(5).alias("g_byte"),
        byte(6).alias("b_byte"),
    )


O_MULTIMODAL_GIF = """
SELECT doc_id AS media_id,
       CAST(7 AS INTEGER) AS width,
       CAST(5 AS INTEGER) AS height,
       CAST(1 + doc_id % 3 AS INTEGER) AS n_frames,
       CAST(doc_id % 256 AS INTEGER) AS r_byte,
       CAST((doc_id * 5) % 256 AS INTEGER) AS g_byte,
       CAST((doc_id * 11) % 256 AS INTEGER) AS b_byte
FROM documents"""


# ----------------------------------------- pretraining sequence packing
PACK_SEQ_LEN = 512  # power of two: the fill-ratio division is exact
PACK_SEP = 1


def q_pack_sequences(spark, sf_dir):
    """The concat-and-chunk pretraining packing plan under the
    VALUE-HASH gate: documents in doc_id order, one separator token
    per document, fixed 512-token sequences — every (sequence,
    document-slice) assignment value-checked. The Spark side computes
    the global running offset with ranking.global_cumsum (distributed
    prefix sums), the oracle with a plain windowed sum — identical
    integers, very different physical plans."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    return SequencePacking.pack_plan(
        load(spark, sf_dir, "documents"),
        PACK_SEQ_LEN,
        sep_tokens=PACK_SEP,
    )


O_PACK_SEQUENCES = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                              x -> len(x) > 0)) AS BIGINT) AS n
  FROM documents),
offs AS (
  SELECT doc_id, n,
         CAST(sum(n + {PACK_SEP}) OVER (ORDER BY doc_id)
              - (n + {PACK_SEP}) AS BIGINT) AS off
  FROM toks),
spans AS (
  SELECT doc_id, n, off,
         CAST(unnest(generate_series(off // {PACK_SEQ_LEN},
                                     (off + n - 1) // {PACK_SEQ_LEN}))
          AS BIGINT) AS seq_id
  FROM offs WHERE n > 0)
SELECT seq_id, doc_id,
       greatest(CAST(0 AS BIGINT), seq_id * {PACK_SEQ_LEN} - off)
         AS tok_start,
       least(n, (seq_id + 1) * {PACK_SEQ_LEN} - off) AS tok_end,
       least(n, (seq_id + 1) * {PACK_SEQ_LEN} - off)
         - greatest(CAST(0 AS BIGINT), seq_id * {PACK_SEQ_LEN} - off)
         AS n_toks,
       greatest(CAST(0 AS BIGINT), off - seq_id * {PACK_SEQ_LEN})
         AS seq_pos
FROM spans"""


def q_pack_texts(spark, sf_dir):
    """The packed-sequence MATERIALIZER under the VALUE-HASH gate:
    the plan joined back to the tokenized text, slices assembled in
    seq_pos order with separators rendered at their reserved in-
    sequence positions — the (seq_id, text) relation a pretraining
    run hands to tokenization. Gate checks every byte of every packed
    sequence."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    docs = load(spark, sf_dir, "documents")
    plan = SequencePacking.pack_plan(
        docs, PACK_SEQ_LEN, sep_tokens=PACK_SEP
    )
    return SequencePacking.pack_texts(
        docs, plan, PACK_SEQ_LEN, sep_tokens=PACK_SEP
    )


O_PACK_TEXTS = f"""
WITH plan AS ({O_PACK_SEQUENCES.strip()}),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+'),
                     x -> len(x) > 0) AS t
  FROM documents),
sliced AS (
  -- PACK_SEP = 1: the general render rule (min(sep_tokens, boundary
  -- room) separators per document-ending slice) reduces to one
  -- separator iff the slice's end is not flush with the sequence cut
  SELECT p.seq_id, p.seq_pos, p.n_toks,
         array_to_string(list_slice(t, CAST(p.tok_start + 1 AS INTEGER),
                                    CAST(p.tok_end AS INTEGER)), ' ')
           AS piece,
         p.tok_end = len(t)
           AND p.seq_pos + p.n_toks < {PACK_SEQ_LEN} AS ends_doc
  FROM plan p JOIN toks USING (doc_id))
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       string_agg(CASE WHEN ends_doc THEN piece || ' <|sep|>'
                       ELSE piece END, ' ' ORDER BY seq_pos) AS text
FROM sliced GROUP BY seq_id"""


def q_pack_fill_stats(spark, sf_dir):
    """Per-sequence packing fill report (docs per sequence, document
    tokens, fill ratio) over the same plan — the data-quality check a
    pretraining run does before writing sequences. seq_len is a power
    of two so the fill-ratio division is float-exact in both
    engines."""
    from sparker_spark.entry import load
    from sparker_spark.llm.packing import SequencePacking

    plan = SequencePacking.pack_plan(
        load(spark, sf_dir, "documents"),
        PACK_SEQ_LEN,
        sep_tokens=PACK_SEP,
    )
    return SequencePacking.pack_stats(plan, PACK_SEQ_LEN)


O_PACK_FILL_STATS = f"""
WITH plan AS ({O_PACK_SEQUENCES.strip()})
SELECT seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_doc_tokens,
       CAST(sum(n_toks) AS DOUBLE) / {float(PACK_SEQ_LEN)} AS fill_ratio
FROM plan GROUP BY seq_id"""


def r7_queries() -> dict:
    return {
        "video_frame_features": q_video_frame_features,
        "knn_label_vote_ivf": q_knn_label_vote_ivf,
        "jaccard_prefix_join_skew": q_jaccard_prefix_join_skew,
        "audio_flac_features": q_audio_flac_features,
        "video_thumbnails": q_video_thumbnails,
        "pack_sequences": q_pack_sequences,
        "pack_fill_stats": q_pack_fill_stats,
        "pack_texts": q_pack_texts,
        "multimodal_gif_features": q_multimodal_gif_features,
    }


def r7_oracles() -> dict:
    from sparker_spark.entry_r6 import _o_knn_label_vote

    return {
        "video_frame_features": O_VIDEO_FRAME_FEATURES,
        # full-probe IVF output == exact kNN output (see query doc)
        "knn_label_vote_ivf": _o_knn_label_vote(),
        "jaccard_prefix_join_skew": O_JACCARD_PREFIX_SKEW,
        "audio_flac_features": O_AUDIO_FLAC,
        "video_thumbnails": O_VIDEO_THUMBNAILS,
        "pack_sequences": O_PACK_SEQUENCES,
        "pack_fill_stats": O_PACK_FILL_STATS,
        "pack_texts": O_PACK_TEXTS,
        "multimodal_gif_features": O_MULTIMODAL_GIF,
    }
