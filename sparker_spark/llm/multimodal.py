"""Multimodal-column plumbing (SURVEY §7.1 M8 / driver brief).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery — schemas, partition sizing,
Arrow-batched mapInPandas with bounded batch memory — is real and
tested; the codec step itself is stubbed behind ``DecodeRegistry``
(image/audio libraries are not in this container) with a deterministic
fake used by tests. Swapping in PIL/torchaudio later changes ONE
registry entry and nothing else.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


@contextmanager
def arrow_batch_rows(spark: SparkSession, rows: int):
    """Scope ``spark.sql.execution.arrow.maxRecordsPerBatch`` to a
    block, restoring the previous value on exit. The conf is read at
    ACTION time, not at DataFrame definition, so wrap the action::

        feats = extract_features(media)
        with arrow_batch_rows(spark, 64):
            feats.write.parquet(out)

    Without this, a small batch size set for binary payloads would
    degrade every later pandas exchange (toPandas, applyInPandas) in
    the session.
    """
    prev = spark.conf.get(_ARROW_BATCH_CONF, None)
    spark.conf.set(_ARROW_BATCH_CONF, str(int(rows)))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(_ARROW_BATCH_CONF)
        else:
            spark.conf.set(_ARROW_BATCH_CONF, prev)

# canonical multimodal schema fragments
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class DecodeRegistry:
    """Pluggable decoders. The default is a deterministic fake (byte
    histogram as the 'feature') so the distributed plumbing is fully
    exercisable without codec libraries; real deployments register
    e.g. a PIL-based decoder under the same signature."""

    _decoders: dict[str, Callable[[bytes], list[float]]] = {}

    @classmethod
    def register(cls, mime_prefix: str, fn: Callable[[bytes], list[float]]):
        cls._decoders[mime_prefix] = fn

    @classmethod
    def decode(cls, mime: str, payload: bytes) -> list[float]:
        # longest matching prefix wins, so a specific decoder beats the
        # "" catch-all regardless of registration order
        best = None
        for prefix, fn in cls._decoders.items():
            if mime.startswith(prefix) and (
                best is None or len(prefix) > len(best[0])
            ):
                best = (prefix, fn)
        if best is not None:
            return best[1](payload)
        raise NotImplementedError(
            f"no decoder registered for mime {mime!r}; media codecs are "
            "stubbed in this environment — register one via "
            "DecodeRegistry.register()"
        )


def _fake_byte_histogram(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: 16-bin byte histogram, L1-normed."""
    bins = [0] * 16
    for b in payload:
        bins[b >> 4] += 1
    total = max(sum(bins), 1)
    return [b / total for b in bins]


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a binary-PPM (P6) header: magic, whitespace/comment-
    separated width, height, maxval, one whitespace byte. Returns
    (width, height, maxval, raster_offset)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if not 0 < maxval <= 255:
        # maxval > 255 means TWO bytes per sample (big-endian) — this
        # dependency-free codec handles the 1-byte variant only, and
        # reading a 16-bit raster as uint8 would silently corrupt the
        # pixels rather than fail
        raise ValueError(
            f"unsupported PPM maxval {maxval}: only 8-bit (maxval <= 255) "
            "binary PPM is supported"
        )
    return width, height, maxval, pos + 1  # single whitespace after maxval


def decode_ppm(payload: bytes) -> list[float]:
    """Real (dependency-free) image decoder for binary PPM (P6).

    Parses the netpbm header and returns
    ``[width, height, mean_r, mean_g, mean_b]`` with means normalized
    to [0, 1]. Proves the ``DecodeRegistry`` plug point with an actual
    codec: registering it routes ``image/x-portable-pixmap`` payloads
    through a real parse while every other mime keeps its registered
    behavior.
    """
    width, height, maxval, pos = _ppm_header(payload)
    n_px = width * height
    raster = payload[pos : pos + 3 * n_px]
    if len(raster) < 3 * n_px:
        raise ValueError("truncated PPM raster")
    sums = [0, 0, 0]
    for i in range(0, 3 * n_px, 3):
        sums[0] += raster[i]
        sums[1] += raster[i + 1]
        sums[2] += raster[i + 2]
    denom = float(max(n_px, 1) * maxval)
    return [
        float(width),
        float(height),
        sums[0] / denom,
        sums[1] / denom,
        sums[2] / denom,
    ]


def decode_wav(payload: bytes) -> list[float]:
    """Real (dependency-free) audio decoder for PCM WAV (RIFF).

    Parses the RIFF/WAVE chunk structure — fmt (PCM code, channels,
    sample rate, bits per sample) and data — and returns
    ``[n_channels, sample_rate, duration_s, mean_abs_amplitude]`` with
    amplitude normalized to [0, 1] (8-bit unsigned and 16-bit signed
    little-endian PCM supported). The audio twin of decode_ppm: a real
    codec through the same DecodeRegistry plug point.
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    bytes_per_sample = bits // 8
    n_frames = len(data) // (bytes_per_sample * n_channels)
    n_samples = n_frames * n_channels
    if n_samples == 0:
        return [float(n_channels), float(sample_rate), 0.0, 0.0]
    total = 0.0
    if bits == 8:  # unsigned, midpoint 128
        for b in data[: n_samples]:
            total += abs(b - 128) / 127.0
    else:
        for (v,) in struct.iter_unpack("<h", data[: 2 * n_samples]):
            total += abs(v) / 32768.0
    return [
        float(n_channels),
        float(sample_rate),
        n_frames / float(sample_rate),
        total / n_samples,
    ]


DecodeRegistry.register("", _fake_byte_histogram)  # default fallback
DecodeRegistry.register("image/x-portable-pixmap", decode_ppm)
DecodeRegistry.register("audio/wav", decode_wav)


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
    batch_rows: int = 64,
) -> DataFrame:
    """Decode/feature-extract over binary media columns via Arrow-batched
    mapInPandas.

    Batch memory is bounded two ways: the UDF re-slices every incoming
    pandas batch into ``batch_rows`` chunks (bounding the per-chunk
    working set and the OUTPUT Arrow batches), and callers bound the
    INPUT Arrow batches by wrapping the action in
    :func:`arrow_batch_rows` — a conf set inside this builder would be
    a session-wide side effect (and a set-then-restore here would be a
    no-op, since the conf is read at action time).

    ``n_bytes``/``content_hash`` are computed with vectorized pandas
    ops; the only per-row Python is the (inherently per-payload)
    ``DecodeRegistry.decode`` call.
    """

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                payloads = chunk[payload_col].map(
                    lambda p: bytes(p) if p is not None else b""
                )
                mimes = chunk[mime_col].map(lambda m: str(m or ""))
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype("int64"),
                        "n_bytes": payloads.map(len).astype("int64"),
                        "content_hash": payloads.map(
                            lambda p: hashlib.md5(p).hexdigest()
                        ),
                        "feature": [
                            DecodeRegistry.decode(m, p)
                            for m, p in zip(mimes, payloads)
                        ],
                    }
                )

    cols = media.select(id_col, payload_col, mime_col)
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    batch_rows: int = 64,
) -> DataFrame:
    """Real decode → transform → re-encode over binary image columns:
    nearest-neighbor resize of binary-PPM (P6) payloads, numpy-
    vectorized inside Arrow-batched mapInPandas.

    Per payload: parse the header (``_ppm_header``), view the raster
    as an (h, w, 3) uint8 array with ``np.frombuffer`` (zero-copy),
    gather the target grid with two integer index vectors (the classic
    nearest-neighbor sample — pure vectorized fancy-indexing, no
    Python pixel loop), and re-emit a P6 payload with the new header.
    Output rows: (media_id, payload, width, height). The same
    ``batch_rows`` re-slicing as :func:`extract_features` bounds the
    per-chunk working set; wrap the ACTION in :func:`arrow_batch_rows`
    to bound input Arrow batches when payloads are large.

    This is the plumbing pattern for any per-item media transform at
    scale (resize / crop / re-encode): row-parallel, codec-local,
    no driver involvement. Swap the PPM codec for PIL/libvips by
    replacing the parse/encode pair only.
    """
    tw, th = int(width), int(height)
    if tw <= 0 or th <= 0:
        raise ValueError("target width/height must be positive")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def one(payload) -> tuple[bytes, int, int]:
            p = bytes(payload)
            w, h, maxval, off = _ppm_header(p)
            raster = np.frombuffer(p, dtype=np.uint8, count=3 * w * h, offset=off)
            img = raster.reshape(h, w, 3)
            ys = (np.arange(th) * h) // th
            xs = (np.arange(tw) * w) // tw
            out = img[ys][:, xs]
            header = f"P6\n{tw} {th}\n{maxval}\n".encode("ascii")
            return header + out.tobytes(), tw, th

        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                resized = [one(p) for p in chunk[payload_col]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].astype("int64"),
                        "payload": [r[0] for r in resized],
                        "width": [r[1] for r in resized],
                        "height": [r[2] for r in resized],
                    }
                )

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Expand each video row into (media_id, frame_ts_ms) sampling rows
    using metadata only — pure column expressions, no decode. The
    downstream decoder consumes (media_id, frame_ts_ms) work units, so
    frame extraction parallelism is row-level, not file-level."""
    return media.select(
        F.col(id_col).alias("media_id"),
        F.explode(
            F.expr(
                f"CASE WHEN meta.duration_ms >= {every_ms} THEN "
                f"sequence(0L, meta.duration_ms - 1, CAST({every_ms} AS BIGINT)) "
                f"ELSE array(0L) END"
            )
        ).alias("frame_ts_ms"),
    )
