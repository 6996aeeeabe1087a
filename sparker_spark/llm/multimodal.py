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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        for prefix, fn in cls._decoders.items():
            if mime.startswith(prefix):
                return fn(payload)
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


DecodeRegistry.register("", _fake_byte_histogram)  # default fallback


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    mime_col: str = "mime",
    batch_rows: int = 64,
) -> DataFrame:
    """Decode/feature-extract over binary media columns via Arrow-batched
    mapInPandas. Batch size is bounded by rows (binary payloads are
    large — cap Arrow batch memory via maxRecordsPerBatch rather than
    trusting the default 10k)."""
    spark = media.sparkSession
    spark.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows)
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col]) if row[payload_col] is not None else b""
                feats.append(
                    {
                        "media_id": int(row[id_col]),
                        "n_bytes": len(payload),
                        "content_hash": hashlib.md5(payload).hexdigest(),
                        "feature": DecodeRegistry.decode(
                            str(row[mime_col] or ""), payload
                        ),
                    }
                )
            yield pd.DataFrame(feats)

    cols = media.select(id_col, payload_col, mime_col)
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


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
