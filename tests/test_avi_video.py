"""Tests for the MJPEG-in-AVI container codec (llm/avi.py) and the
frame-decode operator (multimodal.video_frame_features).

Fixture AVIs are built by the repo's own encoder from solid-color
quality-100 JPEG frames; on those, the decoded bytes are the exact
integer YCbCr round trip of the input color (see llm/jpeg.py module
docstring), so frame-level assertions can be exact."""

import numpy as np
import pytest

from sparker_spark.llm import avi, jpeg
from sparker_spark.llm.multimodal import (
    DecodeRegistry,
    video_frame_features,
)


def _ycc_roundtrip(r, g, b):
    """The codec's integer RGB->YCbCr->RGB round trip (floor(x+0.5))."""
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5)
    out = (
        np.floor(y + 1.402 * (cr - 128.0) + 0.5),
        np.floor(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0) + 0.5),
        np.floor(y + 1.772 * (cb - 128.0) + 0.5),
    )
    return tuple(int(min(max(v, 0), 255)) for v in out)


def _solid_frames(colors, w=8, h=6):
    frames = []
    for r, g, b in colors:
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0], img[:, :, 1], img[:, :, 2] = r, g, b
        frames.append(jpeg.encode(img, quality=100))
    return frames


COLORS = [(10, 200, 5), (50, 170, 22), (90, 140, 39), (250, 3, 128)]


def test_avi_roundtrip_frames_and_timing():
    payload = avi.encode_avi_mjpeg(
        _solid_frames(COLORS), 8, 6, fps_num=2, fps_den=1
    )
    v = avi.parse_avi(payload)
    assert (v.width, v.height) == (8, 6)
    assert v.n_frames == 4
    assert (v.scale, v.rate) == (1, 2)
    assert v.duration_ms == 2000
    assert [v.frame_ts_ms(i) for i in range(4)] == [0, 500, 1000, 1500]
    for i, c in enumerate(COLORS):
        img = jpeg.decode(v.frames[i])
        assert img.shape == (6, 8, 3)
        expected = _ycc_roundtrip(*map(float, c))
        assert tuple(img[0, 0, :]) == expected
        # solid: every pixel identical
        assert (img == img[0, 0, :]).all()


def test_avi_frame_index_at_floor_and_clamp():
    payload = avi.encode_avi_mjpeg(_solid_frames(COLORS), 8, 6, fps_num=2)
    v = avi.parse_avi(payload)
    assert v.frame_index_at(0) == 0
    assert v.frame_index_at(499) == 0
    assert v.frame_index_at(500) == 1
    assert v.frame_index_at(1999) == 3
    assert v.frame_index_at(10**9) == 3  # clamped to last frame
    assert v.frame_index_at(-5) == 0


def test_avi_odd_sized_frames_word_aligned():
    """JPEG payloads with odd byte lengths must survive the RIFF
    word-alignment padding."""
    frames = _solid_frames(COLORS[:2])
    # force odd lengths by appending a trailing comment-free byte is
    # not valid JPEG; instead check whatever parity encode produced
    # and confirm both parities occur across a color sweep round trip
    payload = avi.encode_avi_mjpeg(frames, 8, 6, fps_num=4)
    v = avi.parse_avi(payload)
    assert [len(f) for f in v.frames] == [len(f) for f in frames]
    assert all(a == b for a, b in zip(v.frames, frames))


def test_avi_rejects_garbage_and_wrong_codec():
    with pytest.raises(ValueError, match="RIFF"):
        avi.parse_avi(b"\x00" * 40)
    with pytest.raises(ValueError, match="AVI"):
        avi.parse_avi(b"RIFF" + b"\x04\x00\x00\x00" + b"WAVE")
    payload = bytearray(
        avi.encode_avi_mjpeg(_solid_frames(COLORS[:1]), 8, 6)
    )
    idx = payload.find(b"vids") + 4
    payload[idx : idx + 4] = b"H264"
    with pytest.raises(ValueError, match="H264"):
        avi.parse_avi(bytes(payload))
    with pytest.raises(ValueError, match="zero frames"):
        avi.encode_avi_mjpeg([], 8, 6)


def test_avi_truncated_header_raises_value_error():
    """Header fields shorter than the structs parsed from them must
    surface as ValueError (the module contract), never struct.error."""
    import struct as _s

    payload = (
        b"RIFF" + _s.pack("<I", 4 + 8 + 36) + b"AVI "
        + b"LIST" + _s.pack("<I", 4 + 40) + b"hdrl"
        + b"avih" + _s.pack("<I", 32) + b"\x00" * 32
    )
    with pytest.raises(ValueError):
        avi.parse_avi(payload)


def test_avi_timing_fallback_micro_per_frame():
    """strh dwScale/dwRate zeroed -> timing falls back to the main
    header's dwMicroSecPerFrame."""
    payload = bytearray(
        avi.encode_avi_mjpeg(_solid_frames(COLORS[:2]), 8, 6, fps_num=4)
    )
    idx = payload.find(b"vids")
    # dwScale/dwRate live 20 bytes into the strh body (after
    # fccType/fccHandler at offsets 0/4)
    payload[idx + 20 : idx + 28] = b"\x00" * 8
    v = avi.parse_avi(bytes(payload))
    assert (v.scale, v.rate) == (250_000, 1_000_000)
    assert v.duration_ms == 500


def test_decode_avi_registry_summary():
    payload = avi.encode_avi_mjpeg(
        _solid_frames(COLORS), 8, 6, fps_num=2
    )
    feat = DecodeRegistry.decode("video/x-msvideo", payload)
    expected = _ycc_roundtrip(*map(float, COLORS[0]))
    assert feat[:4] == [8.0, 6.0, 4.0, 2.0]
    assert [round(x * 255) for x in feat[4:]] == list(expected)


def test_video_frame_features_end_to_end(spark):
    """Two videos, every_ms finer than the frame duration: sampled
    timestamps map onto frames with floor semantics; short clip
    contributes its first frame only."""
    rows = [
        (1, avi.encode_avi_mjpeg(_solid_frames(COLORS), 8, 6, fps_num=2)),
        (2, avi.encode_avi_mjpeg(_solid_frames(COLORS[:1]), 8, 6, fps_num=2)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_frame_features(media, every_ms=400).collect()
    by_key = {(r["media_id"], r["frame_ts_ms"]): r for r in out}
    # video 1: duration 2000ms -> ts 0,400,...,1600; indices floor(ts/500)
    assert sorted(
        k[1] for k in by_key if k[0] == 1
    ) == [0, 400, 800, 1200, 1600]
    assert [by_key[(1, t)]["frame_index"] for t in (0, 400, 800, 1200, 1600)] \
        == [0, 0, 1, 2, 3]
    # video 2: duration 500ms -> ts 0, 400
    assert sorted(k[1] for k in by_key if k[0] == 2) == [0, 400]
    for (mid, ts), r in by_key.items():
        idx = r["frame_index"]
        expected = _ycc_roundtrip(*map(float, COLORS[idx]))
        got = tuple(
            round(r[c] * 255) for c in ("mean_r", "mean_g", "mean_b")
        )
        assert got == expected, (mid, ts)
        assert (r["width"], r["height"]) == (8, 6)


def test_video_thumbnails_resize_and_reencode(spark):
    """Thumbnails are decodable JPEGs at the target size; solid frames
    survive the double round trip as the twice-applied YCbCr map."""
    from sparker_spark.llm.multimodal import video_thumbnails

    rows = [
        (1, avi.encode_avi_mjpeg(_solid_frames(COLORS), 8, 6, fps_num=2)),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_thumbnails(
        media, 4, 3, every_ms=500, quality=100
    ).collect()
    assert sorted(r["frame_ts_ms"] for r in out) == [0, 500, 1000, 1500]
    for r in out:
        img = jpeg.decode(bytes(r["payload"]))
        assert img.shape == (3, 4, 3)
        once = _ycc_roundtrip(*map(float, COLORS[r["frame_index"]]))
        twice = _ycc_roundtrip(*map(float, once))
        assert tuple(img[0, 0, :]) == twice
        assert (img == img[0, 0, :]).all()
        assert (r["width"], r["height"]) == (4, 3)


def test_video_frame_features_clip_shorter_than_every_ms(spark):
    rows = [(7, avi.encode_avi_mjpeg(_solid_frames(COLORS[:2]), 8, 6, fps_num=8))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_frame_features(media, every_ms=1000).collect()
    assert len(out) == 1
    assert (out[0]["frame_ts_ms"], out[0]["frame_index"]) == (0, 0)
