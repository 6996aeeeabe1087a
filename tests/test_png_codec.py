"""PNG codec tests (sparker_spark/llm/multimodal.py).

The fixtures are produced by an INDEPENDENT minimal PNG writer below
that applies the scanline filters straight from the PNG spec (RFC
2083 §6), so the decoder is checked against the specification rather
than against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sparker_spark.llm.multimodal import (
    DecodeRegistry,
    _png_decode_rgb,
    _png_encode_rgb,
    decode_png,
    extract_features,
    resize_images,
)

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(raw: np.ndarray, prev: np.ndarray, ftype: int, bpp: int):
    """Spec-direct forward filter of one reconstructed scanline."""
    out = np.zeros_like(raw)
    for x in range(len(raw)):
        left = int(raw[x - bpp]) if x >= bpp else 0
        up = int(prev[x])
        ul = int(prev[x - bpp]) if x >= bpp else 0
        cur = int(raw[x])
        if ftype == 0:
            out[x] = cur
        elif ftype == 1:
            out[x] = (cur - left) & 0xFF
        elif ftype == 2:
            out[x] = (cur - up) & 0xFF
        elif ftype == 3:
            out[x] = (cur - ((left + up) >> 1)) & 0xFF
        elif ftype == 4:
            out[x] = (cur - _paeth(left, up, ul)) & 0xFF
    return out


def _write_png(
    pixels: np.ndarray,
    color_type: int,
    filters: list[int],
    palette: bytes | None = None,
    idat_split: int | None = None,
) -> bytes:
    """pixels: (h, w, channels) uint8 — already in the file's channel
    layout (palette indices for color type 3)."""
    h, w, ch = pixels.shape
    bpp = ch
    raster = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw = pixels[y].reshape(-1)
        ft = filters[y % len(filters)]
        raster.append(ft)
        raster.extend(_filter_row(raw, prev, ft, bpp).tobytes())
        prev = raw
    comp = zlib.compress(bytes(raster))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = _MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    if idat_split:
        for i in range(0, len(comp), idat_split):
            out += _chunk(b"IDAT", comp[i : i + idat_split])
    else:
        out += _chunk(b"IDAT", comp)
    return out + _chunk(b"IEND", b"")


def _rng_img(h, w, ch, seed=7):
    return (
        np.random.default_rng(seed)
        .integers(0, 256, size=(h, w, ch))
        .astype(np.uint8)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_rgb_each_filter_roundtrip(ftype):
    img = _rng_img(9, 7, 3, seed=ftype)
    decoded = _png_decode_rgb(_write_png(img, 2, [ftype]))
    np.testing.assert_array_equal(decoded, img)


def test_png_mixed_filters_and_multi_idat():
    img = _rng_img(10, 6, 3)
    payload = _write_png(img, 2, [0, 1, 2, 3, 4], idat_split=50)
    np.testing.assert_array_equal(_png_decode_rgb(payload), img)


def test_png_grayscale_replicates_channels():
    g = _rng_img(5, 4, 1)
    decoded = _png_decode_rgb(_write_png(g, 0, [1, 2]))
    np.testing.assert_array_equal(decoded, np.repeat(g, 3, axis=2))


def test_png_gray_alpha_drops_alpha():
    ga = _rng_img(4, 5, 2)
    decoded = _png_decode_rgb(_write_png(ga, 4, [4]))
    np.testing.assert_array_equal(
        decoded, np.repeat(ga[:, :, :1], 3, axis=2)
    )


def test_png_rgba_drops_alpha():
    rgba = _rng_img(6, 3, 4)
    decoded = _png_decode_rgb(_write_png(rgba, 6, [3]))
    np.testing.assert_array_equal(decoded, rgba[:, :, :3])


def test_png_palette_expansion():
    pal = np.arange(256 * 3, dtype=np.int64) % 251
    palette = pal.astype(np.uint8).tobytes()
    idx = _rng_img(5, 5, 1)
    decoded = _png_decode_rgb(_write_png(idx, 3, [0, 1], palette=palette))
    expected = (
        np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)[idx[:, :, 0]]
    )
    np.testing.assert_array_equal(decoded, expected)


def test_png_encoder_decoder_roundtrip():
    img = _rng_img(8, 8, 3, seed=42)
    np.testing.assert_array_equal(_png_decode_rgb(_png_encode_rgb(img)), img)


def test_png_rejects_bad_inputs():
    img = _rng_img(3, 3, 3)
    with pytest.raises(ValueError, match="not a PNG"):
        _png_decode_rgb(b"JFIF" + bytes(100))
    # 16-bit depth
    body = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad = _MAGIC + _chunk(b"IHDR", body) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        _png_decode_rgb(bad)
    # Adam7 interlace
    body = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)
    bad = (
        _MAGIC
        + _chunk(b"IHDR", body)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 30))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        _png_decode_rgb(bad)
    # truncated (no IEND)
    ok = _write_png(img, 2, [0])
    with pytest.raises(ValueError, match="truncated"):
        _png_decode_rgb(ok[:-20])


def test_decode_png_feature_contract():
    img = np.zeros((4, 10, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    feat = decode_png(_write_png(img, 2, [0]))
    assert feat[0] == 10.0 and feat[1] == 4.0
    assert feat[2] == pytest.approx(1.0) and feat[3] == 0.0 and feat[4] == 0.0


def test_decode_registry_routes_png():
    img = _rng_img(3, 3, 3)
    feat = DecodeRegistry.decode("image/png", _write_png(img, 2, [1]))
    assert len(feat) == 5 and feat[0] == 3.0


def test_decode_jpeg_requires_pillow_or_works():
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        pytest.skip("pillow present — covered by real decode")
    with pytest.raises(NotImplementedError, match="pillow"):
        DecodeRegistry.decode("image/jpeg", b"\xff\xd8\xff\xe0" + bytes(64))


def test_extract_features_png_on_spark(spark):
    img = _rng_img(6, 4, 3, seed=3)
    rows = [(1, bytearray(_write_png(img, 2, [2, 4])), "image/png")]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    out = extract_features(df).collect()
    assert len(out) == 1
    f = out[0]["feature"]
    assert f[0] == 4.0 and f[1] == 6.0
    exp = img.reshape(-1, 3).mean(axis=0) / 255.0
    assert f[2] == pytest.approx(exp[0], abs=1e-6)


def test_resize_images_png_preserves_format(spark):
    img = _rng_img(8, 8, 3, seed=9)
    ppm = (
        b"P6\n8 8\n255\n" + img.tobytes()
    )
    rows = [
        (1, bytearray(_write_png(img, 2, [3]))),
        (2, bytearray(ppm)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert out[1]["width"] == 4 and out[1]["height"] == 4
    p1 = bytes(out[1]["payload"])
    assert p1[:8] == _MAGIC  # PNG in -> PNG out
    ys, xs = (np.arange(4) * 8) // 4, (np.arange(4) * 8) // 4
    np.testing.assert_array_equal(_png_decode_rgb(p1), img[ys][:, xs])
    p2 = bytes(out[2]["payload"])
    assert p2.startswith(b"P6")  # PPM in -> PPM out
