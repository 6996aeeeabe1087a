"""Baseline JPEG codec tests (sparker_spark/llm/jpeg.py).

Mirrors test_png_codec.py's strategy: the key fixture is produced by
an INDEPENDENT minimal writer below that emits marker segments and
entropy-coded bits straight from the T.81 spec (canonical code
assignment re-derived by hand, not imported from the codec), so the
decoder is checked against the specification rather than against its
own encoder. Encoder<->decoder roundtrips then pin the lossy paths
(quality scaling, 4:2:0, restarts) within tight tolerances.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparker_spark.llm import jpeg


# ------------------------------------------------ independent writer


def _canonical_codes(bits, symbols):
    """Spec F.2.2.1 canonical code assignment, re-derived here."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[symbols[k]] = (code, ln)
            k += 1
            code += 1
        code *= 2
    return out


class _Bits:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self):
        while len(self.bits) % 8:
            self.bits.append(1)  # spec 1-padding
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


# minimal tables: DC categories 0..11 as fixed 4-bit codes, AC with a
# single 1-bit EOB code
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_BITS = [1] + [0] * 15
_AC_SYMS = [0x00]


def _spec_direct_gray_jpeg(value: int, width: int = 16, height: int = 8,
                           dqt16: bool = False) -> bytes:
    """Solid-``value`` grayscale baseline JPEG, DC-only entropy data
    hand-coded from the spec. Quant table all ones so the decoded
    pixels are exactly ``value``. ``dqt16`` writes the table with
    16-bit precision (pq=1) to cover that DQT branch."""
    assert width % 8 == 0 and height % 8 == 0
    n_blocks = (width // 8) * (height // 8)
    dc = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac = _canonical_codes(_AC_BITS, _AC_SYMS)

    bits = _Bits()
    diff = 8 * (value - 128)  # first block's DC; later diffs are 0
    for i in range(n_blocks):
        d = diff if i == 0 else 0
        if d == 0:
            cat = 0
        else:
            cat = abs(d).bit_length()
        code, ln = dc[cat]
        bits.put(code, ln)
        if cat:
            raw = d if d >= 0 else d + (1 << cat) - 1
            bits.put(raw, cat)
        code, ln = ac[0x00]  # EOB immediately: all AC zero
        bits.put(code, ln)

    if dqt16:
        dqt = _seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([1] * 64)))
    else:
        dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, height, width, 1)
               + bytes([1, 0x11, 0]))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
           + _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS)))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bits.tobytes()
            + b"\xff\xd9")


def test_spec_direct_writer_decodes_exactly():
    for v in (0, 7, 128, 200, 255):
        img = jpeg.decode(_spec_direct_gray_jpeg(v))
        assert img.shape == (8, 16, 1)
        assert (img == v).all()


def test_sixteen_bit_dqt_branch():
    img = jpeg.decode(_spec_direct_gray_jpeg(77, dqt16=True))
    assert (img == 77).all()


# ------------------------------------------------ roundtrips


def test_solid_rgb_matches_shared_rounding_prediction():
    r, g, b = 200, 37, 91
    img = np.zeros((16, 24, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = r, g, b
    dec = jpeg.decode(jpeg.encode(img, quality=100))
    # the exact value the SQL oracle computes with floor(x+0.5)
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128 + 0.5)
    cr = np.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128 + 0.5)
    exp = [
        np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255),
        np.clip(
            np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
            0, 255,
        ),
        np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255),
    ]
    assert (dec.reshape(-1, 3) == np.array(exp)).all()


def test_smooth_gradient_high_quality_tolerance():
    img = np.clip(
        np.linspace(0, 255, 48 * 64 * 3).reshape(48, 64, 3), 0, 255
    ).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_random_image_reasonable_quality():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(img, quality=90))
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 16  # random noise is JPEG's worst case; sanity bound


def test_subsampled_420_and_odd_dimensions():
    rng = np.random.default_rng(7)
    for shape in [(17, 19, 3), (8, 8, 3), (33, 9, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8).astype(np.uint8)
        dec = jpeg.decode(jpeg.encode(img, quality=85, subsample=True))
        assert dec.shape == shape
    # solid color survives 4:2:0 exactly at q100 (chroma constant)
    img = np.full((10, 14, 3), 0, dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 64, 128, 192
    d1 = jpeg.decode(jpeg.encode(img, quality=100, subsample=True))
    d2 = jpeg.decode(jpeg.encode(img, quality=100, subsample=False))
    assert (d1 == d2).all()
    assert len(np.unique(d1.reshape(-1, 3), axis=0)) == 1


def test_grayscale_roundtrip():
    img = (np.arange(40 * 56).reshape(40, 56) % 256).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(img, quality=95))
    assert dec.shape == (40, 56, 1)
    assert np.abs(dec[..., 0].astype(int) - img.astype(int)).mean() < 2.0


def test_restart_interval_is_transparent():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8).astype(np.uint8)
    base = jpeg.decode(jpeg.encode(img, quality=90))
    for ri in (1, 2, 3):
        withr = jpeg.decode(jpeg.encode(img, quality=90, restart_interval=ri))
        assert (withr == base).all()
    # and the RSTn markers are really in the stream
    assert b"\xff\xd0" in jpeg.encode(img, quality=90, restart_interval=1)


# ------------------------------------------------ rejection / errors


# --------------------------------------------------- progressive (SOF2)
# The progressive file carries the SAME quantized coefficients as the
# sequential file at equal quality — SOF2 only reorders the bits across
# scans — so decode output must be bit-identical to the sequential
# decode, which makes every round trip below an exact assertion even
# though JPEG itself is lossy.


@pytest.mark.parametrize(
    "h,w,gray,quality,subsample,dc_al,ac_al,ac_split",
    [
        (8, 8, False, 90, False, 1, 1, 5),  # canonical 4-kind scan script
        (6, 8, False, 100, False, 1, 1, 5),  # r6 gate fixture shape
        (16, 24, False, 75, False, 2, 2, 9),  # two refinement levels
        (17, 23, False, 90, True, 1, 1, 5),  # 4:2:0 + odd dims
        (9, 13, True, 85, False, 1, 2, 63),  # grayscale, single band
        (32, 32, False, 50, False, 0, 0, 5),  # spectral selection only
        (8, 8, False, 90, False, 0, 1, 1),  # minimal first band
    ],
)
def test_progressive_matches_sequential(
    h, w, gray, quality, subsample, dc_al, ac_al, ac_split
):
    rng = np.random.RandomState(h * 100 + w)
    img = rng.randint(0, 256, (h, w, 1 if gray else 3)).astype(np.uint8)
    seq = jpeg.decode(jpeg.encode(img, quality=quality, subsample=subsample))
    prog_payload = jpeg.encode_progressive(
        img, quality=quality, subsample=subsample,
        dc_al=dc_al, ac_al=ac_al, ac_split=ac_split,
    )
    assert prog_payload[2:4] != b"\xff\xc0"
    assert b"\xff\xc2" in prog_payload[:200]  # SOF2 present
    prog = jpeg.decode(prog_payload)
    assert np.array_equal(seq, prog)


def test_progressive_random_sweep():
    rng = np.random.RandomState(7)
    for _ in range(25):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        gray = bool(rng.randint(2))
        q = int(rng.randint(30, 101))
        sub = bool(rng.randint(2)) and not gray
        img = rng.randint(0, 256, (h, w, 1 if gray else 3)).astype(np.uint8)
        seq = jpeg.decode(jpeg.encode(img, quality=q, subsample=sub))
        prog = jpeg.decode(
            jpeg.encode_progressive(
                img, quality=q, subsample=sub,
                dc_al=int(rng.randint(0, 3)), ac_al=int(rng.randint(0, 3)),
                ac_split=int(rng.choice([1, 5, 20, 63])),
            )
        )
        assert np.array_equal(seq, prog), (h, w, gray, q, sub)


def test_progressive_solid_color_exact_ycc_roundtrip():
    """Solid-color quality-100 progressive decodes to the exact integer
    YCbCr round trip — the property the multimodal value-hash gate
    relies on for sequential fixtures holds for SOF2 too."""
    img = np.zeros((6, 8, 3), dtype=np.uint8)
    img[:, :, 0], img[:, :, 1], img[:, :, 2] = 123, 37, 201
    seq = jpeg.decode(jpeg.encode(img, quality=100))
    prog = jpeg.decode(jpeg.encode_progressive(img, quality=100))
    assert np.array_equal(seq, prog)
    assert (prog == prog[0, 0, :]).all()


def test_progressive_rejects_out_of_range_band():
    """Se past 63 must raise the documented ValueError (which callers
    route to the pillow fallback), not an IndexError into ZIGZAG."""
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    payload = bytearray(jpeg.encode_progressive(img))
    pos = 2
    while True:  # first AC scan's Se -> 120
        i = payload.find(b"\xff\xda", pos)
        assert i > 0
        ns = payload[i + 4]
        ss_off = i + 5 + 2 * ns
        if payload[ss_off] != 0:
            payload[ss_off + 1] = 120
            break
        pos = i + 2
    with pytest.raises(ValueError, match="spectral selection"):
        jpeg.decode(bytes(payload))


def test_progressive_rejects_malformed_scans():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    payload = bytearray(jpeg.encode_progressive(img))
    # corrupt the first SOS's spectral selection: Ss=0 with Se>0 mixes
    # DC and AC in one progressive scan — must be named, not garbled
    i = payload.find(b"\xff\xda")
    assert i > 0
    (size,) = struct.unpack(">H", payload[i + 2 : i + 4])
    ss_off = i + 4 + 1 + 2 * payload[i + 4]
    assert payload[ss_off] == 0  # DC scan
    payload[ss_off + 1] = 13  # Se
    with pytest.raises(ValueError, match="mixes DC and AC"):
        jpeg.decode(bytes(payload))


def test_truncated_entropy_stream_raises():
    payload = jpeg.encode(np.full((8, 8), 99, dtype=np.uint8), quality=90)
    with pytest.raises(ValueError, match="truncated|marker"):
        jpeg.decode(payload[:-20])


def test_not_a_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode(b"\x89PNG\r\n\x1a\nnope")


def test_registry_routes_jpeg_payloads():
    from sparker_spark.llm.multimodal import DecodeRegistry

    img = np.full((8, 6, 3), 0, dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 10, 20, 30
    feats = DecodeRegistry.decode("image/jpeg", jpeg.encode(img, quality=100))
    assert feats[0] == 6.0 and feats[1] == 8.0
    assert all(0.0 <= m <= 1.0 for m in feats[2:])


def test_registry_names_missing_capability_for_progressive():
    from sparker_spark.llm.multimodal import decode_jpeg

    sof2 = (b"\xff\xd8"
            + _seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
            + b"\xff\xd9")
    try:
        from PIL import Image  # noqa: F401

        pytest.skip("pillow installed: fallback handles progressive")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_jpeg(sof2)


def test_resize_images_jpeg_roundtrip(spark):
    from sparker_spark.llm.multimodal import resize_images

    img = np.zeros((16, 20, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 120, 60, 240
    payload = jpeg.encode(img, quality=100)
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    out = resize_images(df, 10, 8).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["width"], row["height"]) == (10, 8)
    dec = jpeg.decode(bytes(row["payload"]))
    assert dec.shape == (8, 10, 3)
    # solid color survives resize + q90 re-encode within quant error
    exp = jpeg.decode(payload)[0, 0]
    assert np.abs(dec.astype(int) - exp.astype(int)).max() <= 3


def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: optional 0xFF fill bytes may precede any marker
    payload = jpeg.encode(np.full((8, 8), 99, dtype=np.uint8), quality=90)
    sof_at = payload.index(b"\xff\xc0")
    padded = payload[:sof_at] + b"\xff\xff\xff" + payload[sof_at:]
    img = jpeg.decode(padded)
    assert img.shape == (8, 8, 1)
    assert (img == jpeg.decode(payload)).all()


def test_short_segment_body_raises_valueerror_not_struct_error():
    # SOF0 declaring size 4: body is too short for the ">HH" dims read
    bad = (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 4) + b"\x08\x00"
           + b"\xff\xd9")
    with pytest.raises(ValueError, match="truncated JPEG segment"):
        jpeg.decode(bad)


def test_empty_dri_body_raises_valueerror():
    bad = b"\xff\xd8" + b"\xff\xdd" + struct.pack(">H", 2) + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg.decode(bad)


def test_non_divisible_sampling_layout_named():
    # h factors (3, 2, 1): spec-legal, but 2 does not divide 3 — must be
    # a precise rejection, not a numpy shape mismatch
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, struct.pack(">BHHB", 8, 24, 24, 3)
               + bytes([1, 0x31, 0, 2, 0x21, 0, 3, 0x11, 0]))
    dht = (_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
           + _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS)))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    bad = b"\xff\xd8" + dqt + sof + dht + sos + b"\x00" * 64 + b"\xff\xd9"
    with pytest.raises(ValueError, match="sampling-factor layout"):
        jpeg.decode(bad)
