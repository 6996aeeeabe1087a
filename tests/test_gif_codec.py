"""GIF codec tests (sparker_spark/llm/gif.py).

GIF is palette-based and lossless, so round trips assert exact pixel
equality. The decoder paths the fixture encoder cannot emit
(interlace, transparency, partial-canvas frames, disposal 2) are
exercised by patching encoder output or hand-assembling descriptors
from the spec."""

import struct

import numpy as np
import pytest

from sparker_spark.llm import gif
from sparker_spark.llm.multimodal import DecodeRegistry

PAL = [(10, 200, 5), (250, 3, 128), (0, 0, 0), (255, 255, 255)]


def test_single_frame_roundtrip_exact():
    idx = (np.arange(48, dtype=np.uint8) % 4).reshape(6, 8)
    payload = gif.encode_gif([idx], PAL)
    n, img = gif.decode(payload)
    assert n == 1
    assert np.array_equal(img, np.array(PAL, dtype=np.uint8)[idx])


def test_256_color_roundtrip_and_lzw_clears():
    pal = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    idx = (np.arange(64 * 64) % 256).astype(np.uint8).reshape(64, 64)
    n, img = gif.decode(gif.encode_gif([idx], pal))
    assert n == 1
    assert np.array_equal(img, np.array(pal, dtype=np.uint8)[idx])


def test_animation_composites_in_order():
    frames = [np.full((6, 8), v, dtype=np.uint8) for v in (0, 3, 1)]
    payload = gif.encode_gif(frames, PAL)
    out = gif.frames_rgb(payload)
    assert [tuple(f[0, 0, :]) for f in out] == [PAL[0], PAL[3], PAL[1]]
    n, first = gif.decode(payload)
    assert n == 3 and tuple(first[0, 0, :]) == PAL[0]


def test_interlaced_image_deinterlaces():
    """Set the interlace flag and feed row-permuted indices; the
    decoder must hand back the original raster."""
    h, w = 11, 5
    idx = (np.arange(h * w, dtype=np.uint8) % 4).reshape(h, w)
    # interlace storage order: passes at rows 0,8 / 4 / 2,6,10 / odd
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    stored = idx[order]
    payload = bytearray(gif.encode_gif([stored], PAL))
    desc = payload.find(b"\x2c", 13)
    assert desc > 0 and struct.unpack(
        "<4H", payload[desc + 1 : desc + 9]
    ) == (0, 0, w, h)
    payload[desc + 9] |= 0x40  # interlace flag
    n, img = gif.decode(bytes(payload))
    assert np.array_equal(img, np.array(PAL, dtype=np.uint8)[idx])


def test_transparency_keeps_underlying_pixels():
    """Frame 2 paints index 2 but marks it transparent via a GCE, so
    the composited frame keeps frame 1's pixels underneath."""
    base = np.full((4, 4), 1, dtype=np.uint8)
    over = np.full((4, 4), 2, dtype=np.uint8)
    over[0, 0] = 3  # one opaque pixel
    payload = bytearray(gif.encode_gif([base, over], PAL))
    # patch the SECOND graphic-control extension: transparency flag +
    # transparent index 2 (fields: flags, delay lo/hi, transparent)
    first = payload.find(b"\x21\xf9")
    second = payload.find(b"\x21\xf9", first + 2)
    assert second > 0
    payload[second + 3] |= 0x01
    payload[second + 6] = 2
    out = gif.frames_rgb(bytes(payload))
    assert tuple(out[1][0, 0, :]) == PAL[3]  # opaque pixel painted
    assert tuple(out[1][1, 1, :]) == PAL[1]  # transparent kept base


def test_rejections():
    with pytest.raises(ValueError, match="GIF87a/GIF89a"):
        gif.decode(b"\x00" * 30)
    payload = bytearray(gif.encode_gif([np.zeros((3, 3), np.uint8)], PAL))
    with pytest.raises(ValueError, match="truncated"):
        gif.decode(bytes(payload[:-8]))
    with pytest.raises(ValueError, match="palette"):
        gif.encode_gif([np.zeros((2, 2), np.uint8)], [(0, 0, 0)])
    with pytest.raises(ValueError, match="zero frames"):
        gif.encode_gif([], PAL)
    # disposal method 3 is a named rejection
    anim = bytearray(gif.encode_gif(
        [np.zeros((2, 2), np.uint8), np.ones((2, 2), np.uint8)], PAL
    ))
    gce = anim.find(b"\x21\xf9")
    anim[gce + 3] |= 3 << 2
    with pytest.raises(ValueError, match="disposal"):
        gif.decode(bytes(anim))


def test_decode_registry_summary():
    frames = [np.full((5, 7), v, dtype=np.uint8) for v in (1, 0)]
    feat = DecodeRegistry.decode("image/gif", gif.encode_gif(frames, PAL))
    assert feat[:3] == [7.0, 5.0, 2.0]
    assert [round(x * 255) for x in feat[3:]] == list(PAL[1])


def test_gce_disposal_applies_to_one_frame_only():
    """ADVICE r8: a graphic-control extension applies to exactly ONE
    following image (GIF89a §23) — a GCE-less frame after a
    disposal=2 frame must parse with disposal 0, not inherit 2."""
    frames = [
        np.full((2, 2), 1, dtype=np.uint8),
        np.full((2, 2), 2, dtype=np.uint8),
    ]
    payload = bytearray(gif.encode_gif(frames, PAL))
    first = payload.find(b"\x21\xf9")
    payload[first + 3] |= 2 << 2  # frame 1: disposal 2
    second = payload.find(b"\x21\xf9", first + 2)
    assert second > 0
    del payload[second : second + 8]  # strip frame 2's GCE entirely
    _, _, parsed = gif._parse(bytes(payload))
    assert [f.disposal for f in parsed] == [2, 0]
    # compositing: frame 2's pixels persist (no spurious canvas clear)
    out = gif.frames_rgb(bytes(payload))
    assert tuple(out[1][0, 0, :]) == PAL[2]
