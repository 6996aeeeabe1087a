"""FLAC codec tests (sparker_spark/llm/flac.py).

FLAC is lossless, so every round trip below asserts exact sample
equality — no tolerance arguments anywhere. The encoder chooses among
CONSTANT / FIXED / LPC / VERBATIM subframes per block, so the signal
shapes below steer coverage across every decoder branch (asserted via
the subframe-type spy, not assumed)."""

import numpy as np
import pytest

from sparker_spark.llm import flac
from sparker_spark.llm.audio import audio_samples
from sparker_spark.llm.multimodal import DecodeRegistry


def _roundtrip(samples, sr=8000, ch=1, **kw):
    payload = flac.encode(samples, sample_rate=sr, n_channels=ch, **kw)
    n_channels, rate, frames = flac.decode(payload)
    assert (n_channels, rate) == (ch, sr)
    assert np.array_equal(frames.flatten(), np.asarray(samples))
    return payload


def _subframe_types(payload):
    types = []
    orig = flac._decode_subframe

    def spy(bits, block_size, bps):
        start = bits.bitpos
        bits.read(1)
        types.append(bits.read(6))
        bits.bitpos = start
        return orig(bits, block_size, bps)

    flac._decode_subframe = spy
    try:
        flac.decode(payload)
    finally:
        flac._decode_subframe = orig
    return set(types)


def test_constant_and_square():
    p = _roundtrip(np.full(300, 123))
    assert _subframe_types(p) == {0}  # CONSTANT
    t = np.arange(400)
    _roundtrip(np.where(t % 16 < 8, 3000, -3000))


def test_noise_and_extremes():
    rng = np.random.RandomState(3)
    _roundtrip(rng.randint(-32768, 32768, 1000))
    _roundtrip(np.array([32767, -32768] * 50))


def test_fixed_and_lpc_branches():
    sine = (20000 * np.sin(np.arange(5000) * 0.03)).astype(np.int64)
    p = _roundtrip(sine)
    assert _subframe_types(p) & set(range(8, 13))  # FIXED chosen
    rng = np.random.RandomState(0)
    rich = (
        12000 * np.sin(np.arange(5000) * 0.0213)
        + 6000 * np.sin(np.arange(5000) * 0.0741 + 0.5)
        + rng.randint(-50, 50, 5000)
    ).astype(np.int64)
    p = _roundtrip(rich)
    assert any(t >= 32 for t in _subframe_types(p))  # LPC chosen
    _roundtrip(rich, use_lpc=False)


def test_multi_block_and_8bit():
    sig = (1000 * np.sin(np.arange(10000) * 0.01)).astype(np.int64)
    _roundtrip(sig, sr=16000, block_size=1024)
    rng = np.random.RandomState(5)
    _roundtrip(rng.randint(-128, 128, 500), bits_per_sample=8)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_modes(mode):
    st = np.empty(2000, dtype=np.int64)
    st[0::2] = (8000 * np.sin(np.arange(1000) * 0.05)).astype(np.int64)
    st[1::2] = (7000 * np.sin(np.arange(1000) * 0.047 + 1)).astype(np.int64)
    _roundtrip(st, sr=48000, ch=2, stereo_mode=mode)
    # odd-parity samples exercise the (mid<<1)|(side&1) reconstruction
    st2 = np.array([5, 2, -7, 4, 100, 99, -3, -4] * 100, dtype=np.int64)
    _roundtrip(st2, ch=2, stereo_mode=mode)


def test_rejects_garbage_and_corruption():
    with pytest.raises(ValueError, match="fLaC"):
        flac.decode(b"\x00" * 50)
    with pytest.raises(ValueError, match="Ogg"):
        flac.decode(b"OggS" + b"\x00" * 50)
    payload = bytearray(_roundtrip(np.full(300, 9)))
    payload[-3] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC"):
        flac.decode(bytes(payload))


def test_truncated_stream_fails_loudly():
    """A payload cut at a frame boundary must not return a silently
    short stream (wrong duration/RMS features downstream)."""
    sig = (1000 * np.sin(np.arange(8192) * 0.01)).astype(np.int64)
    payload = flac.encode(sig, block_size=4096)
    # find the second frame's sync byte pair to cut before it
    cut = payload.find(b"\xff\xf8", 50)
    assert cut > 0
    with pytest.raises(ValueError, match="truncated|declared samples"):
        flac.decode(payload[:cut])


def test_encode_rejects_bad_block_size():
    with pytest.raises(ValueError, match="block_size"):
        flac.encode(np.full(100, 5), block_size=70000)
    with pytest.raises(ValueError, match="block_size"):
        flac.encode(np.full(100, 5), block_size=8)


def test_frame_rate_mismatch_rejected():
    """A frame header carrying an explicit rate code must agree with
    STREAMINFO; decoding mixed rates would corrupt duration features.
    (The repo's encoder always writes rate-from-STREAMINFO, so the
    explicit-code paths are exercised by patching the header and
    re-stamping its CRC-8.)"""
    payload = bytearray(flac.encode(np.full(64, 9), sample_rate=8000))
    start = payload.find(b"\xff\xf8")
    assert start > 0

    def with_rate_code(code):
        p = bytearray(payload)
        p[start + 2] = (p[start + 2] & 0xF0) | code
        # header = sync..blocksize field (7 bytes for frame 0 with the
        # encoder's 16-bit blocksize layout); CRC-8 follows, and the
        # frame-wide CRC-16 is the stream's last two bytes (one frame)
        p[start + 7] = flac._crc8(bytes(p[start : start + 7]))
        crc16 = flac._crc16(bytes(p[start:-2]))
        p[-2:] = crc16.to_bytes(2, "big")
        return bytes(p)

    # explicit matching rate (code 4 = 8000 Hz): decodes fine
    n_channels, rate, frames = flac.decode(with_rate_code(4))
    assert rate == 8000 and frames.shape[0] == 64
    # explicit mismatching rate (code 9 = 44100 Hz): named rejection
    with pytest.raises(ValueError, match="disagrees"):
        flac.decode(with_rate_code(9))


def test_audio_samples_dispatcher_and_registry():
    t = np.arange(320)
    sq = np.where(t % 16 < 8, 5000, -5000)
    p = flac.encode(sq, sample_rate=8000)
    ch, sr, frames = audio_samples(p)
    assert (ch, sr) == (1, 8000)
    assert np.array_equal(frames[:, 0], sq)
    feat = DecodeRegistry.decode("audio/flac", p)
    assert feat[0] == 1.0 and feat[1] == 8000.0
    assert feat[2] == pytest.approx(320 / 8000.0)
    assert feat[3] == pytest.approx(5000 / 32768.0)


def test_flac_roundtrip_property():
    """Property: encode∘decode is the identity for ANY int16 signal,
    any channel count/stereo mode, any block size — hypothesis drives
    the subframe/rice/decorrelation choices through arbitrary
    inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=600,
        ),
        ch=st.integers(min_value=1, max_value=3),
        bs=st.sampled_from([16, 64, 256, 4096]),
        mode=st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]
        ),
        lpc=st.booleans(),
    )
    def run(data, ch, bs, mode, lpc):
        if mode != "independent" and ch != 2:
            mode = "independent"
        n = (len(data) // ch) * ch
        if n == 0:
            return
        samples = np.asarray(data[:n], dtype=np.int64)
        payload = flac.encode(
            samples, sample_rate=8000, n_channels=ch,
            block_size=bs, stereo_mode=mode, use_lpc=lpc,
        )
        nch, sr, frames = flac.decode(payload)
        assert (nch, sr) == (ch, 8000)
        assert np.array_equal(frames.flatten(), samples)

    run()


def test_bits_per_sample_accessor():
    p8 = flac.encode(np.full(64, 7), bits_per_sample=8)
    p16 = flac.encode(np.full(64, 7))
    assert flac.bits_per_sample(p8) == 8
    assert flac.bits_per_sample(p16) == 16
