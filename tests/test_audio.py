"""Audio pipeline tests (sparker_spark/llm/audio.py): codec roundtrip
against hand-packed RIFF bytes, time-domain closed forms, and spectral
features against pure-tone ground truth."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparker_spark.llm.audio import (
    audio_features,
    encode_wav,
    wav_samples,
)


def test_encode_wav_is_spec_shaped():
    samples = np.array([0, 1000, -1000, 32767], dtype=np.int64)
    wav = encode_wav(samples, sample_rate=8000)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    # fmt fields straight from the bytes, independent of the parser
    fmt_at = wav.index(b"fmt ") + 8
    fmt_code, ch, sr = struct.unpack("<HHI", wav[fmt_at : fmt_at + 8])
    assert (fmt_code, ch, sr) == (1, 1, 8000)
    data_at = wav.index(b"data") + 8
    assert struct.unpack("<4h", wav[data_at : data_at + 8]) == (
        0, 1000, -1000, 32767,
    )


def test_wav_samples_roundtrip_mono_and_stereo():
    mono = np.array([5, -5, 7, -7], dtype=np.int64)
    ch, sr, frames = wav_samples(encode_wav(mono, 44100))
    assert (ch, sr) == (1, 44100)
    assert frames[:, 0].tolist() == mono.tolist()

    stereo = np.array([1, 2, 3, 4, 5, 6], dtype=np.int64)  # L R L R L R
    ch, sr, frames = wav_samples(encode_wav(stereo, 8000, n_channels=2))
    assert ch == 2 and frames.shape == (3, 2)
    assert frames.tolist() == [[1, 2], [3, 4], [5, 6]]


def test_wav_samples_rejects_bad_payloads():
    with pytest.raises(ValueError, match="RIFF"):
        wav_samples(b"OggS" + b"\x00" * 40)
    wav = encode_wav(np.array([1, 2, 3, 4]), 8000)
    with pytest.raises(ValueError, match="truncated|missing"):
        wav_samples(wav[:-3])


def test_square_wave_time_domain_closed_forms(spark):
    amp, half, m = 1200, 4, 5
    period = 2 * half
    t = np.arange(m * period)
    samples = np.where(t % period < half, amp, -amp)
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(samples, 8000)))],
        "media_id long, payload binary",
    )
    row = audio_features(df).collect()[0]
    assert row["n_frames"] == m * period
    assert row["rms"] == float(amp)  # |x| constant -> exact
    assert row["peak"] == amp
    assert row["zero_crossings"] == 2 * m - 1
    assert row["duration_s"] == m * period / 8000


def test_pure_tone_spectral_centroid(spark):
    # sine exactly on bin k: centroid == k*sr/n within float noise
    sr, n, k = 8000, 1024, 40
    t = np.arange(n)
    samples = np.round(10000 * np.sin(2 * np.pi * k * t / n)).astype(int)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, sr)))],
        "media_id long, payload binary",
    )
    row = audio_features(df).collect()[0]
    expected = k * sr / n
    assert abs(row["spectral_centroid_hz"] - expected) < 1.0
    # all energy in the lowest third of the spectrum (bin 40 of 512)
    assert row["band_energy"][0] > 0.99
    assert abs(sum(row["band_energy"]) - 1.0) < 1e-9


def test_two_tone_band_split(spark):
    sr, n = 8000, 1024
    t = np.arange(n)
    lo = 8000 * np.sin(2 * np.pi * 30 * t / n)     # low third
    hi = 8000 * np.sin(2 * np.pi * 480 * t / n)    # high third (of 512)
    samples = np.round(lo + hi).astype(int)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, sr)))],
        "media_id long, payload binary",
    )
    row = audio_features(df).collect()[0]
    # equal-amplitude tones -> roughly half the power in each band
    assert 0.4 < row["band_energy"][0] < 0.6
    assert 0.4 < row["band_energy"][2] < 0.6
    assert row["band_energy"][1] < 0.05


def test_zero_sample_zcr_convention(spark):
    # +A, 0, -A is ONE crossing (zero carries the previous sign)
    samples = np.array([100, 0, -100, 0, 100], dtype=np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(samples, 8000)))],
        "media_id long, payload binary",
    )
    row = audio_features(df).collect()[0]
    assert row["zero_crossings"] == 2
