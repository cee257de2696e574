"""Numpy-only WAV PCM codec (io/audio.py): round-trips, 8-bit widen,
chunk-walk robustness, resample/feature kernels, env gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mpes_spark.io.audio import (
    decode_audio_bytes,
    frame_features,
    read_wav,
    resample_linear,
    write_wav,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(0)
    mono = rng.integers(-32768, 32768, size=301, dtype=np.int16)
    got, rate = read_wav(write_wav(mono, 16_000))
    assert rate == 16_000
    np.testing.assert_array_equal(got, mono)
    stereo = rng.integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    got2, rate2 = read_wav(write_wav(stereo, 44_100))
    assert rate2 == 44_100 and got2.shape == (50, 2)
    np.testing.assert_array_equal(got2, stereo)


def test_wav_8bit_widen_and_extra_chunks():
    # hand-build an 8-bit mono WAV with a LIST chunk before data
    samples8 = bytes([0, 128, 255, 200])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    inner = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(samples8)) + samples8
    )
    wav = b"RIFF" + struct.pack("<I", len(inner)) + inner
    got, rate = read_wav(wav)
    assert rate == 8000
    np.testing.assert_array_equal(got, ((np.array([0, 128, 255, 200]) - 128) << 8))


def test_audio_env_gates():
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio_bytes(b"ID3\x04rest")
    with pytest.raises(NotImplementedError, match="OGG"):
        decode_audio_bytes(b"OggS....")
    with pytest.raises(ValueError, match="unrecognized"):
        decode_audio_bytes(b"\x00\x00\x00\x00")


def test_resample_linear_kernel():
    ramp = np.arange(0, 1000, 10, dtype=np.int16)  # 100 samples
    up = resample_linear(ramp, 8000, 16000)
    assert len(up) == 200
    # a linear ramp resamples to a linear ramp: endpoints preserved
    assert up[0] == ramp[0] and up[-1] == ramp[-1]
    diffs = np.diff(up.astype(int))
    assert diffs.min() >= 0  # still monotone
    down = resample_linear(ramp, 8000, 4000)
    assert len(down) == 50 and down[0] == ramp[0] and down[-1] == ramp[-1]


def test_frame_features_rms_and_zero_crossings():
    # alternating +/- square wave: rms = amplitude, zc = frame-1
    amp = 1000
    sq = np.tile([amp, -amp], 128).astype(np.int16)  # 256 samples
    feats = frame_features(sq, frame=256)
    assert feats.shape == (1, 2)
    assert abs(feats[0, 0] - amp) < 1e-9
    assert feats[0, 1] == 255
    # constant signal: zero crossings 0
    const = np.full(512, 7, dtype=np.int16)
    f2 = frame_features(const, frame=256)
    assert (f2[:, 1] == 0).all()
    # trailing partial frame dropped
    assert frame_features(np.zeros(100, dtype=np.int16), frame=256).shape == (0, 2)


# -- hypothesis round-trip fuzz (r8 codec) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@given(
    samples=arrays(dtype=np.int16, shape=st.integers(1, 400)),
    rate=st.sampled_from([8000, 16000, 44100]),
    channels=st.integers(1, 3),
)
@settings(max_examples=80, deadline=None)
def test_wav_roundtrip_fuzz(samples, rate, channels):
    if channels > 1:
        n = (len(samples) // channels) * channels
        if n == 0:
            return
        samples = samples[:n].reshape(-1, channels)
    got, got_rate = read_wav(write_wav(samples, rate))
    assert got_rate == rate
    np.testing.assert_array_equal(got, samples)
