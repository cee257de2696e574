"""Numpy-only audio codec + feature kernels (the audio leg of the
multimodal pillar, r8 — same discipline as :mod:`mpes_spark.io.images`:
every format that needs no codec library decodes for real; compressed
formats stay env-gated).

Supported: RIFF/WAVE PCM (8-bit unsigned, 16-bit signed, mono or
multi-channel) read/write, FLAC read/write (r9 late, via
:mod:`mpes_spark.io.flac` — full subframe/Rice/stereo-decorrelation
decoder, FIXED+Rice encoder), linear resample, windowed RMS /
zero-crossing features. Lossy MP3/OGG raise the documented
``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "read_wav",
    "write_wav",
    "decode_audio_bytes",
    "resample_linear",
    "frame_features",
]


def read_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM bytes -> (samples, sample_rate); samples
    are (n,) for mono or (n, channels), dtype int16 (8-bit input is
    widened: (x - 128) << 8, the standard unsigned-to-signed map)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byterate, _align, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"only PCM (format 1) supported, got {audio_fmt}")
    if bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif bits == 8:
        samples = ((np.frombuffer(raw, dtype="u1").astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels)
    return samples, rate


def write_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 samples ((n,) or (n, channels)) as 16-bit PCM
    RIFF/WAVE bytes."""
    a = np.asarray(samples, dtype="<i2")
    channels = 1 if a.ndim == 1 else a.shape[1]
    raw = a.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_audio_bytes(payload: bytes) -> tuple[np.ndarray, int]:
    """Magic-dispatched audio decode: WAV PCM and FLAC natively (r9
    late: :mod:`mpes_spark.io.flac` — lossless, so no codec library is
    genuinely needed); lossy MP3/OGG stay env-gated."""
    if payload[:4] == b"RIFF":
        return read_wav(payload)
    if payload[:4] == b"fLaC":
        from mpes_spark.io.flac import read_flac

        samples, rate = read_flac(payload)
        return (samples[:, 0] if samples.shape[1] == 1 else samples), rate
    named = {b"ID3": "MP3", b"\xff\xfb": "MP3", b"OggS": "OGG"}
    for magic, name in named.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} decoding requires an audio codec library not "
                "present in this runtime; plug ffmpeg/soundfile into "
                "decode_audio_bytes — WAV PCM and FLAC decode natively "
                "and the Spark plumbing is complete"
            )
    raise ValueError(f"unrecognized audio magic {payload[:4]!r}")


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample of mono int16 samples to a new
    sample rate (numpy interp — the library-free resample kernel)."""
    a = np.asarray(samples, dtype="float64")
    if a.ndim != 1:
        raise ValueError("resample_linear takes mono samples")
    n_out = max(1, int(round(len(a) * rate_out / rate_in)))
    x_out = np.arange(n_out) * (len(a) - 1) / max(n_out - 1, 1)
    return np.clip(np.interp(x_out, np.arange(len(a)), a), -32768, 32767).astype(
        np.int16
    )


def frame_features(samples: np.ndarray, frame: int = 256) -> np.ndarray:
    """Per-frame (RMS, zero-crossing count) features of mono samples:
    (n_frames, 2) float64. Trailing partial frame is dropped — the
    deterministic convention both engines can mirror."""
    a = np.asarray(samples, dtype="float64")
    n = (len(a) // frame) * frame
    if n == 0:
        return np.zeros((0, 2))
    f = a[:n].reshape(-1, frame)
    rms = np.sqrt((f**2).mean(axis=1))
    zc = (np.diff(np.signbit(f), axis=1) != 0).sum(axis=1).astype("float64")
    return np.stack([rms, zc], axis=1)
