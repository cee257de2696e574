"""FLAC codec (io/flac.py): encoder round-trips plus hand-assembled
bitstreams for every decoder path the encoder does not emit — LPC
subframes, Rice method 1, partitioned residuals, escape partitions,
wasted bits, and all three stereo decorrelation modes. Expected sample
values come from independent numpy recurrences, not from the decoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mpes_spark.io.audio import decode_audio_bytes
from mpes_spark.io.flac import (
    _BitWriter,
    _coded_number_read,
    _BitReader,
    _coded_number_write,
    _crc8,
    _crc16,
    read_flac,
    write_flac,
)


def _streaminfo(rate, nchan, bps, total, blocksize=4096):
    bits = 0
    bits = (bits << 16) | blocksize
    bits = (bits << 16) | blocksize
    bits = (bits << 24) | 0
    bits = (bits << 24) | 0
    bits = (bits << 20) | rate
    bits = (bits << 3) | (nchan - 1)
    bits = (bits << 5) | (bps - 1)
    bits = (bits << 36) | total
    bits <<= 128
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bits.to_bytes(34, "big")


def _frame(subframes_bits, blocksize, nchan, bps, ch_code=None):
    """Assemble one frame: header + provided subframe bit-payloads."""
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)            # 16-bit blocksize at end
    bw.write(0, 4)            # rate from streaminfo
    bw.write(ch_code if ch_code is not None else nchan - 1, 4)
    bw.write({8: 1, 16: 4}[bps], 3)
    bw.write(0, 1)
    _coded_number_write(bw, 0)
    bw.write(blocksize - 1, 16)
    bw.align()
    hdr = bw.bytes()
    bw.write(_crc8(hdr), 8)
    for write_subframe in subframes_bits:
        write_subframe(bw)
    bw.align()
    body = bw.bytes()
    return body + struct.pack(">H", _crc16(body))


def _unary(bw, n):
    for _ in range(n):
        bw.write(0, 1)
    bw.write(1, 1)


def _rice_write(bw, vals, k, method=0, po=0, order=0, blocksize=None):
    """Residual block: zigzag + Rice, arbitrary method/partition order."""
    bw.write(method, 2)
    bw.write(po, 4)
    pbits = 4 if method == 0 else 5
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        bw.write(k, pbits)
        for i in range(n):
            r = int(vals[idx]); idx += 1
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            _unary(bw, u >> k)
            if k:
                bw.write(u & ((1 << k) - 1), k)


def test_lpc_subframe_decodes_recurrence():
    """LPC order 2, coeffs [3, -1], shift 1: s[i] = res[i] +
    ((3*s[i-1] - s[i-2]) >> 1) — expected values derived independently."""
    blocksize, bps = 16, 16
    warm = [100, 110]
    res = list(range(-7, 7))
    coefs, shift, prec = [3, -1], 1, 5

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b100001, 6)   # LPC order 2
        bw.write(0, 1)          # no wasted bits
        for w in warm:
            bw.write(w & 0xFFFF, bps)
        bw.write(prec - 1, 4)
        bw.write(shift & 0x1F, 5)
        for c in coefs:
            bw.write(c & ((1 << prec) - 1), prec)
        _rice_write(bw, res, k=2, order=2, blocksize=blocksize)

    data = _streaminfo(8000, 1, bps, blocksize) + _frame(
        [sub], blocksize, 1, bps
    )
    got, rate = read_flac(data)
    want = np.array(warm + [0] * (blocksize - 2), dtype=np.int64)
    for i in range(2, blocksize):
        want[i] = res[i - 2] + ((3 * want[i - 1] - want[i - 2]) >> 1)
    np.testing.assert_array_equal(got[:, 0], want)
    assert rate == 8000


def test_rice_method1_and_partitions():
    """Fixed order 1, Rice method 1 (5-bit params), partition order 2:
    four partitions over a 16-sample block."""
    blocksize, bps = 16, 16
    warm = [50]
    res = [1, -2, 3, -4, 5, -6, 7, -8, 9, -10, 11, -12, 13, -14, 15]

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b001001, 6)   # FIXED order 1
        bw.write(0, 1)
        bw.write(warm[0], bps)
        _rice_write(bw, res, k=3, method=1, po=2, order=1,
                    blocksize=blocksize)

    data = _streaminfo(8000, 1, bps, blocksize) + _frame(
        [sub], blocksize, 1, bps
    )
    got, _ = read_flac(data)
    want = np.empty(blocksize, dtype=np.int64)
    want[0] = warm[0]
    for i in range(1, blocksize):
        want[i] = res[i - 1] + want[i - 1]
    np.testing.assert_array_equal(got[:, 0], want)


def test_escape_partition_and_wasted_bits():
    """Escape partition (raw 6-bit residuals) + 2 wasted bits: decoded
    samples are shifted left by the wasted count."""
    blocksize, bps = 8, 16
    res = [5, -9, 14, -3, 0, 7, -1]

    def sub(bw):
        bw.write(0, 1)
        bw.write(0b001001, 6)   # FIXED order 1
        bw.write(1, 1)          # wasted flag
        _unary(bw, 1)           # wasted = 1 + 1 = 2
        bw.write(10, bps - 2)   # warm-up at effective bps
        bw.write(0, 2)          # method 0
        bw.write(0, 4)          # po 0
        bw.write(0xF, 4)        # escape
        bw.write(6, 5)          # raw bits
        for r in res:
            bw.write(r & 0x3F, 6)

    data = _streaminfo(8000, 1, bps, blocksize) + _frame(
        [sub], blocksize, 1, bps
    )
    got, _ = read_flac(data)
    want = np.empty(blocksize, dtype=np.int64)
    want[0] = 10
    for i in range(1, blocksize):
        want[i] = res[i - 1] + want[i - 1]
    np.testing.assert_array_equal(got[:, 0], want << 2)


@pytest.mark.parametrize("mode", ["left_side", "side_right", "mid_side"])
def test_stereo_decorrelation(mode):
    left = np.array([100, -50, 30, 7, -128, 99, 0, 1], dtype=np.int64)
    right = np.array([90, -60, 31, -7, -120, 90, 5, -1], dtype=np.int64)
    blocksize, bps = left.size, 16
    side = left - right
    if mode == "left_side":
        ch_code, c0, c1, b0, b1 = 8, left, side, bps, bps + 1
    elif mode == "side_right":
        ch_code, c0, c1, b0, b1 = 9, side, right, bps + 1, bps
    else:
        mid = (left + right) >> 1
        ch_code, c0, c1, b0, b1 = 10, mid, side, bps, bps + 1

    def verb(vals, nbits):
        def sub(bw):
            bw.write(0, 1)
            bw.write(1, 6)      # VERBATIM
            bw.write(0, 1)
            for v in vals.tolist():
                bw.write(int(v) & ((1 << nbits) - 1), nbits)
        return sub

    data = _streaminfo(8000, 2, bps, blocksize) + _frame(
        [verb(c0, b0), verb(c1, b1)], blocksize, 2, bps, ch_code=ch_code
    )
    got, _ = read_flac(data)
    np.testing.assert_array_equal(got[:, 0], left)
    np.testing.assert_array_equal(got[:, 1], right)


def test_crc_mismatch_rejected():
    sig = np.arange(100, dtype=np.int16)
    buf = bytearray(write_flac(sig, 8000))
    buf[-1] ^= 0xFF  # corrupt the final frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        read_flac(bytes(buf))


def test_coded_number_round_trip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, (1 << 21) - 1,
              1 << 21, (1 << 31) + 12345, (1 << 36) - 1]:
        bw = _BitWriter()
        _coded_number_write(bw, v)
        bw.align()
        assert _coded_number_read(_BitReader(bw.bytes())) == v


def test_dispatch_and_mp3_still_gated():
    sig = (np.arange(500) % 97).astype(np.int16)
    got, rate = decode_audio_bytes(write_flac(sig, 22050))
    np.testing.assert_array_equal(got, sig)
    assert rate == 22050
    with pytest.raises(NotImplementedError, match="MP3"):
        decode_audio_bytes(b"ID3\x04rest")


@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=600),
    st.sampled_from([64, 192, 4096]),
    st.sampled_from([1, 2, 3]),
)
@settings(max_examples=60, deadline=None)
def test_flac_roundtrip_fuzz(vals, blocksize, nchan):
    n = (len(vals) // nchan) * nchan
    arr = np.array(vals[:n], dtype=np.int16).reshape(-1, nchan)
    got, rate = read_flac(write_flac(arr, 16000, blocksize=blocksize))
    assert rate == 16000
    np.testing.assert_array_equal(got, arr)
